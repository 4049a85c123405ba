"""Checkpointed publish sink (SURVEY K7/T2/T3/T7): the reference
uploads to HF Hub every 30 videos with 10×60 s retries under a global
lock (hf.py:7-48, data_pipeline.py:682-696). Restated as an
exactly-once batch publisher:

- batches are identified by a deterministic batch id;
- a publish ledger records committed ids — re-publishing a committed
  batch is a no-op (idempotence replaces the reference's
  at-least-once retry loop);
- retries with backoff wrap ONLY the external call;
- single-writer: the commit runs driver-side (the foreachBatch
  contract), not per-executor — the semaphore/lock disappears.

The external transport is pluggable: LocalDirPublisher ships batches
to a directory (testable); HfHubPublisher is the real-world stub.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Protocol


class PublishTransport(Protocol):
    def upload(self, batch_id: str, payload: bytes) -> None: ...


class LocalDirPublisher:
    """Filesystem transport — the test double for HF Hub upload."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def upload(self, batch_id: str, payload: bytes) -> None:
        tmp = os.path.join(self.root, f".{batch_id}.tmp")
        final = os.path.join(self.root, f"{batch_id}.json")
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, final)  # atomic publish


class FlakyTransport:
    """Deterministic failure-injection wrapper for retry tests."""

    def __init__(self, inner: PublishTransport, fail_first_n: int):
        self.inner = inner
        self.remaining_failures = fail_first_n
        self.attempts = 0

    def upload(self, batch_id: str, payload: bytes) -> None:
        self.attempts += 1
        if self.remaining_failures > 0:
            self.remaining_failures -= 1
            raise ConnectionError("injected transport failure")
        self.inner.upload(batch_id, payload)


def _load_hf_upload_fn():
    """The ONLY part of the HF Hub transport that needs the library +
    network: returns a callable `(request: dict) -> None` that feeds
    huggingface_hub.upload_file from the shaped request."""
    try:
        import huggingface_hub
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "HfHubPublisher requires huggingface_hub; use "
            "LocalDirPublisher for local/test runs"
        ) from e

    def upload_fn(request: dict) -> None:  # pragma: no cover
        import io

        huggingface_hub.upload_file(
            path_or_fileobj=io.BytesIO(request["payload"]),
            path_in_repo=request["path_in_repo"],
            repo_id=request["repo_id"],
            repo_type=request["repo_type"],
            revision=request["revision"],
            commit_message=request["commit_message"],
        )

    return upload_fn  # pragma: no cover


class HfHubPublisher:
    """HF Hub transport adapter (hf.py:27-48). The request shaping —
    repo/branch/path-in-repo/commit-message per batch — is real,
    offline-testable code; only `upload_fn` (the huggingface_hub
    call) needs the library + network, and can be injected to test
    against a recorder. Retry/backoff stays OUTSIDE the transport
    (publish.retry / the reference's hf_retry_decorator(10, 60));
    idempotence comes from the deterministic path_in_repo: replaying
    a batch overwrites the same file, the Hub analog of
    LocalDirPublisher's atomic rename."""

    def __init__(
        self,
        repo_id: str,
        branch: str = "main",
        repo_type: str = "dataset",
        prefix: str = "batches",
        upload_fn=None,
    ):
        self.repo_id = repo_id
        self.branch = branch
        self.repo_type = repo_type
        self.prefix = prefix
        self._upload_fn = upload_fn or _load_hf_upload_fn()

    def request(self, batch_id: str, payload: bytes) -> dict:
        """Shape one upload request (hf.py:35-48 kwargs)."""
        return {
            "repo_id": self.repo_id,
            "repo_type": self.repo_type,
            "revision": self.branch,
            "path_in_repo": f"{self.prefix}/{batch_id}.json",
            "commit_message": f"publish {batch_id}",
            "payload": payload,
        }

    def upload(self, batch_id: str, payload: bytes) -> None:
        self._upload_fn(self.request(batch_id, payload))


def retry(
    fn: Callable[[], None],
    attempts: int = 10,
    backoff_s: float = 60.0,
    sleep=time.sleep,
) -> None:
    """T3: the reference's hf_retry_decorator(10, 60) (hf.py:7-24,35)
    — bounded attempts, fixed backoff, re-raises the final error."""
    for i in range(attempts):
        try:
            fn()
            return
        except Exception:
            if i == attempts - 1:
                raise
            sleep(backoff_s)


class CheckpointedPublisher:
    """Exactly-once publisher: ledger of committed batch ids + retry
    around the transport. Drop-in foreachBatch target:

        q = df.writeStream.foreachBatch(
                lambda batch_df, bid: pub.publish(str(bid),
                    batch_df.toJSON().collect())).start()

    In batch mode, call publish() per batch-key group (the W4
    floor(position/30) key). The ledger lives next to the outputs; on
    a cluster it sits in the checkpoint location, giving the
    exactly-once upgrade over the reference's at-least-once retries
    (SURVEY §7.4)."""

    def __init__(
        self,
        transport: PublishTransport,
        ledger_path: str,
        attempts: int = 10,
        backoff_s: float = 0.0,
        sleep=time.sleep,
    ):
        self.transport = transport
        self.ledger_path = ledger_path
        self.attempts = attempts
        self.backoff_s = backoff_s
        self._sleep = sleep
        self._committed: set[str] | None = None

    def committed(self) -> set[str]:
        if self._committed is None:
            try:
                with open(self.ledger_path) as f:
                    self._committed = {line.strip() for line in f if line.strip()}
            except FileNotFoundError:
                self._committed = set()
        return self._committed

    def publish(self, batch_id: str, records: list[str]) -> bool:
        """Publish one batch; returns False if already committed
        (idempotent replay — exactly-once per batch id)."""
        if batch_id in self.committed():
            return False
        payload = ("\n".join(records)).encode()
        retry(
            lambda: self.transport.upload(batch_id, payload),
            attempts=self.attempts,
            backoff_s=self.backoff_s,
            sleep=self._sleep,
        )
        # commit AFTER the upload succeeds (ledger append is atomic
        # enough for a single driver-side writer — the T7 single-writer
        # contract)
        with open(self.ledger_path, "a") as f:
            f.write(batch_id + "\n")
        self.committed().add(batch_id)
        return True


class DistributedPublisher:
    """Executor-parallel publish for DATA-sized batches. The
    driver-collect form (CheckpointedPublisher via toJSON().collect())
    is right for the K7 metadata documents it implements — small by
    construction — but is the pattern users would wrongly copy for
    record batches. Here each partition uploads its OWN shard: JSON
    serialization happens JVM-side (df.toJSON), the transport call +
    retry run on the executor via foreachPartition, and only the
    batch-id ledger commit stays driver-side (the T7 single-writer
    contract).

    Exactly-once: shard ids are deterministic
    (`{batch_id}-part-{pid:05d}`), so replaying a batch that failed
    mid-upload re-uploads the same shard ids — idempotent when the
    transport's upload is atomic per id (LocalDirPublisher's
    tmp+rename; HF Hub overwrite-by-path). The ledger commits only
    after every partition succeeded, so a committed batch id implies
    all shards landed."""

    def __init__(
        self,
        transport: PublishTransport,
        ledger_path: str,
        attempts: int = 10,
        backoff_s: float = 0.0,
    ):
        self._ledger = CheckpointedPublisher(
            transport, ledger_path, attempts=attempts, backoff_s=backoff_s
        )
        self.transport = transport
        self.attempts = attempts
        self.backoff_s = backoff_s

    def committed(self) -> set[str]:
        return self._ledger.committed()

    def publish_batch(self, batch_df, batch_id: str) -> bool:
        """Upload one DataFrame batch shard-parallel; returns False if
        the batch id is already committed (idempotent replay)."""
        if batch_id in self.committed():
            return False
        transport = self.transport
        attempts, backoff_s = self.attempts, self.backoff_s

        def upload_partition(lines) -> None:
            from pyspark import TaskContext

            buf = list(lines)
            if not buf:
                return  # empty partition -> no shard
            pid = TaskContext.get().partitionId()
            payload = ("\n".join(buf)).encode()
            retry(
                lambda: transport.upload(
                    f"{batch_id}-part-{pid:05d}", payload
                ),
                attempts=attempts,
                backoff_s=backoff_s,
            )

        # toJSON serializes JVM-side; foreachPartition ships only the
        # closure (transport must be picklable) to executors.
        batch_df.toJSON().foreachPartition(upload_partition)
        # All shards landed -> single driver-side ledger append.
        with open(self._ledger.ledger_path, "a") as f:
            f.write(batch_id + "\n")
        self.committed().add(batch_id)
        return True


def publish_metadata_json(obj: dict) -> bytes:
    """K2: canonical JSON serialization for metadata documents —
    sorted keys so re-publishing identical content is byte-identical
    (numpy coercion is unnecessary: columns are typed end-to-end,
    unlike data_pipeline.py:730-741)."""
    return json.dumps(obj, sort_keys=True, separators=(",", ":")).encode()
