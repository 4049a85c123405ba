"""Serve-while-maintain, EXECUTED (r12, VERDICT r11 next #3): until
this test, the claim that a reader interleaved with a running
maintenance stream always sees a committed-prefix answer was only
by-construction (meta written once, commit-point `before_batch`
reads). Here a maintainer actually runs micro-batches while the main
thread serves between them, and every serve that lands inside a
stable committed state must equal the offline-built store for that
exact prefix — bit-for-bit, scores included.

The mechanism being proven: each serve derives its high-water mark
from the store's commit point FIRST and filters every subsequent
read (postings, tombstones, totals) by it, so a batch committing
mid-serve cannot produce a mixed state (the totals read's missing
hw filter was found and fixed by writing this test — a serve could
previously pair batch-N totals with batch-<N postings)."""

from __future__ import annotations

import glob
import os
import time as _time

from pyspark.sql import functions as F

from se_data_pipeline_spark.catalog import load_table

_N_FILES = 4


def _staggered_files(docs, src: str, n: int) -> None:
    """n parquet files with strictly increasing mtimes so
    maxFilesPerTrigger=1 yields n deterministic micro-batches."""
    os.makedirs(src, exist_ok=True)
    batches = []
    for i in range(n):
        before = set(glob.glob(os.path.join(src, "part-*.parquet")))
        docs.filter(f"doc_id % {n} = {i}").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        after = set(glob.glob(os.path.join(src, "part-*.parquet")))
        batches.append(after - before)
    now = _time.time()
    for i, files in enumerate(batches):
        for f in files:
            t = now - 100 + i
            os.utime(f, (t, t))


def _committed_n_docs(spark, store: str) -> int:
    """The committed document count — totals rows exist only for
    committed batches (totals IS the commit point), so a plain sum
    is itself a committed read."""
    p = os.path.join(store, "totals")
    if not os.path.isdir(p):
        return 0
    rows = (
        spark.read.schema("n_docs long, n_tokens long, batch_id int")
        .parquet(p)
        .agg(F.sum("n_docs").alias("n"))
        .collect()
    )
    return int(rows[0]["n"] or 0)


def test_bm25_serves_committed_prefixes_under_running_maintainer(
    spark, sf_dir, tmp_path
):
    from se_data_pipeline_spark.functions.text import SEARCH_TERMS
    from se_data_pipeline_spark.sources.layout import (
        bm25_from_postings,
        write_posting_lists,
    )
    from se_data_pipeline_spark.streaming.jobs import (
        maintain_posting_lists,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )

    # expected answer per committed prefix, from offline-built stores
    expected: dict[int, list] = {}
    for p in range(1, _N_FILES + 1):
        prefix = docs.filter(f"doc_id % {_N_FILES} < {p}")
        store_p = str(tmp_path / f"prefix_{p}")
        write_posting_lists(prefix, store_p, n_buckets=32)
        expected[prefix.count()] = [
            tuple(r)
            for r in bm25_from_postings(
                spark, store_p, SEARCH_TERMS, limit=20
            ).collect()
        ]

    src = str(tmp_path / "src")
    _staggered_files(docs, src, _N_FILES)
    store = str(tmp_path / "store")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = maintain_posting_lists(
        stream, store, str(tmp_path / "chk"), n_buckets=32
    )

    observed: set[int] = set()
    try:
        while q.isActive:
            if not os.path.isdir(os.path.join(store, "totals")):
                _time.sleep(0.2)
                continue
            n1 = _committed_n_docs(spark, store)
            if n1 == 0:
                continue
            served = [
                tuple(r)
                for r in bm25_from_postings(
                    spark, store, SEARCH_TERMS, limit=20
                ).collect()
            ]
            n2 = _committed_n_docs(spark, store)
            if n1 != n2:
                # a batch committed mid-serve: the serve is still a
                # committed prefix (hw pinned at its first read), but
                # we cannot attribute WHICH prefix from out here
                continue
            assert n1 in expected, (
                f"serve saw n_docs={n1}, not any committed prefix "
                f"{sorted(expected)} — a partial batch leaked"
            )
            assert served == expected[n1], (
                f"serve at prefix n_docs={n1} diverged from the "
                "offline-built store for the same prefix"
            )
            observed.add(n1)
    finally:
        q.awaitTermination(300)
    assert q.exception() is None

    # the drained store must serve the full corpus exactly
    final = [
        tuple(r)
        for r in bm25_from_postings(
            spark, store, SEARCH_TERMS, limit=20
        ).collect()
    ]
    assert final == expected[docs.count()]
    observed.add(docs.count())
    # the interleaving must have actually exercised >1 prefix —
    # otherwise the test silently degenerated to a post-drain check
    assert len(observed) >= 2, (
        f"only prefixes {observed} observed — serves never "
        "interleaved with the stream; slow the trigger or add files"
    )


def test_phrase_serves_committed_prefixes_under_running_maintainer(
    spark, sf_dir, tmp_path
):
    """The positional twin: phrase_from_postings interleaved with
    maintain_positional_postings micro-batches — every stable serve
    equals the offline prefix store (the batches ledger is the
    commit point; _positional_live pins hw before every read)."""
    from se_data_pipeline_spark.sources.layout import (
        phrase_from_postings,
        write_positional_postings,
    )
    from se_data_pipeline_spark.streaming.jobs import (
        maintain_positional_postings,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    phrase = ("table", "hash")

    def _ledger_n(store: str) -> int:
        p = os.path.join(store, "batches")
        if not os.path.isdir(p):
            return 0
        rows = (
            spark.read.schema("n_docs long, batch_id int")
            .parquet(p)
            .agg(F.sum("n_docs").alias("n"))
            .collect()
        )
        return int(rows[0]["n"] or 0)

    expected: dict[int, list] = {}
    for p in range(1, _N_FILES + 1):
        prefix = docs.filter(f"doc_id % {_N_FILES} < {p}")
        store_p = str(tmp_path / f"prefix_{p}")
        write_positional_postings(prefix, store_p, n_buckets=32)
        expected[prefix.count()] = [
            tuple(r)
            for r in phrase_from_postings(
                spark, store_p, phrase, limit=10
            ).collect()
        ]

    src = str(tmp_path / "src")
    _staggered_files(docs, src, _N_FILES)
    store = str(tmp_path / "store")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = maintain_positional_postings(
        stream, store, str(tmp_path / "chk"), n_buckets=32
    )

    observed: set[int] = set()
    try:
        while q.isActive:
            if not os.path.isdir(os.path.join(store, "batches")):
                _time.sleep(0.2)
                continue
            n1 = _ledger_n(store)
            if n1 == 0:
                continue
            served = [
                tuple(r)
                for r in phrase_from_postings(
                    spark, store, phrase, limit=10
                ).collect()
            ]
            n2 = _ledger_n(store)
            if n1 != n2:
                continue
            assert n1 in expected and served == expected[n1]
            observed.add(n1)
    finally:
        q.awaitTermination(300)
    assert q.exception() is None
    final = [
        tuple(r)
        for r in phrase_from_postings(
            spark, store, phrase, limit=10
        ).collect()
    ]
    assert final == expected[docs.count()]
    observed.add(docs.count())
    assert len(observed) >= 2
