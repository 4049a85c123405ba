"""Acquire connectors (SURVEY §2.1 S7-S11): the external-world fetch
stage — playlist listing, audio download, metadata/format probes —
behind pluggable backends with a typed error taxonomy and dead-letter
routing (T4).

The real backends shell out to yt-dlp / call the YouTube Data API
(yt_download.py, test2.py); they are stubs here (no network in this
container). The deterministic fakes generate stable synthetic data
from key hashes, so every downstream operator is testable.

Execution-model decisions (SURVEY §4.1 "acquire barrier"):
- fetch UDFs are marked asNondeterministic() so Catalyst neither
  reorders them before cheap filters nor re-executes them;
- acquire outputs should be checkpointed (written to storage) before
  expensive reuse — network results are not replayable.
"""

from __future__ import annotations

import hashlib
from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Typed error classes (yt_download.py:120-129).
ERR_PREMIERE = "PREMIERE_VIDEO"
ERR_OFFLINE = "OFFLINE_VIDEO"
ERR_NO_OUTPUT = "NO_OUTPUT_FILE"
ERROR_CLASSES = (ERR_PREMIERE, ERR_OFFLINE, ERR_NO_OUTPUT)


class PlaylistBackend(Protocol):
    def playlist_ids(self, channel_url: str) -> list[str]:
        """S8: channel URL → ordered video ids."""
        ...


class ProbeBackend(Protocol):
    def video_duration_sec(self, video_url: str) -> int:
        """S10: metadata probe."""
        ...

    def error_class(self, video_url: str) -> str | None:
        """S9 failure taxonomy: None = fetchable."""
        ...


def _stable_int(key: str, mod: int) -> int:
    """Deterministic pseudo-random int from a key (md5-based, seed-free
    and platform-stable — NOT Python's randomized hash())."""
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big") % mod


class FakeAcquireBackend:
    """Deterministic synthetic backend: per-channel video count and
    per-video durations/errors derive from md5 of the ids. Mirrors the
    reference's observable behaviors: variable playlist sizes, a few
    premiere/offline videos, durations spanning every trim-rule branch.
    """

    def __init__(self, max_videos: int = 80, error_rate_pct: int = 6):
        self.max_videos = max_videos
        self.error_rate_pct = error_rate_pct

    def playlist_ids(self, channel_url: str) -> list[str]:
        n = 5 + _stable_int(channel_url, self.max_videos - 4)
        cid = channel_url.rsplit("/", 1)[-1]
        return [f"{cid[:6]}v{i:05d}" for i in range(n)]

    def video_duration_sec(self, video_url: str) -> int:
        # spread over [30, 3030) so <180 / 180-2042 / >2042 all occur
        return 30 + _stable_int(video_url + ":d", 3000)

    def error_class(self, video_url: str) -> str | None:
        r = _stable_int(video_url + ":e", 100)
        if r < self.error_rate_pct // 2:
            return ERR_PREMIERE
        if r < self.error_rate_pct:
            return ERR_OFFLINE
        return None


class YtDlpBackend:
    """Real backend stub (yt_download.py:14-28,82-136 shell out to
    yt-dlp). Requires network + yt-dlp binary; not available here."""

    def playlist_ids(self, channel_url: str) -> list[str]:  # pragma: no cover
        raise NotImplementedError("yt-dlp subprocess source; needs network")

    def video_duration_sec(self, video_url: str) -> int:  # pragma: no cover
        raise NotImplementedError

    def error_class(self, video_url: str) -> str | None:  # pragma: no cover
        raise NotImplementedError


def fetch_playlists(channels: DataFrame, backend: PlaylistBackend) -> DataFrame:
    """S8 as an acquire stage: channels(url, id) → one row per video
    (channel_id, video_id, position), via a non-deterministic
    array-returning UDF + posexplode (SURVEY S8).

    Partitioning: the fetch runs one task per channel partition —
    exactly the reference's process-per-channel fan-out
    (data_pipeline.py:774) but elastic. The UDF is nondeterministic →
    Catalyst keeps it after pushed-down channel filters and never
    double-fetches."""

    @pandas_udf(ArrayType(StringType()))
    def _ids(urls: pd.Series) -> pd.Series:
        return pd.Series([backend.playlist_ids(u) for u in urls])

    ids_udf = _ids.asNondeterministic()
    return (
        channels.select(F.col("id").alias("channel_id"), "url")
        .withColumn("video_ids", ids_udf("url"))
        .select(
            "channel_id",
            F.posexplode("video_ids").alias("position", "video_id"),
        )
        .select("channel_id", "video_id", F.col("position").cast("int"))
    )


_PROBE_SCHEMA = StructType(
    [
        StructField("duration_sec", IntegerType()),
        StructField("error_class", StringType()),
    ]
)


def probe_videos(videos: DataFrame, backend: ProbeBackend) -> DataFrame:
    """S9/S10/S11 acquire stage: append duration + error_class per
    video in one fetch pass (struct-returning nondeterministic UDF —
    one network round per row, not two)."""

    @pandas_udf(_PROBE_SCHEMA)
    def _probe(video_ids: pd.Series) -> pd.DataFrame:
        durs, errs = [], []
        for vid in video_ids:
            url = f"https://www.youtube.com/watch?v={vid}"
            err = backend.error_class(url)
            errs.append(err)
            durs.append(None if err else backend.video_duration_sec(url))
        return pd.DataFrame({"duration_sec": durs, "error_class": errs})

    probe_udf = _probe.asNondeterministic()
    return videos.withColumn("probe", probe_udf("video_id")).select(
        *videos.columns,
        F.col("probe.duration_sec").alias("duration_sec"),
        F.col("probe.error_class").alias("error_class"),
    )


def split_dead_letter(
    df: DataFrame, error_col: str = "error_class"
) -> tuple[DataFrame, DataFrame]:
    """T4: route typed failures out of the main flow. Returns
    (ok, dead) — dead keeps every column plus the error class, ready
    for an append-mode JSON sink (the reference's err.jsonl /
    skipped_channels.txt, filter_channel.py:59-63)."""
    ok = df.filter(F.col(error_col).isNull()).drop(error_col)
    dead = df.filter(F.col(error_col).isNotNull())
    return ok, dead
