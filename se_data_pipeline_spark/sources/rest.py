"""Paged REST API source (SURVEY §2.1 S7): the reference calls the
YouTube Data API `channels.list` in 50-id pages (test2.py:11-36,
starngage_crawler.ipynb cell 4). Restated as a distributed operator:

ids → page_key = floor(row_number/page_size) → groupBy page →
mapInPandas(one API call per page) → one enriched row per id.

The page becomes a groupable key, so page-level batching parallelizes
across executors while preserving the API's batch contract, and rate
limits map to partition count instead of driver-side sleeps. The real
HTTP backend is a stub (no network here); the fake returns
deterministic enrichment and injects not-found ids (the J2 anti-join
feed, starngage_crawler cells 7-8).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

PAGE_SIZE = 50  # API page size (starngage_crawler.ipynb:L105-L112)


class ApiBackend(Protocol):
    def fetch_page(self, ids: list[str]) -> dict[str, dict]:
        """One API call: up to PAGE_SIZE ids → {id: fields} for the
        ids the API knows (missing ids are simply absent)."""
        ...


class FakeChannelApi:
    """Deterministic enrichment: fields derive from md5(id); ~10% of
    ids are not found (absent from the response), mirroring the
    reference's notfound handling ('item(s)' bug §7.4(8) fixed by
    contract: absent means absent)."""

    def __init__(self, notfound_pct: int = 10):
        self.notfound_pct = notfound_pct
        self.calls: list[int] = []  # page sizes, for batching asserts

    def fetch_page(self, ids: list[str]) -> dict[str, dict]:
        self.calls.append(len(ids))
        out = {}
        for cid in ids:
            h = int.from_bytes(hashlib.md5(cid.encode()).digest()[:8], "big")
            if h % 100 < self.notfound_pct:
                continue
            out[cid] = {
                "n_videos": h % 5000,
                "n_views": h % 10_000_000,
                "n_subs": h % 500_000,
                "custom_url": f"@{cid[:8].lower()}",
            }
        return out


class HttpChannelApi:
    """Real backend stub — YouTube Data API v3 channels.list
    (test2.py:11-36). Needs network + API key."""

    def __init__(self, api_key: str):
        self.api_key = api_key

    def fetch_page(self, ids: list[str]) -> dict[str, dict]:  # pragma: no cover
        raise NotImplementedError("requests.get(CHANNELS_URL, ...) goes here")


_ENRICH_SCHEMA = (
    "id string, page long, found boolean, n_videos long, n_views long, "
    "n_subs long, custom_url string"
)


_SEQ_BUCKETS = 64  # parallelism of the global-sequence assignment


def _with_dense_seq(ids_df: DataFrame) -> DataFrame:
    """Assign a dense deterministic 0..n-1 sequence without a
    single-partition window: hash ids into buckets, count each bucket
    (one tiny driver collect of <=_SEQ_BUCKETS longs), broadcast the
    cumulative offsets back, and rank only within buckets. Total order
    is (bucket, id) — deterministic and recompute-stable, and every
    window partition holds ~n/_SEQ_BUCKETS rows at any scale."""
    ids = ids_df.select("id").withColumn(
        "bucket", F.pmod(F.xxhash64("id"), F.lit(_SEQ_BUCKETS))
    )
    counts = sorted(
        (r["bucket"], r["c"])
        for r in ids.groupBy("bucket").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offsets, run = [], 0
    for bucket, c in counts:
        offsets.append((bucket, run))
        run += c
    off_df = ids_df.sparkSession.createDataFrame(
        offsets or [(0, 0)], "bucket long, off long"
    )
    w_local = W.partitionBy("bucket").orderBy("id")
    return (
        ids.join(F.broadcast(off_df), "bucket")
        .withColumn("seq", F.row_number().over(w_local) - 1 + F.col("off"))
        .drop("bucket", "off")
    )


def enrich_ids(ids_df: DataFrame, backend: ApiBackend, page_size: int = PAGE_SIZE) -> DataFrame:
    """The S7 operator: batch ids into API pages and fetch each page
    in one backend call. Rows with found=false are the J2 anti-join
    feed (notfound_ids).

    Pages are dense (exactly ceil(n/page_size) of them, every page but
    the last full) so the API-call count is minimal; the sequence that
    packs them is computed with bucket-local windows + broadcast
    offsets (_with_dense_seq), never a global single-partition sort."""
    paged = _with_dense_seq(ids_df).withColumn(
        "page", F.floor(F.col("seq") / page_size)
    ).drop("seq").repartition(F.col("page"))

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            for page_no, page in pdf.groupby("page"):
                ids = list(page["id"])
                found = backend.fetch_page(ids)
                rows = []
                for cid in ids:
                    f = found.get(cid)
                    rows.append(
                        (
                            cid,
                            int(page_no),
                            f is not None,
                            f["n_videos"] if f else None,
                            f["n_views"] if f else None,
                            f["n_subs"] if f else None,
                            f["custom_url"] if f else None,
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "id",
                        "page",
                        "found",
                        "n_videos",
                        "n_views",
                        "n_subs",
                        "custom_url",
                    ],
                )

    return paged.mapInPandas(fetch, _ENRICH_SCHEMA)


def notfound_ids(enriched: DataFrame) -> DataFrame:
    """J2: the crawled-but-unknown id set."""
    return enriched.filter(~F.col("found")).select("id")
