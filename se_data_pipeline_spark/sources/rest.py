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


# ------------------------------------------------ requests adapter
# Real transport for S7, structured like the yt-dlp adapter
# (sources/acquire.py): URL/param construction, response parsing and
# the HTTP-status -> error-class taxonomy are pure functions testable
# against recorded fixtures; only the HTTP GET itself needs network
# (injectable `session` with the requests.get contract).

SEARCH_URL = "https://www.googleapis.com/youtube/v3/search"
CHANNELS_URL = "https://www.googleapis.com/youtube/v3/channels"

# Typed API error classes (T4 dead-letter taxonomy for the REST leg).
ERR_QUOTA = "QUOTA_EXCEEDED"
ERR_API_KEY = "API_KEY_INVALID"
ERR_API = "API_ERROR"


def channels_list_params(ids: list[str], api_key: str) -> dict:
    """channels.list query params (starngage_crawler.ipynb cell 4:
    part='snippet,statistics,topicDetails', id=','.join(ids)) — the
    50-id batch form the notebook's HttpError 400 shows it needed."""
    return {
        "part": "snippet,statistics,topicDetails",
        "id": ",".join(ids),
        "maxResults": PAGE_SIZE,
        "key": api_key,
    }


def search_params(
    query: str,
    api_key: str,
    max_results: int = PAGE_SIZE,
    page_token: str | None = None,
) -> dict:
    """search query params (test2.py:12-18), plus pageToken for the
    multi-page sweep the reference stops short of."""
    p = {
        "part": "snippet",
        "q": query,
        "type": "channel",
        "maxResults": max_results,
        "key": api_key,
    }
    if page_token:
        p["pageToken"] = page_token
    return p


def parse_channels_items(payload: dict) -> dict[str, dict]:
    """channels.list response -> {id: fields}. Missing statistics map
    to proper nulls (P12: the reference's .get(..., 'N/A') stringly
    nulls, starngage_crawler.ipynb:L327-L334, become typed None);
    absent ids are simply absent (the 'item(s)' notfound bug §7.4(8)
    fixed by contract)."""
    out: dict[str, dict] = {}
    for item in payload.get("items", []):
        stats = item.get("statistics", {})
        snippet = item.get("snippet", {})

        def _num(key: str) -> int | None:
            v = stats.get(key)
            return int(v) if v is not None and str(v).isdigit() else None

        out[item["id"]] = {
            "n_videos": _num("videoCount"),
            "n_views": _num("viewCount"),
            "n_subs": _num("subscriberCount"),
            "custom_url": snippet.get("customUrl"),
        }
    return out


def parse_search_items(payload: dict) -> tuple[list[dict], str | None]:
    """search response -> ([channel_info], nextPageToken). Field
    mapping is test2.py:25-32 verbatim (channel_id/title/description/
    published_at from snippet)."""
    channels = [
        {
            "channel_id": item["snippet"]["channelId"],
            "title": item["snippet"]["title"],
            "description": item["snippet"]["description"],
            "published_at": item["snippet"]["publishedAt"],
        }
        for item in payload.get("items", [])
        if "snippet" in item
    ]
    return channels, payload.get("nextPageToken")


def classify_api_response(status_code: int, payload: dict) -> str | None:
    """HTTP outcome -> typed error class; None = usable response. The
    taxonomy keys off the Data API's error.errors[].reason field
    (quotaExceeded/keyInvalid are the two operational failures a
    long-running crawl must route differently: quota is retryable
    tomorrow, a bad key never is)."""
    if status_code == 200:
        return None
    reasons = {
        e.get("reason")
        for e in payload.get("error", {}).get("errors", [])
        if isinstance(e, dict)
    }
    if "quotaExceeded" in reasons or "dailyLimitExceeded" in reasons:
        return ERR_QUOTA
    if "keyInvalid" in reasons or (
        status_code in (400, 401) and "badRequest" in reasons
    ):
        return ERR_API_KEY
    return ERR_API


class ApiQuotaError(Exception):
    """Typed REST failure; .error_class feeds dead-letter routing (T4)
    exactly like acquire.AcquireError does for the yt-dlp leg."""

    def __init__(self, error_class: str, detail: str = ""):
        super().__init__(error_class)
        self.error_class = error_class
        self.detail = detail


def _default_session():  # pragma: no cover - needs network
    import requests

    return requests.Session()


class RequestsChannelApi:
    """Real S7 backend (test2.py:11-36, starngage_crawler.ipynb cell
    4): YouTube Data API v3 over an injectable `session` with the
    requests Session.get(url, params=) contract — tests inject a fake
    returning recorded response JSON so pagination, parsing, and the
    quota taxonomy all run without network."""

    def __init__(self, api_key: str, session=None):
        self.api_key = api_key
        self._session = session if session is not None else _default_session()

    # ApiBackend
    def fetch_page(self, ids: list[str]) -> dict[str, dict]:
        resp = self._session.get(
            CHANNELS_URL, params=channels_list_params(ids, self.api_key)
        )
        payload = resp.json()
        err = classify_api_response(resp.status_code, payload)
        if err is not None:
            raise ApiQuotaError(err, str(payload.get("error", "")))
        return parse_channels_items(payload)

    def search_channels(
        self, query: str, max_results: int = PAGE_SIZE, max_pages: int = 20
    ) -> list[dict]:
        """Paged channel search (test2.py:11-36 + the pageToken loop
        it stops short of): follows nextPageToken until exhausted or
        `max_pages` (a hard bound so a pathological cursor can't spin
        forever). Returns the seed list the crawl stage consumes."""
        out: list[dict] = []
        token: str | None = None
        for _ in range(max_pages):
            resp = self._session.get(
                SEARCH_URL,
                params=search_params(
                    query, self.api_key, max_results, page_token=token
                ),
            )
            payload = resp.json()
            err = classify_api_response(resp.status_code, payload)
            if err is not None:
                raise ApiQuotaError(err, str(payload.get("error", "")))
            channels, token = parse_search_items(payload)
            out.extend(channels)
            if not token:
                break
        return out


_ENRICH_SCHEMA = (
    "id string, page long, found boolean, n_videos long, n_views long, "
    "n_subs long, custom_url string, error_class string"
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

    cols = [
        "id",
        "page",
        "found",
        "n_videos",
        "n_views",
        "n_subs",
        "custom_url",
        "error_class",
    ]

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            for page_no, page in pdf.groupby("page"):
                ids = list(page["id"])
                rows = []
                try:
                    found = backend.fetch_page(ids)
                except ApiQuotaError as exc:
                    # T4: a page-level API failure (quota, bad key)
                    # dead-letters the PAGE's rows — error_class set,
                    # found=false — instead of crashing the task; a
                    # quota-failed page is re-fetchable tomorrow
                    # precisely because its ids are preserved.
                    rows = [
                        (cid, int(page_no), False, None, None, None, None,
                         exc.error_class)
                        for cid in ids
                    ]
                    yield pd.DataFrame(rows, columns=cols)
                    continue
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
                            None,
                        )
                    )
                yield pd.DataFrame(rows, columns=cols)

    return paged.mapInPandas(fetch, _ENRICH_SCHEMA)


def notfound_ids(enriched: DataFrame) -> DataFrame:
    """J2: the crawled-but-unknown id set. API-error rows are NOT
    not-found (the API never answered for them) — they route through
    acquire.split_dead_letter instead."""
    return enriched.filter(
        ~F.col("found") & F.col("error_class").isNull()
    ).select("id")
