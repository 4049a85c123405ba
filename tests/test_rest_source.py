"""Tests for the paged REST API source (sources/rest.py): page-level
batching honors the API page size, enrichment is deterministic, and
not-found ids feed the anti-join."""

from __future__ import annotations

from pyspark.sql import Row

from se_data_pipeline_spark.sources.rest import (
    FakeChannelApi,
    enrich_ids,
    notfound_ids,
)


def _ids_df(spark, n):
    return spark.createDataFrame([Row(id=f"UC{i:06d}") for i in range(n)])


def test_enrich_pages_and_fields(spark):
    backend = FakeChannelApi()
    df = enrich_ids(_ids_df(spark, 120), backend, page_size=50)
    rows = df.collect()
    assert len(rows) == 120  # one output row per input id
    found = [r for r in rows if r["found"]]
    missing = [r for r in rows if not r["found"]]
    assert len(found) > 0 and len(missing) > 0
    for r in found:
        assert r["n_subs"] is not None and r["custom_url"].startswith("@")
    for r in missing:
        assert r["n_videos"] is None


def test_page_size_contract(spark):
    rows = enrich_ids(_ids_df(spark, 120), FakeChannelApi(), page_size=50).collect()
    # every id fetched exactly once, pages hold ≤ 50 ids, 3 pages total
    assert len({r["id"] for r in rows}) == 120
    pages: dict[int, int] = {}
    for r in rows:
        pages[r["page"]] = pages.get(r["page"], 0) + 1
    assert sorted(pages) == [0, 1, 2]
    assert all(n <= 50 for n in pages.values())


def test_notfound_feed_is_deterministic(spark):
    backend = FakeChannelApi()
    a = sorted(
        r["id"]
        for r in notfound_ids(
            enrich_ids(_ids_df(spark, 200), backend)
        ).collect()
    )
    b = sorted(
        r["id"]
        for r in notfound_ids(
            enrich_ids(_ids_df(spark, 200), FakeChannelApi())
        ).collect()
    )
    assert a == b and len(a) > 0
