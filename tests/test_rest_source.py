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


# ------------------------------------------------- Python DataSource


def test_python_datasource_partitions_per_page_and_matches_operator(spark):
    """The Spark 4 Python DataSource delivery of S7 must (a) expose
    one input partition per API page, and (b) return exactly the rows
    the mapInPandas page-operator form produces for the same ids —
    two deliveries, one contract."""
    from se_data_pipeline_spark.sources import pyds
    from se_data_pipeline_spark.sources.rest import FakeChannelApi, enrich_ids

    ids = [f"chan{i:04d}" for i in range(120)]
    pyds.register(spark)
    df = (
        spark.read.format("channel_api")
        .option("ids", ",".join(ids))
        .option("page_size", "50")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # 120 ids / 50 per page

    got = {
        r["id"]: (r["n_videos"], r["n_views"], r["n_subs"], r["custom_url"])
        for r in df.collect()
    }

    # The operator form KEEPS not-found ids as null rows (anti-join
    # feed); the DataSource omits them (absent = not found). Found
    # rows must agree exactly; the DataSource's absences must be
    # exactly the operator's null rows.
    ids_df = spark.createDataFrame([(i,) for i in ids], "id string")
    op_rows = enrich_ids(ids_df, FakeChannelApi()).collect()
    via_operator = {
        r["id"]: (r["n_videos"], r["n_views"], r["n_subs"], r["custom_url"])
        for r in op_rows
        if r["n_videos"] is not None
    }
    assert got == via_operator
    assert 0 < len(got) < 120  # some ids are not-found by design
    op_notfound = {r["id"] for r in op_rows if r["n_videos"] is None}
    assert set(ids) - set(got) == op_notfound


def test_streaming_datasource_pages_match_batch(spark, tmp_path):
    """The streaming (offset-per-page) and batch (partition-per-page)
    DataSource deliveries must produce the same found set; the page
    offset advances once per micro-batch and parks when exhausted."""
    from se_data_pipeline_spark.sources import pyds

    pyds.register(spark)
    pyds.register_stream(spark)
    n = 120
    stream = (
        spark.readStream.format("channel_api_stream")
        .option("n_ids", str(n))
        .option("page_size", "50")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_chan_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["id"], r["n_subs"])
        for r in spark.sql("SELECT id, n_subs FROM t_chan_stream").collect()
    }

    ids = ",".join(f"chan{i:04d}" for i in range(n))
    batch = {
        (r["id"], r["n_subs"])
        for r in spark.read.format("channel_api")
        .option("ids", ids)
        .option("page_size", "50")
        .load()
        .collect()
    }
    assert got == batch and len(got) > 0
