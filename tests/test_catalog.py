"""Catalog contract tests: every driver table loads and matches its
declared schema exactly (typed columns — no inference drift)."""

from __future__ import annotations

import pytest

from se_data_pipeline_spark.catalog import (
    RELATIONAL_TABLES,
    load_table,
    validate_table,
)


@pytest.mark.parametrize("name", RELATIONAL_TABLES)
def test_table_matches_declared_schema(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    validate_table(df, name)  # must not raise
    assert df.count() > 0


def test_validate_rejects_drift(spark, sf_dir):
    df = load_table(spark, sf_dir, "region").withColumnRenamed(
        "r_name", "region_name"
    )
    with pytest.raises(ValueError, match="drifted"):
        validate_table(df, "region")


def test_events_ts_form_cache_invalidates_on_rewrite(tmp_path):
    """The footer-probe cache must key on the FILE, not the path: a
    table rewritten in place with the other ts precision (a
    compaction/replica flow writing real timestamps over a nanos
    original) must be re-probed, or the stale cached form applies the
    wrong read schema (ADVICE r6 low)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from se_data_pipeline_spark.catalog import _events_ts_form

    path = str(tmp_path / "events.parquet")

    def write(unit: str) -> None:
        tbl = pa.table(
            {"ts": pa.array([1_700_000_000_000_000], pa.timestamp(unit))}
        )
        pq.write_table(tbl, path)

    write("ns")
    assert _events_ts_form(path) == "nanos"
    time.sleep(0.01)  # ensure a distinct mtime_ns even on coarse clocks
    write("us")
    assert _events_ts_form(path) == "us"
    # directory form: probe follows the part file, same invalidation
    d = str(tmp_path / "events_dir.parquet")
    os.makedirs(d)
    part = os.path.join(d, "part-00000.parquet")
    tbl = pa.table({"ts": pa.array([1], pa.timestamp("ns"))})
    pq.write_table(tbl, part)
    assert _events_ts_form(d) == "nanos"
    time.sleep(0.01)
    tbl = pa.table({"ts": pa.array([1], pa.timestamp("us"))})
    pq.write_table(tbl, part)
    assert _events_ts_form(d) == "us"


def test_nanos_as_long_conf_does_not_corrupt_other_timestamp_reads(
    spark, sf_dir, tmp_path
):
    """load_table sets spark.sql.legacy.parquet.nanosAsLong=true
    SESSION-WIDE when events ships TIMESTAMP(NANOS) — Spark cannot
    scope it per-read (catalog.py documents the stickiness). Pin the
    documented safety assumption (r7 VERDICT #6): with the conf
    stuck on, (a) a micro/milli-precision timestamp parquet still
    reads as a real timestamp with identical values, and (b) every
    OTHER declared-timestamp driver table still loads and validates
    against its contract. Only genuinely nanos-typed columns are
    affected by the conf — i.e. 'only events ships nanos' is
    enforced by physics, not luck."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        us_val = 1_700_000_123_456_789
        path = str(tmp_path / "other_ts.parquet")
        pq.write_table(
            pa.table(
                {
                    "id": pa.array([1, 2], pa.int64()),
                    "created": pa.array(
                        [us_val, us_val + 1], pa.timestamp("us")
                    ),
                }
            ),
            path,
        )
        df = spark.read.parquet(path)
        assert df.schema["created"].dataType.simpleString().startswith(
            "timestamp"
        ), "us-precision column must NOT collapse to bigint"
        got = sorted(
            r["created"] for r in df.select("created").collect()
        )
        import datetime

        expect = [
            datetime.datetime(1970, 1, 1)
            + datetime.timedelta(microseconds=us_val + i)
            for i in range(2)
        ]
        assert got == expect

        # the real driver tables with timestamp contracts, under the
        # sticky conf: orders / lineitem still validate + read
        for name in ("orders", "lineitem"):
            t = load_table(spark, sf_dir, name)
            validate_table(t, name)
            assert t.count() > 0

        # and a genuinely-nanos column IS affected (the documented
        # hazard the conf exists for): reads as bigint
        npath = str(tmp_path / "nanos_ts.parquet")
        pq.write_table(
            pa.table({"ts": pa.array([1], pa.timestamp("ns"))}), npath
        )
        ndf = spark.read.parquet(npath)
        assert ndf.schema["ts"].dataType.simpleString() == "bigint"
    finally:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")


def test_observe_quality_counts_in_single_pass(spark, sf_dir):
    """observe() metrics must match the standalone counts, and they
    ride the consuming action's pass (no extra scan)."""
    from pyspark.sql import functions as F

    from se_data_pipeline_spark.catalog import load_table, observe_quality

    li = load_table(spark, sf_dir, "lineitem")
    instrumented, obs = observe_quality(
        li,
        "li_quality",
        {
            "suspicious_qty": F.col("l_quantity") > 45,
            "null_shipdate": F.col("l_shipdate").isNull(),
        },
    )
    # the consuming "job" is an ordinary aggregate
    instrumented.agg(F.sum("l_quantity")).collect()
    got = obs.get
    assert got["n_rows"] == li.count()
    assert got["suspicious_qty"] == li.filter(F.col("l_quantity") > 45).count()
    assert got["null_shipdate"] == 0
