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
