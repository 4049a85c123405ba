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
