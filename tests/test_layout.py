"""Bucketed-layout tests: writing both join sides bucketed by the
join key must produce an Exchange-free SortMergeJoin — the pay-the-
shuffle-once-at-write-time contract that matters most at fact⋈fact
scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from se_data_pipeline_spark.catalog import load_table
from se_data_pipeline_spark.sources.layout import (
    bucketed_join,
    write_bucketed_table,
)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        )
        write_bucketed_table(orders, "t_orders_b", ["o_orderkey"], 8)
        write_bucketed_table(li, "t_lineitem_b", ["o_orderkey"], 8)

        joined = bucketed_join(
            spark, "t_orders_b", "t_lineitem_b", ["o_orderkey"]
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located

        # and it still computes the right thing
        n = joined.count()
        expected = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
