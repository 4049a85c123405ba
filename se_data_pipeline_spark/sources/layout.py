"""Physical-layout helpers: bucketing for co-located, shuffle-free
joins (SURVEY §4.2 — the optimization class the reference cannot
express at all; its pandas merges always re-hash in memory).

At 100 TB the dominant cost of a fact⋈fact join is the shuffle. If
both tables are written bucketed (and optionally sorted) by the join
key with the same bucket count, Spark plans a SortMergeJoin with NO
Exchange on either side — each task reads bucket i of both tables.
Bucket counts must match (or divide evenly on Spark 3.1+ with
spark.sql.bucketing.coalesceBucketsInJoin.enabled); re-bucketing a
100 TB table is one full shuffle paid ONCE at write time instead of
on every downstream join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (+ sorted within buckets) managed
    table. Sorting lets the bucketed SortMergeJoin skip its per-task
    sort as well, leaving pure merge work."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With
    matching bucket specs the physical plan carries no Exchange —
    the test asserts that property on the executed plan."""
    return spark.table(left_table).join(spark.table(right_table), on)
