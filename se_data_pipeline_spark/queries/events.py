"""Event-time queries over the `events` table: tumbling & sliding
windows, sessionization, JSON extraction (SURVEY §2.11 batch
equivalents — the streaming/ package runs the same logic as
Structured Streaming with watermarks; these batch forms are the
oracle-checkable surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from se_data_pipeline_spark.catalog import load_table
from se_data_pipeline_spark.queries import query


@query(
    "events_hourly_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS sum_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate — F.window(), the
    same operator the streaming path runs with a watermark. Window
    assignment is a row-local expression; the only shuffle is the
    (window, type) aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "events_sliding_window",
    oracle="""
    SELECT ws AS window_start, COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS sum_value
    FROM (
      SELECT unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
             value
      FROM events)
    GROUP BY ws
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2 h size, 1 h slide): every event lands in two
    windows. F.window emits the window array inline (row-local
    explode), then one aggregate shuffle — no self-join."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_events", "sum_value"
        )
    )


@query(
    "user_sessions",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000 OR
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gaps)
    SELECT user_id,
           CAST(MAX(session_id) AS BIGINT) AS n_sessions,
           ROUND(COUNT(*) * 1.0 / MAX(session_id), 6) AS avg_events_per_session
    FROM sess
    GROUP BY user_id
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap > 30 min starts a new session;
    cumulative sum of session starts numbers them (the batch
    restatement of session_window(ts, '30 minutes') — the streaming/
    package runs the native one). One shuffle on user_id; both
    windows share the same partitioning, so Catalyst plans a single
    exchange."""
    ev = load_table(spark, sf_dir, "events")
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(order)
    with_flag = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0),
    )
    sess = with_flag.withColumn(
        "session_id",
        F.sum("new_session").over(
            order.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return sess.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.round(
            F.count(F.lit(1)) / F.max("session_id"), 6
        ).alias("avg_events_per_session"),
    )


@query(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (reference F13
    from_json/to_json surface) + grouped aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )
