"""Array / higher-order-function operators and the channel-ranking
pipeline analog (SURVEY A3/A6/A7/A8/A9, F9-F12, E3.2).

The reference computed per-row Python loops over lists (n_snr_ok,
mean, weighted label score, nested metadata documents). Here the same
semantics are Catalyst HOF expressions — size/filter/aggregate/
transform — which run JVM-side inside whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from se_data_pipeline_spark.catalog import load_table
from se_data_pipeline_spark.functions.arrays import (
    array_count_above,
    array_mean,
)
from se_data_pipeline_spark.queries import query
from se_data_pipeline_spark.queries.events import _cap_per_key

# Buffer policy (r7, ADVICE adjudication): queries whose ANSWER is a
# plain aggregate over all rows (counts, sums, means) use plain
# count/sum(when)/avg aggregates — no collect buffer exists, so no
# cap is needed and the result is exact at ANY key size. Queries that
# genuinely need a per-key buffer (a zipped array, a concatenated
# document, an order-sensitive HOF reduce) bound it BEFORE the
# aggregate with events._cap_per_key: truncating mode where first-N
# semantics are exact or declared, STRICT mode (fail loudly at
# runtime) where truncation would silently change an oracle-checked
# answer. Both guards ride the same hash partitioning the groupBy
# reuses (one shuffle total); aggregation buffers don't spill, so an
# unbounded per-key history (a 100k-line order, a bot user) would
# OOM its task at the 100 TB target.


# --------------------------------------------------------------------------
# Array stats via HOFs (A6/A7): build per-order quantity arrays, then
# size / filtered-count / mean — all order-insensitive reductions, so
# collect_list's nondeterministic order is irrelevant.
# --------------------------------------------------------------------------
@query(
    "order_quantity_stats",
    oracle="""
    SELECT l_orderkey,
           COUNT(*) AS n_items,
           CAST(COUNT(*) FILTER (WHERE l_quantity > 30) AS BIGINT) AS n_big,
           ROUND(AVG(l_quantity), 6) AS avg_qty
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def order_quantity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's `n_total = len(snrss)` / `(snrss > 20).sum()` /
    `np.mean(snrss)` (quality_merge cell 4). These are plain
    order-insensitive reductions, so they are computed as plain
    count / count(when) / avg aggregates — map-side partial
    aggregation, no per-key buffer, no cap, exact at any key size
    (r7: previously a capped collect_list+HOF plan whose answer would
    have silently truncated above 10k lines/order; the HOF surface is
    now exercised by order_leading_lines_hof, whose bound is part of
    the declared semantics)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.count(F.when(F.col("l_quantity") > 30, 1)).alias("n_big"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
    )


@query(
    "order_leading_lines_hof",
    oracle="""
    WITH first_lines AS (
      SELECT l_orderkey, l_quantity
      FROM (
        SELECT l_orderkey, l_quantity,
               ROW_NUMBER() OVER (
                 PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
        FROM lineitem)
      WHERE rn <= 5)
    SELECT l_orderkey,
           COUNT(*) AS n_lead,
           CAST(COUNT(*) FILTER (WHERE l_quantity > 30) AS BIGINT)
             AS n_lead_big,
           ROUND(AVG(l_quantity), 6) AS lead_avg_qty
    FROM first_lines
    GROUP BY l_orderkey
    """,
)
def order_leading_lines_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A7 HOF surface — size(arr), size(filter(arr, x -> x > t)),
    aggregate-mean over a per-order quantity array — where the array
    is the first 5 line items per order BY SPEC (mirrored in the
    oracle's ROW_NUMBER() <= 5), so the collect buffer is bounded by
    construction (≤5 elements per key, never a silent truncation) and
    the plan stays one shuffle: the cap window's hash partitioning is
    reused by the groupBy."""
    li = _cap_per_key(
        load_table(spark, sf_dir, "lineitem"),
        ["l_orderkey"],
        # l_linenumber alone is not a total order in the fixture —
        # the tiebreakers make "first 5" deterministic on both sides
        ["l_linenumber", "l_partkey", "l_quantity"],
        cap=5,
    )
    arr = li.groupBy("l_orderkey").agg(
        F.collect_list("l_quantity").alias("qtys")
    )
    return arr.select(
        "l_orderkey",
        F.size("qtys").cast("long").alias("n_lead"),
        array_count_above(F.col("qtys"), 30.0).cast("long").alias("n_lead_big"),
        F.round(array_mean(F.col("qtys")), 6).alias("lead_avg_qty"),
    )


# --------------------------------------------------------------------------
# The full channel-ranking pipeline (E3.2) re-expressed on the star
# schema: per-supplier "quality" arrays → HOF stats → global-max
# normalization → dimension join → rank.
# --------------------------------------------------------------------------
@query(
    "supplier_quality_rank",
    oracle="""
    WITH stats AS (
      SELECT l_suppkey,
             COUNT(*) AS n_total,
             CAST(COUNT(*) FILTER (WHERE l_quantity > 30) AS BIGINT) AS n_ok
      FROM lineitem
      WHERE l_suppkey IS NOT NULL
      GROUP BY l_suppkey),
    mx AS (SELECT MAX(n_ok) AS max_ok, MAX(n_total) AS max_total FROM stats)
    SELECT s.s_name, st.n_total, st.n_ok,
           ROUND(st.n_ok * 1.0 / NULLIF(mx.max_ok, 0)
                 + st.n_total * 1.0 / NULLIF(mx.max_total, 0), 6)
             AS score
    FROM stats st
    CROSS JOIN mx
    JOIN supplier s ON s.s_suppkey = st.l_suppkey
    ORDER BY score DESC, s.s_name
    """,
)
def supplier_quality_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3.2 end-to-end analog: array stats (A6) → global max (A3) →
    normalized score (A8) → inner join with the dimension (J1) →
    ordered ranking (O1/O2).

    Scale note: the global max is computed as a 1-row aggregate and
    cross-joined (broadcast — 1 row), NOT with an unpartitioned
    window, which would funnel all rows through one task. This also
    fixes reference bug §7.4(5): the max is global, not per-shard.

    r7: the per-supplier stats are plain count / count(when)
    aggregates — map-side partial aggregation, no collect buffer, no
    cap window, exact at any key size. (The previous capped
    collect_list plan cost an extra per-key sort — the r6 bench's one
    >1.3× regression — and would have silently truncated counts above
    10k lines/supplier.)

    The explicit isNotNull filter (mirrored in the oracle: a line
    with no supplier can't score one) exists for EXCHANGE REUSE: the
    equi-join pushes isnotnull(l_suppkey) into only one of the two
    stats subtrees, de-canonicalizing otherwise identical scans — so
    the fact table was scanned and pre-aggregated TWICE (verified on
    the AQE final plan). With both branches filtered identically,
    ReusedExchange collapses them to one scan — at 100 TB that halves
    the dominant cost of this query."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_suppkey").isNotNull()
    )
    supp = load_table(spark, sf_dir, "supplier")
    stats = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("l_quantity") > 30, 1)).alias("n_ok"),
    )
    mx = stats.agg(
        F.max("n_ok").alias("max_ok"), F.max("n_total").alias("max_total")
    )
    return (
        stats.crossJoin(F.broadcast(mx))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_name",
            "n_total",
            "n_ok",
            # try_divide: nobody passed the gate -> max_ok = 0 ->
            # NULL score term, not a DIVIDE_BY_ZERO crash (oracle:
            # NULLIF)
            F.round(
                F.try_divide(F.col("n_ok"), F.col("max_ok"))
                + F.try_divide(F.col("n_total"), F.col("max_total")),
                6,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("s_name"))
    )


# --------------------------------------------------------------------------
# Signed label-weighted reduce (F12/D4: speech-prob from AC
# predictions) over event streams: +value for "good" event labels,
# -value for "bad" ones, via aggregate() over collected structs.
# --------------------------------------------------------------------------
@query(
    "user_weighted_event_score",
    oracle="""
    SELECT user_id,
           ROUND(SUM(CASE WHEN event_type IN ('purchase', 'signup') THEN value
                          WHEN event_type IN ('error') THEN -value
                          ELSE 0 END), 6) AS wscore,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def user_weighted_event_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ac_get_speech_probs (audio_ac.py:53-79): a
    signed, label-weighted sum over an array of {label, score} structs
    — expressed as aggregate(collect_list(struct), 0D, CASE ...), a
    pure Catalyst expression (SURVEY F12), no UDF.

    Summation runs in array order inside one group; rounding makes it
    oracle-stable.

    The per-user buffer is STRICT-capped (r7): this query's wscore /
    n_events are totals over ALL of a user's events, so truncation
    would silently change the answer — instead a bot user above the
    cap fails the job loudly. The guard is folded into `value`
    (consumed by the collected struct, so never pruned) and adds no
    per-key sort.
    """
    ev = _cap_per_key(
        load_table(spark, sf_dir, "events"),
        ["user_id"],
        [],  # strict mode never truncates — no ordering semantics
        strict=True,
        guard_col="value",
    )
    preds = ev.groupBy("user_id").agg(
        F.collect_list(
            F.struct(F.col("event_type").alias("label"), F.col("value").alias("score"))
        ).alias("preds")
    )
    weighted = F.aggregate(
        F.col("preds"),
        F.lit(0.0),
        lambda acc, x: acc
        + F.when(x["label"].isin("purchase", "signup"), x["score"])
        .when(x["label"].isin("error"), -x["score"])
        .otherwise(F.lit(0.0)),
    )
    return preds.select(
        "user_id",
        F.round(weighted, 6).alias("wscore"),
        F.size("preds").cast("long").alias("n_events"),
    )


# --------------------------------------------------------------------------
# Grouped collect-to-document (A9): per-customer ordered digest of
# their orders — the reference's nested per-channel metadata JSON.
# --------------------------------------------------------------------------
@query(
    "customer_order_document",
    oracle="""
    SELECT o_custkey,
           STRING_AGG(o_orderkey || ':' || o_orderstatus, ','
                      ORDER BY o_orderkey) AS order_doc,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def customer_order_document(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().agg(collect_list(struct)) → sort_array → transform →
    array_join: the deterministic restatement of the reference's
    per-channel nested metadata document build
    (data_pipeline.py:661-676, A9). sort_array on the leading struct
    field makes the document canonical regardless of row arrival
    order — required for exactly-once re-publishing at scale.

    The per-customer buffer is STRICT-capped (r7): the document
    concatenates ALL of a customer's orders, so truncation would
    silently change it — a mega-customer above the cap fails loudly
    instead. Guard folded into o_orderkey (consumed by the struct)."""
    orders = _cap_per_key(
        load_table(spark, sf_dir, "orders"),
        ["o_custkey"],
        [],  # strict mode never truncates — no ordering semantics
        strict=True,
        guard_col="o_orderkey",
    )
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.collect_list(
                F.struct(F.col("o_orderkey"), F.col("o_orderstatus"))
            ).alias("entries")
        )
        .select(
            "o_custkey",
            F.array_join(
                F.transform(
                    F.sort_array(F.col("entries")),
                    lambda e: F.concat_ws(":", e["o_orderkey"], e["o_orderstatus"]),
                ),
                ",",
            ).alias("order_doc"),
            F.size("entries").cast("long").alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# Array zip → rows (F9: zip(paths, meta, snr, …) + enumerate →
# posexplode(arrays_zip(...))) — rebuilt from parallel collected
# arrays, then re-flattened with positions.
# --------------------------------------------------------------------------
@query(
    "zip_explode_lineitems",
    oracle="""
    SELECT l_orderkey, pos, l_partkey, l_quantity
    FROM (
      SELECT l_orderkey,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_quantity) - 1 AS INTEGER) AS pos,
             l_partkey, l_quantity
      FROM lineitem)
    WHERE pos < 2
    """,
)
def zip_explode_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode(arrays_zip(a, b)) — the reference's
    zip(segments, meta, snr) + enumerate (data_pipeline.py:658).
    Arrays are collected in an explicit (l_linenumber) sort so the
    zip position is deterministic; then re-exploded with position.

    The truncating cap is EXACT here at any scale: the query keeps
    only pos < 2, and the cap keeps the first 10k lines under the
    SAME total order the zip position uses — (l_linenumber,
    l_partkey, l_quantity); l_linenumber alone is not a total order
    in the fixture, so capping by it alone could drop a row that the
    full order places in the first 2 — always a superset of the
    first 2 for every order."""
    li = _cap_per_key(
        load_table(spark, sf_dir, "lineitem"),
        ["l_orderkey"],
        ["l_linenumber", "l_partkey", "l_quantity"],
    )
    arr = (
        li.groupBy("l_orderkey")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct("l_linenumber", "l_partkey", "l_quantity")
                )
            ).alias("lines")
        )
        .select(
            "l_orderkey",
            F.transform(F.col("lines"), lambda x: x["l_partkey"]).alias("partkeys"),
            F.transform(F.col("lines"), lambda x: x["l_quantity"]).alias("qtys"),
        )
    )
    return (
        arr.select(
            "l_orderkey",
            F.posexplode(F.arrays_zip(F.col("partkeys"), F.col("qtys"))).alias(
                "pos", "z"
            ),
        )
        .filter(F.col("pos") < 2)
        .select(
            "l_orderkey",
            "pos",
            F.col("z.partkeys").alias("l_partkey"),
            F.col("z.qtys").alias("l_quantity"),
        )
    )
