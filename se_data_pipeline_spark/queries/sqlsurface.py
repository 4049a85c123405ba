"""SQL-surface queries: the engine's ``spark.sql`` entry point over
registered views, exercising correlated subqueries (EXISTS / IN /
scalar) that Catalyst decorrelates into joins — shapes the DataFrame
queries elsewhere express by hand. Proves a user of the reference's
pandas "queries" can also drive this engine with plain ANSI SQL.

Each function registers the tables it needs as temp views (idempotent
per session) and returns ``spark.sql(...)``. The DuckDB oracle runs
the analogous SQL — kept textually separate because dialect details
(interval syntax, integer division) differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from se_data_pipeline_spark.catalog import load_table
from se_data_pipeline_spark.queries import query


def _register(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# --------------------------------------------------------------------------
# Correlated EXISTS (TPC-H Q4 shape): orders with at least one line
# shipped >100 days after the order date.
# --------------------------------------------------------------------------
@query(
    "sql_exists_late_orders",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 100 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def sql_exists_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS via the SQL surface. Catalyst decorrelates
    to a left-semi join on orderkey with the date predicate as the
    join condition — one shuffle pair, no per-row subquery
    execution. (TPC-H Q4's shape on the available columns.)"""
    _register(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o.o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 100 DAYS)
        GROUP BY o.o_orderpriority
        """
    )


# --------------------------------------------------------------------------
# IN + HAVING subquery (TPC-H Q18 shape): orders whose total quantity
# crosses a threshold, with customer attribution.
# --------------------------------------------------------------------------
@query(
    "sql_in_having_large_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey, ROUND(o.o_totalprice, 2) AS o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey
                           HAVING SUM(l_quantity) > 200)
    GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
    """,
)
def sql_in_having_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery with HAVING via the SQL surface (TPC-H Q18's
    large-volume-customer shape). Catalyst rewrites the IN as a
    left-semi join against the pre-aggregated subquery; AQE picks
    broadcast for the (small) qualifying-order set at this SF and
    a shuffled semi-join at corpus scale."""
    _register(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        """
        SELECT c.c_name, o.o_orderkey,
               ROUND(o.o_totalprice, 2) AS o_totalprice,
               ROUND(SUM(l.l_quantity), 2) AS total_qty
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                               GROUP BY l_orderkey
                               HAVING SUM(l_quantity) > 200)
        GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
        """
    )


# --------------------------------------------------------------------------
# Scalar subquery + NOT EXISTS (TPC-H Q22 shape): above-average
# balance customers who never placed an urgent order.
# --------------------------------------------------------------------------
@query(
    "sql_scalar_anti_prospects",
    oracle="""
    SELECT c.c_nationkey, COUNT(*) AS n_prospects,
           ROUND(SUM(c.c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                         WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
)
def sql_scalar_anti_prospects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (global AVG, computed once and broadcast as a
    literal) + correlated NOT EXISTS (decorrelated to a left-anti
    join on custkey with the priority filter pushed into the right
    side). TPC-H Q22's shape on the available columns."""
    _register(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_nationkey, COUNT(*) AS n_prospects,
               ROUND(SUM(c.c_acctbal), 2) AS total_bal
        FROM customer c
        WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                             WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY c.c_nationkey
        """
    )


# --------------------------------------------------------------------------
# Correlated scalar-aggregate subquery (TPC-H Q17 shape): revenue lost
# to small-quantity orders, per-part average threshold.
# --------------------------------------------------------------------------
@query(
    "sql_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13' AND p.p_size <= 5
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def sql_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar AVG subquery (TPC-H Q17's shape on the
    available columns: brand + size stand in for brand + container).
    Catalyst decorrelates to a per-partkey aggregate joined back on
    l_partkey — the inner aggregate is computed ONCE per part, not
    per outer row, so cost is one extra shuffle-agg over lineitem
    rather than a quadratic rescan. At 100 TB the brand/size filter
    prunes `part` first and AQE broadcasts the surviving partkeys
    into both the probe and the threshold aggregate."""
    _register(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#13' AND p.p_size <= 5
          AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
        """
    )


# --------------------------------------------------------------------------
# Double-correlated EXISTS + NOT EXISTS self-joins (TPC-H Q21 shape):
# the supplier who was the sole late shipper in multi-supplier orders.
# --------------------------------------------------------------------------
@query(
    "sql_sole_late_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    """,
)
def sql_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape: one correlated EXISTS and one correlated
    NOT EXISTS, both self-joins on lineitem, the NOT EXISTS also
    referencing the outer `orders` row (lateness = shipped >90 days
    after order date, standing in for receipt>commit which the
    reduced schema lacks). Catalyst decorrelates to a left-semi and
    a left-anti join on l_orderkey — three passes over lineitem
    total, all equi-shuffles on the same key, so at scale the
    exchange is reused rather than recomputed per branch."""
    _register(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(
        """
        SELECT s.s_name, COUNT(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAYS
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAYS)
        GROUP BY s.s_name
        """
    )


# --------------------------------------------------------------------------
# CTE + MAX-equality self-reference (TPC-H Q15 shape): the quarter's
# top-revenue supplier, the CTE evaluated once and reused twice.
# --------------------------------------------------------------------------
@query(
    "sql_top_revenue_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN rev r ON r.suppkey = s.s_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def sql_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15's shape: a CTE referenced both as the join input and
    inside a scalar MAX subquery. The revenue rollup is rounded
    BEFORE the MAX comparison so the equality is exact on both
    engines. Catalyst evaluates the scalar subquery as a one-row
    aggregate over the (already reduced, supplier-cardinality) CTE
    and folds it into the filter — the lineitem scan with its
    shipdate range pushed down happens once per CTE reference, and
    at scale the date filter prunes partitions before any shuffle."""
    _register(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(
        """
        WITH rev AS (
          SELECT l_suppkey AS suppkey,
                 ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name, r.total_rev
        FROM supplier s JOIN rev r ON r.suppkey = s.s_suppkey
        WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
        """
    )


# --------------------------------------------------------------------------
# Exact per-group percentiles (linear interpolation), complementing
# the approximate-sketch path in supplier_distinct_parts_approx.
# --------------------------------------------------------------------------
@query(
    "price_quartiles_by_flag",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def price_quartiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quartiles per group (PERCENTILE_CONT semantics — linear
    interpolation at rank (n-1)*p), the ground-truth twin of the
    percentile_approx sketch path.

    Scale: exact percentiles need the group's values together —
    one shuffle on the group key, sort within partition. For
    monitoring at 100 TB prefer the sketch; exact is for low-
    cardinality audits like this 3-group frame."""
    from se_data_pipeline_spark.catalog import parallelize_scan

    # the partial percentile buffers are the cost (every value is
    # collected into the ObjectHashAggregate buffer); on a one-split
    # scan that build serializes on one core — parallelize_scan
    # spreads it, and exact percentile merge order cannot change the
    # result (the buffer is sorted before interpolation)
    li = parallelize_scan(load_table(spark, sf_dir, "lineitem"))
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("p75"),
    )


# --------------------------------------------------------------------------
# Nested IN subqueries with a correlated HAVING threshold (TPC-H Q20
# shape): suppliers who dominate shipments of any red part.
# --------------------------------------------------------------------------
@query(
    "sql_dominant_red_suppliers",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem l1
      WHERE l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE 'red%')
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(l_quantity) > 0.15 * (SELECT SUM(l2.l_quantity)
                                      FROM lineitem l2
                                      WHERE l2.l_partkey = l1.l_partkey))
    """,
)
def sql_dominant_red_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20's nesting: an IN whose subquery contains another IN
    plus a HAVING gated by a *correlated* scalar aggregate (the
    supplier's share of that part's total shipped quantity).
    Catalyst decorrelates the inner scalar into a per-part aggregate
    joined back on partkey, and both INs into semi-joins — the
    whole thing runs as joins, no per-row subquery execution.
    At scale: part prefix filter prunes before the big join, and the
    per-(supplier, part) and per-part aggregates share the same
    lineitem scan shape."""
    _register(spark, sf_dir, "supplier", "lineitem", "part")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem l1
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'red%')
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(l_quantity) > 0.15 * (SELECT SUM(l2.l_quantity)
                                          FROM lineitem l2
                                          WHERE l2.l_partkey = l1.l_partkey))
        """
    )


# --------------------------------------------------------------------------
# LATERAL correlated subquery with ORDER BY + LIMIT: per-order top
# line. The decorrelated form of "top-1 per group" written the way a
# SQL user writes it.
# --------------------------------------------------------------------------
@query(
    "sql_lateral_top_lines",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, l.rev
    FROM (SELECT o_orderkey, o_totalprice FROM orders
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 10) o,
    LATERAL (SELECT l_linenumber,
                    ROUND(l_extendedprice * (1 - l_discount), 2) AS rev
             FROM lineitem WHERE l_orderkey = o.o_orderkey
             ORDER BY rev DESC, l_linenumber LIMIT 1) l
    """,
)
def sql_lateral_top_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL subquery with a correlated ORDER BY … LIMIT 1: the
    highest-revenue line of each of the ten biggest orders. Spark
    rewrites the correlated LIMIT into a ranked window under a join
    (DecorrelateInnerQuery), so this stays a set-based plan. The
    outer side is a true top-k (TakeOrderedAndProject) of 10 rows,
    so the lateral probe touches ten keys no matter the fact size.
    Ties broken by linenumber for determinism; orders with no lines
    drop out (inner lateral semantics) on both engines."""
    _register(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey, l.l_linenumber, l.rev
        FROM (SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 10) o,
        LATERAL (SELECT l_linenumber,
                        ROUND(l_extendedprice * (1 - l_discount), 2) AS rev
                 FROM lineitem WHERE l_orderkey = o.o_orderkey
                 ORDER BY rev DESC, l_linenumber LIMIT 1) l
        """
    )


# --------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE): a month spine generated by
# the engine itself, outer-joined against order counts — the
# gap-filling pattern expressed in pure SQL recursion.
# --------------------------------------------------------------------------
@query(
    "sql_recursive_month_spine",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1995-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP '2001-08-01')
    SELECT m.m, COUNT(o.o_orderkey) AS n_orders
    FROM months m
    LEFT JOIN orders o ON date_trunc('month', o.o_orderdate) = m.m
    GROUP BY m.m
    """,
)
def sql_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE month generator (80 iterations) left-joined to
    monthly order counts, so months with zero orders surface as 0 —
    the recursive-SQL twin of events_hourly_gap_filled (which builds
    its spine with sequence()+explode). The spine is 80 rows; the
    fact side aggregates to months BEFORE the join would matter at
    scale, but here the join key is date_trunc on the probe side and
    the spine broadcasts."""
    _register(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '1995-01-01'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months
          WHERE m < TIMESTAMP '2001-08-01')
        SELECT m.m, COUNT(o.o_orderkey) AS n_orders
        FROM months m
        LEFT JOIN orders o ON date_trunc('month', o.o_orderdate) = m.m
        GROUP BY m.m
        """
    )


# --------------------------------------------------------------------------
# Bilateral trade volume (TPC-H Q7 shape): revenue flowing between
# two specific nations per year, in both directions.
# --------------------------------------------------------------------------
_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
GROUP BY n1.n_name, n2.n_name, l_year
"""


@query("sql_q7_bilateral_trade", oracle=_Q7_SQL)
def sql_q7_bilateral_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping) on the available columns: lineitem
    ⋈ orders ⋈ customer ⋈ supplier with TWO nation dimension aliases
    and a disjunctive cross-nation predicate, grouped by direction
    and ship year.

    Scale: both nation sides broadcast (25 rows); the nation-name
    filters prune the fact rows during the broadcast hash joins, so
    only the two nations' traffic reaches the aggregate. The big
    joins (lineitem⋈orders on orderkey, ⋈customer on custkey) shuffle
    on their keys; AQE coalesces what the filter leaves. The Spark
    and oracle SQL are textually identical — the point of the SQL
    surface."""
    _register(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    return spark.sql(_Q7_SQL)


# --------------------------------------------------------------------------
# NOT IN subquery (TPC-H Q16 shape): null-aware anti join — the one
# subquery form whose three-valued-logic semantics differ from NOT
# EXISTS (a single NULL in the subquery empties the result), so
# Catalyst plans it as a dedicated null-aware anti join.
# --------------------------------------------------------------------------
@query(
    "sql_supplier_variety_not_in",
    oracle="""
    SELECT p.p_brand, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size IN (1, 5, 9, 13)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    """,
)
def sql_supplier_variety_not_in(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supplier variety per (brand, size) excluding bad-standing
    suppliers via NOT IN — TPC-H Q16's shape on the available
    columns. Catalyst rewrites the NOT IN into a null-aware
    left-anti join (LeftAnti with the null-check condition); the
    exclusion list is a tiny broadcast, the p_size IN-list prunes
    the part side before its join, and the distinct count is the
    only fact-side shuffle. NOT EXISTS would be a plain anti join —
    registering BOTH shapes documents the semantic difference for
    users porting SQL."""
    _register(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(
        """
        SELECT p.p_brand, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_size IN (1, 5, 9, 13)
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                  WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
        """
    )


# --------------------------------------------------------------------------
# Ranking/navigation window-function suite: rank, dense_rank,
# percent_rank, cume_dist, ntile, nth_value, lag — the full ANSI
# ranking surface in one partitioned pass, with a unique tie-break so
# every function is deterministic across engines.
# --------------------------------------------------------------------------
@query(
    "sql_window_functions_suite",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           year(o_orderdate) AS yr,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ROUND(percent_rank() OVER w, 6) AS prnk,
           ROUND(cume_dist() OVER w, 6) AS cdist,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           lag(o_totalprice) OVER w AS prev_price
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority, year(o_orderdate)
                 ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def sql_window_functions_suite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Every ANSI ranking/navigation function over one shared window
    — the surface a SQL user expects to just work.

    Scale note: the window partitions on (priority, year) — a
    composite key whose group count grows with the data's time span.
    This query is the SURFACE contract; for a top-k or quantile
    ANSWER at 100 TB the repo's window-free forms (TakeOrdered,
    broadcast percentile cuts) remain the right plan, and the
    per-group rank here is the shape used when per-entity ranks are
    genuinely the output. The unique (price, orderkey) tie-break
    makes ntile/nth_value/cume_dist bit-identical across engines."""
    _register(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               o_orderpriority,
               year(o_orderdate) AS yr,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               ROUND(percent_rank() OVER w, 6) AS prnk,
               ROUND(cume_dist() OVER w, 6) AS cdist,
               ntile(4) OVER w AS quartile,
               nth_value(o_totalprice, 2) OVER w AS second_price,
               lag(o_totalprice) OVER w AS prev_price
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority, year(o_orderdate)
                     ORDER BY o_totalprice DESC, o_orderkey)
        ORDER BY o_orderkey
        """
    )
