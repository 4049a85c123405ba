"""Physical-plan contract tests: the scale properties claimed in
README/SURVEY §4 must be visible in the plans Catalyst actually
produces — predicate pushdown into the parquet scan, column pruning,
broadcast joins for dimensions, true top-k (TakeOrderedAndProject),
and shuffle-free joins on co-bucketed tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from se_data_pipeline_spark.queries.relational import (
    pricing_summary,
    top_revenue_orders,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    df = pricing_summary(spark, sf_dir)
    plan = plan_of(df)
    # the shipdate predicate reaches the parquet reader
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:200]
    # only the needed columns are read (11+ lineitem cols exist)
    read_schema = plan.split("ReadSchema", 1)[1][:400]
    assert "l_comment" not in read_schema and "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_top_revenue_orders_broadcasts_dimension_and_takes_topk(spark, sf_dir):
    plan = plan_of(top_revenue_orders(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT 10
    # the mktsegment filter is pushed to the customer scan
    assert "BUILDING" in plan


def test_whole_stage_codegen_covers_aggregate(spark, sf_dir):
    df = pricing_summary(spark, sf_dir)
    df.collect()  # finalize the adaptive plan — codegen stages appear then
    plan = plan_of(df)
    # "*(n)" prefixes mark WholeStageCodegen spans in the simple plan string
    assert "*(" in plan and "HashAggregate" in plan


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Co-bucketed tables join without any Exchange — the 100 TB
    co-location strategy for repeated fact-fact joins (bucket on the
    join key at write time, pay the shuffle once)."""
    n = 10_000
    a = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("va")
    )
    b = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 89).alias("vb")
    )
    a.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("t_a")
    b.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("t_b")
    try:
        # hint forces SMJ (broadcast would win at this toy size); on
        # co-bucketed inputs the SMJ needs no Exchange on either side
        joined = spark.table("t_a").hint("merge").join(spark.table("t_b"), "k")
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing co-located both sides
        assert joined.count() == n
    finally:
        spark.sql("DROP TABLE IF EXISTS t_a")
        spark.sql("DROP TABLE IF EXISTS t_b")


def test_anti_join_uses_broadcast(spark, sf_dir):
    from se_data_pipeline_spark.queries.relational import customers_without_orders

    plan = plan_of(customers_without_orders(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_asof_join_single_exchange(spark):
    """asof_join's plan must contain exactly ONE shuffle (the window
    partitioning) — the linear union+window form, not a quadratic
    range-condition join. A theta-join formulation would show a
    CartesianProduct / BroadcastNestedLoopJoin here."""
    from datetime import datetime as dt

    from pyspark.sql import Row

    from se_data_pipeline_spark.functions.joins import asof_join

    left = spark.createDataFrame(
        [Row(k="a", ts=dt(2024, 1, 1), x=1)]
    )
    right = spark.createDataFrame(
        [Row(k="a", ts=dt(2024, 1, 1), px=1.0)]
    )
    plan = plan_of(asof_join(left, right, on="k"))
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_partitioned_write_prunes_partitions(spark, tmp_path, sf_dir):
    """Hive-style partitionBy(lang) at write time => a lang-filtered
    read lists only that partition's directory (partition pruning) —
    the first-order 100 TB layout decision for per-language corpus
    work."""
    from se_data_pipeline_spark.catalog import load_table

    out = str(tmp_path / "docs_by_lang")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.partitionBy("lang").mode("overwrite").parquet(out)

    df = spark.read.parquet(out).filter(F.col("lang") == "de")
    plan = plan_of(df)
    # partition filter recognized (not a data filter on a read column)
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters", 1)[1][:200]
    got = df.count()
    want = docs.filter(F.col("lang") == "de").count()
    assert got == want


def test_row_local_curation_ops_have_zero_exchanges(spark, sf_dir):
    """Chunking and PII redaction are row-local: their physical plans
    must contain NO Exchange — they pipeline with the scan, which is
    what makes them free at 100 TB (no extra pass, no shuffle)."""
    from se_data_pipeline_spark.queries.curation import (
        doc_chunks,
        doc_pii_redaction,
    )

    for q in (doc_chunks, doc_pii_redaction):
        plan = plan_of(q(spark, sf_dir))
        assert "Exchange" not in plan, q.__name__


def test_strict_cap_shares_the_aggregates_shuffle(spark, sf_dir):
    """The strict _cap_per_key guard (count-over-partition window)
    must ride the downstream groupBy's hash partitioning: the
    executed plan of a strict-capped aggregate carries exactly ONE
    Exchange — the guard costs zero extra shuffles (the claim its
    docstring and SCALE_CHECK rows make, pinned here mechanically)."""
    from se_data_pipeline_spark.queries.arrays import (
        user_weighted_event_score,
    )

    df = user_weighted_event_score(spark, sf_dir)
    df.collect()  # finalize AQE
    plan = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange" in ln
    ]
    assert len(exchanges) == 1, exchanges
    assert "hashpartitioning(user_id" in exchanges[0]


def test_contamination_broadcasts_benchmark_side(spark, sf_dir):
    """The benchmark shingle set must broadcast: the train side of the
    decontamination join then never shuffles before its per-doc
    count."""
    from se_data_pipeline_spark.queries.curation import (
        benchmark_contamination,
    )

    plan = plan_of(benchmark_contamination(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_sql_subqueries_decorrelate_to_joins(spark, sf_dir):
    """EXISTS / IN / NOT EXISTS through the SQL surface must plan as
    semi/anti joins — never per-row subquery execution."""
    from se_data_pipeline_spark.queries.sqlsurface import (
        sql_exists_late_orders,
        sql_in_having_large_orders,
        sql_scalar_anti_prospects,
    )

    assert "LeftSemi" in optimized_of(sql_exists_late_orders(spark, sf_dir))
    assert "LeftSemi" in optimized_of(
        sql_in_having_large_orders(spark, sf_dir)
    )
    opt = optimized_of(sql_scalar_anti_prospects(spark, sf_dir))
    assert "LeftAnti" in opt
    # the scalar AVG subquery is a one-row aggregate, not a join
    assert "scalar-subquery" in opt


def test_correlated_scalar_and_double_exists_decorrelate(spark, sf_dir):
    """Q17/Q21 shapes: the correlated scalar AVG plans as an aggregate
    joined back (computed once per part, not per row); the EXISTS /
    NOT EXISTS pair plans as one LeftSemi and one LeftAnti self-join
    on lineitem — never a nested-loop per-row subquery."""
    from se_data_pipeline_spark.queries.sqlsurface import (
        sql_small_quantity_revenue,
        sql_sole_late_supplier,
    )

    opt = optimized_of(sql_small_quantity_revenue(spark, sf_dir))
    assert "avg(l_quantity)" in opt  # decorrelated per-part aggregate
    assert "Join" in opt

    opt = optimized_of(sql_sole_late_supplier(spark, sf_dir))
    assert "LeftSemi" in opt
    assert "LeftAnti" in opt


def test_sorted_write_produces_skippable_rowgroup_stats(spark, sf_dir, tmp_path):
    """sortWithinPartitions before a write yields parquet files whose
    min/max column stats are tight, so a later range predicate skips
    whole files/row-groups — the storage-layout half of predicate
    pushdown. Verified against the actual parquet footers."""
    import pyarrow.parquet as pq
    import glob as _glob

    from se_data_pipeline_spark.catalog import load_table

    out = str(tmp_path / "li_sorted")
    (
        load_table(spark, sf_dir, "lineitem")
        .repartition(4, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.parquet(out)
    )
    files = _glob.glob(out + "/*.parquet")
    assert len(files) >= 2
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("l_shipdate")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            # stats exist and are ordered — the reader can skip on them
            assert st is not None and st.min <= st.max
    # cross-file ranges must be tighter than the global range on
    # average (hash partition + sort: each file sorted, stats usable)
    spans = []
    glo = None
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("l_shipdate")
        mn = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        mx = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        spans.append((mn, mx))
        glo = (mn, mx) if glo is None else (min(glo[0], mn), max(glo[1], mx))
    # every row group inside a file is internally sorted: read one
    # file and check order
    tbl = pq.read_table(files[0], columns=["l_shipdate"])
    col = tbl.column(0).to_pylist()
    assert col == sorted(col)


def test_passage_dedup_shuffles_hashes_not_strings(spark, sf_dir):
    """doc_duplicate_passages' inverted index must key on xxhash64 —
    window STRINGS must never reach a shuffle (8-byte keys vs ~40-byte
    text at 100 TB is the difference between a tractable and an
    untractable exchange)."""
    from se_data_pipeline_spark.queries import all_queries

    df = all_queries()["doc_duplicate_passages"](spark, sf_dir)
    plan = plan_of(df)
    assert "xxhash64" in plan
    for frag in plan.split("Exchange")[1:]:
        key = frag[:120]
        assert "win" not in key, f"window string in shuffle key: {key}"


def test_backlog_has_no_unpartitioned_window(spark, sf_dir):
    """orders_daily_backlog claims a two-level prefix sum with no
    global window — hold it to that."""
    import tools.plan_audit as pa

    from se_data_pipeline_spark.queries import all_queries

    df = all_queries()["orders_daily_backlog"](spark, sf_dir)
    plan = plan_of(df)
    assert pa.count_unpartitioned_windows(plan) == 0
    assert "Window" in plan  # the per-year running sum is windowed


def test_salted_rollup_two_aggregates(spark, sf_dir):
    """The salted rollup must actually be two-stage: two distinct
    HashAggregate key sets ((user_id, salt) then (user_id))."""
    from se_data_pipeline_spark.queries import all_queries

    df = all_queries()["events_salted_heavy_user_rollup"](spark, sf_dir)
    plan = plan_of(df)
    assert "salt" in plan and plan.count("HashAggregate") >= 4


def test_rfm_broadcasts_quantile_boundaries(spark, sf_dir):
    """RFM's boundary frame is a 1-row broadcast (BroadcastNestedLoop
    crossJoin), never a sort-based ntile window."""
    import tools.plan_audit as pa

    from se_data_pipeline_spark.queries import all_queries

    df = all_queries()["customer_rfm_segments"](spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert pa.count_unpartitioned_windows(plan) == 0


def test_bloom_prune_filters_before_join_shuffle(spark, sf_dir):
    """The bloom membership test must evaluate in the probe scan
    stage (against the 1-row broadcast bitset), upstream of the
    exact join — that ordering is the whole point of the pruning."""
    from se_data_pipeline_spark.queries.relational import (
        bloom_pruned_urgent_revenue,
    )

    plan = plan_of(bloom_pruned_urgent_revenue(spark, sf_dir))
    assert "getbit" in plan  # membership test is pure Catalyst
    # bitset arrives via broadcast, not as a giant plan literal
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    bloom_at = plan.index("getbit")
    join_at = plan.index("BroadcastHashJoin")
    assert bloom_at > join_at  # deeper in the tree = runs earlier


def test_stable_ids_has_no_unpartitioned_window(spark, sf_dir):
    from se_data_pipeline_spark.queries.curation import doc_stable_ids

    df = doc_stable_ids(spark, sf_dir)
    plan = plan_of(df)
    assert "row_number" in plan
    # every Window node carries a partition spec (3 bracket groups:
    # exprs, partition, order) — nothing funnels to one task
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert line.count("[") >= 3, line
    rows = df.orderBy("stable_id").collect()
    assert [r.stable_id for r in rows] == list(range(len(rows)))


def test_cdc_merge_single_join_shuffle(spark, sf_dir):
    from se_data_pipeline_spark.queries.relational import orders_cdc_merge

    df = orders_cdc_merge(spark, sf_dir)
    plan = plan_of(df)
    # MERGE = one anti join + union; the union adds no exchange
    assert "LeftAnti" in plan
    assert "Union" in plan


def test_pmi_bigram_shuffle_has_no_python_stage(spark, sf_dir):
    """doc_pmi_collocations builds bigrams row-locally in codegen
    (hash-keyed count shuffle): no Arrow/Python stage anywhere, and
    the top-50 runs as true top-k."""
    from se_data_pipeline_spark.queries.text import doc_pmi_collocations

    plan = plan_of(doc_pmi_collocations(spark, sf_dir))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_equi_depth_deciles_has_no_window_or_sort(spark, sf_dir):
    """orders_equi_depth_deciles must never plan the ntile global
    sort-window it replaces: bucket assignment is a broadcast of the
    1-row percentile frame + a row-local array filter."""
    from se_data_pipeline_spark.queries.relational import (
        orders_equi_depth_deciles,
    )

    plan = plan_of(orders_equi_depth_deciles(spark, sf_dir))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row cuts frame


def test_margin_report_broadcasts_centroids_no_vector_pairs(spark, sf_dir):
    """embedding_margin_report compares each vector against the
    |labels|-row centroid table only — the centroid side must arrive
    broadcast and no vector-vector join may appear (a SortMergeJoin
    would mean a pair blowup)."""
    from se_data_pipeline_spark.queries.vectors import (
        embedding_margin_report,
    )

    plan = plan_of(embedding_margin_report(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_incremental_shard_filters_before_join(spark, sf_dir):
    """dedup_incremental_new_shard prunes both sides to shard /
    complement BEFORE the shingle-hash join shuffle (the filters sit
    under the Exchange, not above the join)."""
    from se_data_pipeline_spark.queries.text import (
        dedup_incremental_new_shard,
    )

    plan = optimized_of(dedup_incremental_new_shard(spark, sf_dir))
    join_pos = plan.find("Join")
    assert join_pos != -1
    below = plan[join_pos:]
    assert "src18" in below  # shard predicate pushed below the join


def test_cusum_is_single_python_pass(spark, sf_dir):
    """events_cusum_changepoints folds in exactly ONE Arrow stage
    (the mapInPandas pass) — stats attach via broadcast, not a second
    kernel."""
    from se_data_pipeline_spark.queries.events import (
        events_cusum_changepoints,
    )

    plan = plan_of(events_cusum_changepoints(spark, sf_dir))
    assert plan.count("ArrowEvalPython") == 0
    assert plan.count("MapInPandas") == 1


def test_mann_kendall_pairwise_is_broadcast_day_grain(spark, sf_dir):
    """daily_revenue_mann_kendall's pairwise sign frame must be a
    broadcast non-equi join over the day-grain rollup (never a
    CartesianProduct, never a sort-merge pair blowup), and no window
    may appear anywhere."""
    from se_data_pipeline_spark.queries.relational import (
        daily_revenue_mann_kendall,
    )

    plan = plan_of(daily_revenue_mann_kendall(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_gini_jackknife_scans_orders_once(spark, sf_dir):
    """revenue_gini_jackknife checkpoints the day-grain frames: the
    orders rollup runs once, every jackknife branch reads the
    materialized ~2.4k rows (scan count in the final plan is 0 —
    all leaves are checkpointed RDD scans)."""
    from se_data_pipeline_spark.queries.relational import (
        revenue_gini_jackknife,
    )

    plan = plan_of(revenue_gini_jackknife(spark, sf_dir))
    assert plan.count("FileScan parquet") == 0  # only checkpoint scans
    assert "Window" not in plan
    df = revenue_gini_jackknife(spark, sf_dir)
    row = df.collect()[0]
    assert 0.0 <= row.gini <= 1.0
    assert row.ci_lo <= row.gini <= row.ci_hi


def test_shapley_single_data_shuffle(spark, sf_dir):
    """attribution_shapley's only data-sized work is the per-user
    mask rollup; the lattice algebra must ride broadcast joins. The
    four Shapley values must sum to v(full) - v(empty) (efficiency
    axiom) up to rounding."""
    from se_data_pipeline_spark.queries.events import attribution_shapley

    df = attribution_shapley(spark, sf_dir)
    plan = plan_of(df)
    assert "SortMergeJoin" not in plan
    rows = {r.channel: r.shapley_value for r in df.collect()}
    assert set(rows) == {"click", "error", "signup", "view"}


def test_holt_forecast_is_calendar_bounded_fold(spark, sf_dir):
    """events_holt_daily_forecast folds AFTER the day-grain rollup:
    exactly one Python stage (applyInPandas over event types), and
    the forecast column equals level + trend."""
    from se_data_pipeline_spark.queries.events import (
        events_holt_daily_forecast,
    )

    df = events_holt_daily_forecast(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("FlatMapGroupsInPandas") == 1
    r = df.filter(F.col("trend") != 0).limit(1).collect()
    if r:
        assert abs(r[0].forecast_next - round(r[0].level + r[0].trend, 6)) < 1e-6


def test_winnowing_single_arrow_stage(spark, sf_dir):
    """winnowing_fingerprint_pairs runs the whole fingerprint pass in
    ONE Arrow kernel — a second Python stage would mean the hash
    transform leaked back into a JVM projection that re-evaluates per
    window."""
    from se_data_pipeline_spark.queries.text import (
        winnowing_fingerprint_pairs,
    )

    plan = plan_of(winnowing_fingerprint_pairs(spark, sf_dir))
    assert plan.count("ArrowEvalPython") == 1
    assert "CartesianProduct" not in plan


def test_adstock_banded_join_no_window(spark, sf_dir):
    """events_adstock_regression's carryover is a banded broadcast
    day-join — no ordered window, no cartesian."""
    from se_data_pipeline_spark.queries.events import (
        events_adstock_regression,
    )

    plan = plan_of(events_adstock_regression(spark, sf_dir))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_nb_classifier_broadcasts_model(spark, sf_dir):
    """part_brand_nb_classifier scores tokens against a broadcast
    model (priors + likelihood table) — a SortMergeJoin on the
    scoring path would shuffle the token stream per candidate
    brand."""
    from se_data_pipeline_spark.queries.relational import (
        part_brand_nb_classifier,
    )

    df = part_brand_nb_classifier(spark, sf_dir)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    rows = df.collect()
    # in-sample NB on informative name tokens must beat the 1/25 prior
    total = sum(r.n_parts for r in rows)
    correct = sum(r.n_correct for r in rows)
    assert correct / total > 1.0 / 25


def test_tail_index_is_constant_work_after_topk(spark, sf_dir):
    """events_value_tail_index reduces to a k-row frame via top-k
    before any math — the final plan reads only the checkpointed
    top-k rows (zero parquet scans)."""
    from se_data_pipeline_spark.queries.events import (
        events_value_tail_index,
    )

    df = events_value_tail_index(spark, sf_dir)
    assert plan_of(df).count("FileScan parquet") == 0
    row = df.collect()[0]
    assert row.k > 0 and row.tail_index_alpha is not None


def test_dsir_scoring_pass_is_map_side_only(spark, sf_dir):
    """doc_dsir_selection's returned plan is ONE fact scan with no
    Exchange: the 1024-bucket estimator was folded into an array
    literal at plan build (bounded eager collect), so the scoring
    pass pipelines with the scan — the property that makes the
    second DSIR pass free at 100 TB."""
    from se_data_pipeline_spark.queries.text import doc_dsir_selection

    df = doc_dsir_selection(spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("FileScan parquet") == 1
    # the only Exchange allowed is the final presentation orderBy
    body = plan.split("Sort")[0]
    assert "Exchange" not in body

    # Semantic pin: weights must actually separate the target domain
    # from the rest — mean per-token log-weight of target-source docs
    # strictly above the non-target mean (the DSIR invariant).
    from se_data_pipeline_spark.catalog import load_table
    from se_data_pipeline_spark.queries.text import _DSIR_TARGET

    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    means = (
        df.join(src, "doc_id")
        .groupBy(F.col("source").isin(*_DSIR_TARGET).alias("is_t"))
        .agg(F.avg("logw_per_tok").alias("m"))
        .collect()
    )
    by = {r.is_t: r.m for r in means}
    assert by[True] > by[False]
