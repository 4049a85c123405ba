"""Fused live-pivot (_pivot_live_positions, r13): the tombstone kill
rule rides INSIDE the pivot aggregate instead of a separate
aggregate + broadcast join before it. These tests pin the fusion's
load-bearing assumptions and the edge cases the kill-join handled
implicitly:

- a term present ONLY in a doc's pre-revision text must not
  resurface (its newest row pre-dates the doc's newest tombstone);
- a deleted doc folds to an all-NULL pivot row that every consumer
  filters, exactly as its absence did under the kill join;
- max_by skips rows whose ordering expression is NULL (the mechanism
  that keeps tombstone markers and other terms' rows out of each
  term's slot) — pinned directly so a Spark behavior change fails
  loudly here, not as a wrong serve result;
- the revised-store serve plan pays ONE exchange and contains no
  join (the plan-shape claim in OPTIMIZATION_r13.md).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_term_dropped_by_revision_does_not_resurface(spark, tmp_path):
    """doc 1 v1 contains 'alpha beta'; v2 drops 'beta' entirely. The
    fused pivot must null beta's slot for doc 1 (its only row
    pre-dates the tombstone), so the phrase and AND paths lose the
    doc while a doc that kept both terms survives."""
    from se_data_pipeline_spark.sources.layout import (
        _pivot_live_positions,
        and_ranked_from_postings,
        phrase_from_postings,
        revise_positional_postings,
        write_positional_postings,
    )

    out = str(tmp_path / "store")
    write_positional_postings(
        _docs(
            spark,
            [(1, "alpha beta gap"), (2, "alpha beta keeps")],
        ),
        out,
        n_buckets=32,
    )
    revise_positional_postings(
        spark, _docs(spark, [(1, "alpha only now")]), out
    )

    piv = {
        r["doc_id"]: (r["p0"], r["p1"])
        for r in _pivot_live_positions(
            spark, out, ("alpha", "beta")
        ).collect()
    }
    assert piv[1][0] == [0]  # alpha: replacement row at batch 0
    assert piv[1][1] is None  # beta: old row killed, no resurrection
    assert piv[2] == ([0], [1])

    hits = {
        r["doc_id"]: r["n_hits"]
        for r in phrase_from_postings(
            spark, out, ("alpha", "beta"), limit=None
        ).collect()
    }
    assert hits == {2: 1}
    ranked = and_ranked_from_postings(spark, out, ("alpha", "beta"))
    assert [r["doc_id"] for r in ranked.collect()] == [2]


def test_deleted_doc_all_null_row_filtered_everywhere(
    spark, tmp_path
):
    """A deleted doc's tombstone has no replacement rows: the fused
    pivot yields an all-NULL row, and phrase / proximity / AND all
    drop it — identical to the kill-join's removing the doc."""
    from se_data_pipeline_spark.sources.layout import (
        and_ranked_from_postings,
        delete_positional_docs,
        phrase_from_postings,
        proximity_from_postings,
        write_positional_postings,
    )

    out = str(tmp_path / "store")
    write_positional_postings(
        _docs(
            spark,
            [(1, "alpha beta"), (2, "alpha beta")],
        ),
        out,
        n_buckets=32,
    )
    delete_positional_docs(
        spark, spark.createDataFrame([(1,)], "doc_id bigint"), out
    )
    assert [
        r["doc_id"]
        for r in phrase_from_postings(
            spark, out, ("alpha", "beta")
        ).collect()
    ] == [2]
    assert [
        r["doc_id"]
        for r in proximity_from_postings(
            spark, out, "alpha", "beta", 2
        ).collect()
    ] == [2]
    assert [
        r["doc_id"]
        for r in and_ranked_from_postings(
            spark, out, ("alpha", "beta")
        ).collect()
    ] == [2]


def test_max_by_skips_null_ordering_rows(spark):
    """The fusion depends on max_by ignoring rows whose ordering
    expression is NULL (tombstone markers, other terms' rows). Pin
    that behavior directly."""
    df = spark.createDataFrame(
        [(1, "a", [1], 0, False), (1, None, None, 9, True)],
        "doc_id int, tok string, pos array<int>, batch_id int,"
        " tomb boolean",
    )
    got = (
        df.groupBy("doc_id")
        .agg(
            F.max_by(
                F.struct(
                    F.col("batch_id").alias("b"),
                    F.col("pos").alias("v"),
                ),
                F.when(
                    (~F.col("tomb")) & (F.col("tok") == "a"),
                    F.col("batch_id"),
                ),
            ).alias("s")
        )
        .select("s.b", "s.v")
        .collect()[0]
    )
    # the tombstone marker (batch 9, NULL ordering) must NOT win
    assert (got["b"], got["v"]) == (0, [1])


def test_revised_serve_plan_single_exchange_no_join(spark, tmp_path):
    """Plan-shape claim: the revised-store pivot pays exactly one
    Exchange and contains no join operator (the pre-fusion plan had
    a second aggregate + Exchange + BroadcastExchange + a
    BroadcastHashJoin for the tombstone map)."""
    from se_data_pipeline_spark.sources.layout import (
        phrase_from_postings,
        revise_positional_postings,
        write_positional_postings,
    )

    out = str(tmp_path / "store")
    write_positional_postings(
        _docs(spark, [(1, "alpha beta"), (2, "alpha beta")]),
        out,
        n_buckets=32,
    )
    revise_positional_postings(
        spark, _docs(spark, [(1, "alpha beta moved")]), out
    )
    df = phrase_from_postings(spark, out, ("alpha", "beta"))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Join" not in plan
    assert "BroadcastExchange" not in plan
    # the operator tree lists each node as "+- <op> (n)" / ":- ..."
    assert plan.count("- Exchange (") == 1
