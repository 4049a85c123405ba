"""Pluggable model-rerank stage (operators/rerank.py): the executor-
singleton scoring interface that completes the retrieval funnel
(index -> candidates -> exact rerank -> model rerank)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from se_data_pipeline_spark.operators.rerank import (
    FakeCrossEncoder,
    rerank_candidates,
)


def test_fake_cross_encoder_is_deterministic_and_zero_norm_safe():
    be = FakeCrossEncoder()
    q = np.array([1.0, 0.0, 0.0, 0.0])
    vecs = np.array(
        [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 0.0, 0.0]]
    )
    ids = np.array([1, 2, 3])
    s1 = be.score_batch(q, vecs, ids)
    s2 = be.score_batch(q, vecs, ids)
    assert np.array_equal(s1, s2)
    assert s1[1] == 0.0, "zero-norm vector must score 0, not divide by 0"
    # the id modulation is in [0.9, 1.0): score <= cosine, > 0.9*cosine
    assert 0.9 * 1.0 <= s1[0] <= 1.0


def test_rerank_candidates_appends_model_score_and_reorders(spark):
    """The model stage must (a) score every candidate through the
    backend, (b) drop the vector columns, (c) produce an ordering
    DIFFERENT from plain cosine when the model disagrees — proving
    the stage is live, not a pass-through of the exact rerank."""
    rows = [
        # ids chosen so the hash modulation flips a near-tie:
        # cos(v1)=cos(v2)=1.0 but mod(id) differs
        (7, [2.0, 0.0], [1.0, 0.0]),
        (11, [3.0, 0.0], [1.0, 0.0]),
        (13, [1.0, 1.0], [1.0, 0.0]),
    ]
    cand = spark.createDataFrame(
        rows, "vec_id bigint, v array<double>, q array<double>"
    )
    out = rerank_candidates(cand)
    assert set(out.columns) == {"vec_id", "model_score"}
    got = {r["vec_id"]: r["model_score"] for r in out.collect()}
    assert len(got) == 3

    def expected(i, cos):
        return cos * (0.9 + 0.1 * ((i * 2654435761) % 97) / 97.0)

    assert abs(got[7] - expected(7, 1.0)) < 1e-12
    assert abs(got[11] - expected(11, 1.0)) < 1e-12
    assert abs(got[13] - expected(13, np.sqrt(0.5))) < 1e-12
    # ids 7 and 11 have IDENTICAL cosine; the model must break the tie
    assert got[7] != got[11]


def test_rerank_multi_query_batch_scores_each_row_against_its_own_query(
    spark,
):
    """A candidate frame carrying SEVERAL queries (e.g. a batched
    serving path) must score each row against its own query vector —
    never against whichever query happens to lead the Arrow batch.
    Regression: the first implementation took iloc[0]'s query for the
    whole batch."""
    rows = [
        # query A = x-axis, query B = y-axis; same candidate vector
        (7, [1.0, 0.0], [1.0, 0.0]),   # cos = 1 under A
        (7, [1.0, 0.0], [0.0, 1.0]),   # cos = 0 under B
        (11, [0.0, 2.0], [1.0, 0.0]),  # cos = 0 under A
        (11, [0.0, 2.0], [0.0, 1.0]),  # cos = 1 under B
    ]
    cand = spark.createDataFrame(
        rows, "vec_id bigint, v array<double>, q array<double>"
    ).coalesce(1)  # force one Arrow batch with both queries in it
    out = rerank_candidates(cand).collect()
    assert len(out) == 4

    def mod(i):
        return 0.9 + 0.1 * ((i * 2654435761) % 97) / 97.0

    got = sorted((r["vec_id"], round(r["model_score"], 12)) for r in out)
    want = sorted(
        [(7, round(mod(7), 12)), (7, 0.0), (11, 0.0), (11, round(mod(11), 12))]
    )
    assert got == want


def test_rerank_backend_constructed_once_per_worker(spark, tmp_path):
    """backend_factory must be constructed once per worker process,
    not per Arrow batch or per row (the classify.py singleton
    contract — model load cost is paid once). Python workers are
    separate processes, so inits are counted via marker files on the
    shared filesystem."""
    import os
    import uuid

    marker_dir = str(tmp_path / "inits")
    os.makedirs(marker_dir)

    class FileMarkBackend(FakeCrossEncoder):
        def __init__(self):
            with open(os.path.join(marker_dir, uuid.uuid4().hex), "w"):
                pass

    cand = (
        spark.range(10)
        .coalesce(1)
        .select(
            F.col("id").alias("vec_id"),
            F.array(F.lit(1.0), F.lit(2.0)).alias("v"),
            F.array(F.lit(1.0), F.lit(0.0)).alias("q"),
        )
    )
    rerank_candidates(cand, backend_factory=FileMarkBackend).collect()
    n1 = len(os.listdir(marker_dir))
    assert n1 == 1, f"one task must construct the backend once, got {n1}"
    # a second JOB reuses the cached instance when the python worker
    # is reused (spark.python.worker.reuse default); a fresh worker
    # may legitimately re-init once — but never per-batch/per-row
    rerank_candidates(cand, backend_factory=FileMarkBackend).collect()
    n2 = len(os.listdir(marker_dir))
    assert n2 <= 2, f"10 rows x 2 jobs must not re-init per batch: {n2}"


def test_real_backend_is_import_guarded():
    import pytest

    from se_data_pipeline_spark.operators.rerank import (
        SentenceCrossEncoder,
    )

    with pytest.raises(NotImplementedError, match="sentence-transformers"):
        SentenceCrossEncoder()
