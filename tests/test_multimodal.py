"""Unit tests for the multimodal binary plumbing: Arrow-batched
mapInPandas kernels over opaque payload columns with typed output
schemas (queries/multimodal.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from se_data_pipeline_spark.queries.multimodal import (
    _FRAME_BYTES,
    _PAYLOAD_STATS_SCHEMA,
    _frame_feature_batches,
    _payload_stats_batches,
)


def test_payload_stats_exact(spark):
    text = "abcd"  # bytes 97,98,99,100
    df = spark.createDataFrame([Row(doc_id=1, text=text)]).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    row = df.mapInPandas(_payload_stats_batches, _PAYLOAD_STATS_SCHEMA).collect()[0]
    bs = text.encode()
    n, s1 = len(bs), sum(bs)
    mean = s1 / n
    var = sum(x * x for x in bs) / n - mean * mean
    assert row["n_bytes"] == n
    assert row["checksum"] == s1 % 1_000_003
    assert row["mean_byte"] == pytest.approx(mean)
    assert row["std_byte"] == pytest.approx(var**0.5, abs=1e-6)


def test_frame_features_shape_and_determinism(spark):
    text = "x" * (_FRAME_BYTES * 8 + 3)  # 8 full frames + remainder
    df = spark.createDataFrame([Row(doc_id=7, text=text)]).select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    schema = "doc_id long, n_frames int, feature array<double>"
    rows = df.mapInPandas(_frame_feature_batches, schema).collect()
    assert rows[0]["n_frames"] == 8
    assert len(rows[0]["feature"]) == 4
    # constant bytes → every frame mean = ord('x')
    assert all(v == pytest.approx(ord("x")) for v in rows[0]["feature"])
    again = df.mapInPandas(_frame_feature_batches, schema).collect()
    assert rows == again
