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
    schema = (
        "doc_id long, n_frames int, "
        "f_q1 double, f_q2 double, f_q3 double, f_q4 double"
    )
    rows = df.mapInPandas(_frame_feature_batches, schema).collect()
    assert rows[0]["n_frames"] == 8
    # constant bytes → every frame mean = ord('x')
    feature = [rows[0][f"f_q{i}"] for i in range(1, 5)]
    assert all(v == pytest.approx(ord("x")) for v in feature)
    again = df.mapInPandas(_frame_feature_batches, schema).collect()
    assert rows == again


# ---------------------------------------------------------------- resize


def test_resize_nearest_exact_values():
    import numpy as np

    from se_data_pipeline_spark.operators.image import resize_nearest

    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = resize_nearest(img, 2, 2)
    # half-pixel centers: rows/cols [0.5*2, 1.5*2] -> indices 1, 3
    assert out.tolist() == [[5, 7], [13, 15]]
    # identity resize returns the image unchanged
    assert (resize_nearest(img, 4, 4) == img).all()


def test_resize_images_over_spark(spark):
    import numpy as np
    from pyspark.sql import Row

    from se_data_pipeline_spark.operators.image import (
        RawCodec,
        resize_images,
        resize_nearest,
    )

    rng = np.random.RandomState(7)
    imgs = {i: rng.randint(0, 256, (8, 6), dtype=np.uint8) for i in range(5)}
    df = spark.createDataFrame(
        [
            Row(
                doc_id=i,
                width=6,
                height=8,
                payload=bytearray(img.tobytes()),
            )
            for i, img in imgs.items()
        ]
    )
    out = {r["doc_id"]: r for r in resize_images(df, 3, 4).collect()}
    assert set(out) == set(imgs)
    codec = RawCodec()
    for i, img in imgs.items():
        want = resize_nearest(img, 3, 4)
        got = codec.decode(bytes(out[i]["payload"]), 3, 4)
        assert (got == want).all()
        assert out[i]["mean_px"] == round(float(want.mean()), 6)


def test_pil_codec_is_marked_stub():
    import pytest as _pytest

    from se_data_pipeline_spark.operators.image import PilCodec

    with _pytest.raises(NotImplementedError):
        PilCodec().decode(b"", 1, 1)
