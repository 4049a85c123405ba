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


def test_phash_pairs_finds_perturbed_copy_not_unrelated(spark, tmp_path):
    """aHash near-dup: a payload and a lightly-perturbed copy (one
    word changed -> a few fingerprint bits flip) must pair within the
    Hamming threshold; an unrelated payload must not. Also pins the
    kernel's exact-integer bit rule against a hand-computed
    fingerprint and NULL-safety."""
    import os

    import numpy as np
    import pandas as pd

    from se_data_pipeline_spark.queries import all_queries
    from se_data_pipeline_spark.queries.multimodal import (
        _PHASH_MAX_HAMMING,
        _ahash_batches,
    )

    base = ("lorem ipsum dolor sit amet consectetur adipiscing elit "
            "sed do eiusmod tempor incididunt ut labore et dolore") * 3
    near = base[:-1] + "~"  # last-byte delta: a few bits flip at most
    far = "the quick brown fox jumps over the lazy dog again and " * 8
    plantable = ("pack my box with five dozen liquor jugs while the "
                 "band played on through the night hours") * 3
    rows = [(1, base), (2, near), (3, far), (20, plantable)]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string"
    ).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("t")
    ).withColumn("n_chars", F.length("text").cast("long"))
    d = str(tmp_path / "sf")
    docs.write.parquet(os.path.join(d, "documents.parquet"))

    out = all_queries()["multimodal_phash_pairs"](spark, d).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out}
    assert (1, 2) in got and got[(1, 2)] <= _PHASH_MAX_HAMMING
    # doc 20 (doc_id % 20 == 0) gets a planted perturbed twin
    assert (20, 10_000_020) in got and got[(20, 10_000_020)] <= 2
    assert not any(
        3 in p for p in got
    ), "unrelated payload must not pair"
    assert len(got) == 2, f"no spurious pairs expected, got {got}"

    # kernel exactness: hand-compute the bit rule for the base text
    def ref_bits(s: str) -> str:
        b = np.frombuffer(s.encode(), dtype=np.uint8).astype(np.int64)
        n = len(b)
        bits = []
        for i in range(64):
            lo, hi = (i * n) // 64, ((i + 1) * n) // 64
            bits.append(
                "1" if int(b[lo:hi].sum()) * n > int(b.sum()) * (hi - lo)
                else "0"
            )
        return "".join(bits)

    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "payload": [base.encode(), None]}
    )
    k = list(_ahash_batches(iter([pdf])))[0]
    assert k.loc[0, "ahash"] == ref_bits(base)
    assert k.loc[1, "ahash"] is None


def test_pil_codec_is_marked_stub():
    import pytest as _pytest

    from se_data_pipeline_spark.operators.image import PilCodec

    with _pytest.raises(NotImplementedError):
        PilCodec().decode(b"", 1, 1)
