"""Skew-salting correctness + the S6 binaryFile→VAD→SNR path over
real files on disk."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from se_data_pipeline_spark.functions.joins import salted_count, salted_join
from se_data_pipeline_spark.operators.audio import (
    decode_wav,
    encode_wav,
    snr_from_wav,
    vad_split_segments,
)
from se_data_pipeline_spark.sources.files import read_binary_files


def _skewed_df(spark):
    # one key holds 90% of rows
    hot = spark.range(9000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    cold = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_count_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["k"]: r["n"] for r in salted_count(df, "k").collect()}
    assert salted == plain


def test_salted_join_matches_plain(spark):
    fact = _skewed_df(spark)
    dim = spark.createDataFrame(
        [Row(k="hot", tag="H")] + [Row(k=f"c{i}", tag=f"T{i}") for i in range(50)]
    )
    plain = sorted(tuple(r) for r in fact.join(dim, "k").collect())
    salted = sorted(tuple(r) for r in salted_join(fact, dim, "k").collect())
    assert salted == plain


def test_binary_file_source_to_vad_pipeline(spark, tmp_path):
    """S6 end-to-end: WAV files on disk → binaryFile scan → segment
    split → SNR, with ids recovered from filenames (the reference's
    path-keyed flow, audio_vad.py:29)."""
    sr = 16_000
    # gamma-amplitude burst: the speech model WADA is calibrated for
    # (a pure tone would floor the WADA estimate at -20 by design)
    rng = np.random.default_rng(11)
    voiced = rng.gamma(0.4, 1.0, sr) * rng.choice([-1.0, 1.0], sr)
    voiced = (0.5 * voiced / np.abs(voiced).max()).astype(np.float32)
    burst = np.concatenate([voiced, np.zeros(sr, dtype=np.float32)])
    for vid in ("vidA", "vidB"):
        (tmp_path / f"{vid}.wav").write_bytes(encode_wav(burst, sr))

    scanned = read_binary_files(spark, str(tmp_path))
    assert scanned.count() == 2
    recs = scanned.select(
        F.lit("ch1").alias("channel_id"),
        F.regexp_extract(F.col("path"), r"([^/]+)\.wav$", 1).alias("video_id"),
        F.col("content").alias("audio"),
    )
    segs = vad_split_segments(recs).withColumn("snr", snr_from_wav("audio"))
    rows = segs.collect()
    assert {r["video_id"] for r in rows} == {"vidA", "vidB"}
    for r in rows:
        x, got_sr = decode_wav(bytes(r["audio"]))
        assert got_sr == sr and len(x) > 0
        assert r["snr"] > 20  # clean tone burst
