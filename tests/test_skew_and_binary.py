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


def test_ewma_chunked_matches_plain_on_fixture(spark, sf_dir):
    """The chunked (skew-guarded) EWMA must equal the plain per-user
    fold at the rounded-output contract on the fixture."""
    from se_data_pipeline_spark.queries.events import (
        events_ewma,
        events_ewma_chunked,
    )

    plain = {
        (r["user_id"], r["event_id"]): (r["value"], r["ewma"])
        for r in events_ewma(spark, sf_dir).collect()
    }
    chunked = {
        (r["user_id"], r["event_id"]): (r["value"], r["ewma"])
        for r in events_ewma_chunked(spark, sf_dir).collect()
    }
    assert plain == chunked


def test_ewma_chunked_mega_user_skew(spark, tmp_path):
    """One user owning 90% of all events: the chunked form must still
    agree with the sequential fold, while bounding any single task to
    one user-DAY of events (the whole point of the guard)."""
    import numpy as np
    import pandas as pd

    from se_data_pipeline_spark.queries.events import (
        events_ewma,
        events_ewma_chunked,
    )

    rng = np.random.RandomState(42)
    base = pd.Timestamp("2025-01-01")
    rows = []
    eid = 0
    for d in range(10):  # mega-user 1: 900 events/day x 10 days
        for i in range(900):
            rows.append(
                (eid, base + pd.Timedelta(days=d, seconds=i), 1, "view",
                 float(rng.rand()), "{}")
            )
            eid += 1
    for u in range(2, 12):  # 10 small users: 10 events/day x 10 days
        for d in range(10):
            for i in range(10):
                rows.append(
                    (eid, base + pd.Timedelta(days=d, seconds=7 * i), u,
                     "view", float(rng.rand()), "{}")
                )
                eid += 1
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    assert (pdf["user_id"] == 1).mean() == 0.9
    sdf = spark.createDataFrame(
        pdf,
        schema=(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        ),
    )
    sdir = str(tmp_path / "sf_skew")
    sdf.coalesce(1).write.parquet(sdir + "/events.parquet")

    plain = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in events_ewma(spark, sdir).collect()
    }
    chunked = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in events_ewma_chunked(spark, sdir).collect()
    }
    assert plain == chunked


def test_salted_rollup_on_mega_user_skew(spark, tmp_path):
    """One user owns 90% of events; the salted two-stage rollup must
    equal the direct groupBy exactly, and its stage-1 output must
    actually split the mega-user across multiple salt groups."""
    import os

    from pyspark.sql import functions as F

    from se_data_pipeline_spark.queries import all_queries

    n = 50_000
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        (
            F.lit("2024-05-01 00:00:00").cast("timestamp_ntz")
            + F.make_interval(mins=(F.col("id") % 1000).cast("int"))
        ).alias("ts"),
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 50)
        .alias("user_id"),
        F.lit("view").alias("event_type"),
        (F.col("id") % 13).cast("double").alias("value"),
        F.lit("{}").alias("props"),
    )
    d = str(tmp_path / "sf_skew")
    ev.write.parquet(os.path.join(d, "events.parquet"))

    got = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["max_value"])
        for r in all_queries()["events_salted_heavy_user_rollup"](
            spark, d
        ).collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["max_value"])
        for r in spark.read.parquet(os.path.join(d, "events.parquet"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert got == want
    assert got[7][0] == 45_000  # the mega-user really is 90%

    n_salt_groups = (
        spark.read.parquet(os.path.join(d, "events.parquet"))
        .filter(F.col("user_id") == 7)
        .select(F.pmod(F.xxhash64("event_id"), F.lit(16)).alias("salt"))
        .distinct()
        .count()
    )
    assert n_salt_groups == 16


def test_passage_dedup_with_universal_boilerplate(spark, tmp_path):
    """Every document shares one boilerplate sentence (the hottest
    possible window keys — present in 100% of docs). The inverted
    index must stay correct: every doc reports the boilerplate span,
    and a doc whose ENTIRE text is the boilerplate shows full
    coverage."""
    import os

    from se_data_pipeline_spark.queries import all_queries

    boiler = "all rights reserved contact us for more info"  # 8 tokens
    rows = [(i, f"unique{i}a unique{i}b {boiler} tail{i}") for i in range(1, 40)]
    rows.append((40, boiler))  # pure-boilerplate doc
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    d = str(tmp_path / "sf_boiler")
    docs.write.parquet(os.path.join(d, "documents.parquet"))

    out = {
        r["doc_id"]: r
        for r in all_queries()["doc_duplicate_passages"](spark, d).collect()
    }
    assert len(out) == 40
    # 8-token boilerplate -> 4 overlapping k=5 windows, one span of 8
    for i in range(1, 40):
        assert out[i]["n_dup_windows"] == 4, i
        assert out[i]["n_dup_spans"] == 1
        assert out[i]["dup_tokens"] == 8
    assert out[40]["dup_tokens"] == 8
    assert out[40]["dup_coverage"] == 1.0


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join demonstration (the runtime half of the skew
    story — salted_join above is the explicit half): a sort-merge
    join whose hot key dwarfs every other partition must come out of
    AQE with the skewed side SPLIT (`skew=true` on the SMJ), i.e.
    OptimizeSkewedJoin actually fires under this session's confs.
    Thresholds are lowered only inside this test (runtime confs,
    restored in finally) because the defaults are sized for real
    clusters, not a 10k-row fixture."""
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

        hot = spark.range(200_000).select(
            F.lit("hot").alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("v"),
        )
        cold = spark.range(2_000).select(
            F.concat(F.lit("c"), (F.col("id") % 64).cast("string")).alias("k"),
            F.col("id").cast("string").alias("v"),
        )
        fact = hot.unionByName(cold)
        dim = spark.createDataFrame(
            [Row(k="hot", tag="H")]
            + [Row(k=f"c{i}", tag=f"T{i}") for i in range(64)]
        )
        joined = fact.join(dim, "k")
        # execute THIS plan (a count() would build its own) so AQE
        # finalizes it with runtime partition sizes
        assert len(joined.collect()) == 202_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
