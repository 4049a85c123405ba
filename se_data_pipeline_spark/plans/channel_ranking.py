"""E3.2 — the channel score & rank pipeline, the reference's fully
relational "minimum slice" (SURVEY §3 E3, §7.2 M1):

channels CSV shards → dedup → n_subs filter → per-channel probe
stats from nested arrays (HOFs) → global-max normalization → score →
inner join → projection/reorder → sort desc → CSV.

Reference: yt_channel_list_result_merge.ipynb cells 1-3 +
yt_channel_list_quality_merge.ipynb cells 2-7. Two reference bugs are
fixed by construction (SURVEY §7.4): the normalization max is global
(not per-shard), and the speech check uses the weighted label score
(D4) everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from se_data_pipeline_spark.functions.arrays import (
    array_count_above,
    speech_prob,
)

MIN_SUBS = 10_000  # P3 (yt_channel_list_result_merge.ipynb:L32)
SNR_THRESHOLD = 20.0  # probe stat (quality_merge cell 4)
SPEECH_PROB_THRESHOLD = 0.9


def quality_stats(quality: DataFrame) -> DataFrame:
    """Per-channel probe statistics from the nested arrays (A6/F12):
    n_total = |segments|, n_snr_ok = #(snr > 20), n_ac_ok =
    #(speech_prob(preds) > 0.9). All row-local HOF expressions — the
    stats stage never shuffles."""
    speech_probs = F.transform(F.col("acss"), lambda preds: speech_prob(preds))
    return quality.select(
        "url",
        F.size("snrss").alias("n_total"),
        array_count_above(F.col("snrss"), SNR_THRESHOLD).alias("n_snr_ok"),
        F.size(
            F.filter(speech_probs, lambda p: p > F.lit(SPEECH_PROB_THRESHOLD))
        ).alias("n_ac_ok"),
    )


def scored_stats(stats: DataFrame) -> DataFrame:
    """A3/A8: score = n_snr_ok/max(n_snr_ok) + n_ac_ok/max(n_ac_ok).
    The global max is a 1-row aggregate broadcast back via crossJoin —
    not an unpartitioned window (which would funnel every row through
    one task at 100 TB), and computed over ALL shards (fixes reference
    bug §7.4(5))."""
    mx = stats.agg(
        F.max("n_snr_ok").alias("max_snr_ok"),
        F.max("n_ac_ok").alias("max_ac_ok"),
    )
    return stats.crossJoin(F.broadcast(mx)).withColumn(
        "score",
        F.when(F.col("max_snr_ok") > 0, F.col("n_snr_ok") / F.col("max_snr_ok"))
        .otherwise(0.0)
        + F.when(F.col("max_ac_ok") > 0, F.col("n_ac_ok") / F.col("max_ac_ok"))
        .otherwise(0.0),
    )


FINAL_COLUMNS = [
    "title",
    "id",
    "n_videos",
    "n_views",
    "n_subs",
    "n_total",
    "n_snr_ok",
    "n_ac_ok",
    "score",
    "url",  # reference moves url last (P1, quality_merge cell 5)
]


def rank_channels(channels: DataFrame, quality: DataFrame) -> DataFrame:
    """The full E3.2 plan. One wide ranking frame, sorted desc by
    score with a deterministic tie-break. Catalyst broadcasts the
    tiny stats side of the join (J1); the dedup is the only shuffle
    of the channel table."""
    base = (
        channels.dropDuplicates()  # A1 (exact duplicate rows)
        .filter(F.col("n_subs") > MIN_SUBS)  # P3
    )
    stats = scored_stats(quality_stats(quality))
    return (
        base.join(stats, "url", "inner")  # J1
        .select(*FINAL_COLUMNS)  # P1/P2
        .orderBy(F.desc("score"), F.asc("id"))  # O1 + tie-break
    )
