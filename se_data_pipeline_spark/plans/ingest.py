"""E1 — the full ingest pipeline (SURVEY §3 E1, data_pipeline.py:500-
727) as one lazy DataFrame program:

channels → budget tier (P9) → min-videos gate (P4, side-output) →
playlist acquire (S8) → ledger anti-join (J3/T1) → error routing
(T4) → per-channel budget window (W1) → trim plan (P8) → [audio
acquire + VAD + SNR + AC kernels] → selection (P5) → embed URL (P10)
→ nested per-channel metadata document (A9) → batched publish
(W4/K7).

The audio stages are the operators/ kernels; this module wires the
relational skeleton so the whole plan is testable with the fake
acquire backend and no audio at all (segments can be supplied
directly), mirroring how the driver runs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from se_data_pipeline_spark.operators.audio import trim_bounds
from se_data_pipeline_spark.sources.acquire import split_dead_letter

CHANNEL_MIN_VIDEOS = 5  # P4 (data_pipeline.py:500,553)
MIN_SNR = 20.0  # P5 defaults (data_pipeline.py:744)
MIN_SPEECH_PROB = 0.9


def video_budget(n_subs):
    """P9: the reference's subscriber-tier video budget
    (data_pipeline.py:520-531)."""
    return (
        F.when(n_subs < 10_000, 10)
        .when(n_subs < 30_000, 20)
        .when(n_subs < 50_000, 30)
        .when(n_subs < 100_000, 40)
        .when(n_subs < 200_000, 50)
        .otherwise(60)
    )


def eligible_channels(channels: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P4 gate with side-output: (eligible+budget, skipped). The skip
    frame carries a reason column — the reference's
    skipped_channels.txt "id|reason" (K4, data_pipeline.py:545-548)."""
    with_budget = channels.withColumn("budget", video_budget(F.col("n_subs")))
    eligible = with_budget.filter(
        F.col("n_videos").isNotNull() & (F.col("n_videos") >= CHANNEL_MIN_VIDEOS)
    )
    skipped = with_budget.filter(
        F.col("n_videos").isNull() | (F.col("n_videos") < CHANNEL_MIN_VIDEOS)
    ).select("id", F.lit("too_few_videos").alias("reason"))
    return eligible, skipped


def dedup_against_ledger(videos: DataFrame, ledger: DataFrame) -> DataFrame:
    """J3/T1: broadcast left-anti join against the ingest ledger — the
    scale-safe version of `video_id in added_video_ids_set`
    (data_pipeline.py:576). The ledger is always the small side."""
    return videos.join(F.broadcast(ledger), "video_id", "left_anti")


def apply_budget(videos: DataFrame) -> DataFrame:
    """W1: keep the first `budget` videos per channel in playlist
    order (data_pipeline.py:575,593). One shuffle on channel_id."""
    w = W.partitionBy("channel_id").orderBy("position")
    return (
        videos.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("budget"))
        .drop("rn")
    )


def plan_downloads(videos: DataFrame) -> DataFrame:
    """P8 + P10: attach the trim plan (ss,to) and the watch URL."""
    return (
        videos.withColumn("trim", trim_bounds(F.col("duration_sec")))
        .withColumn(
            "video_url",
            F.format_string("https://www.youtube.com/watch?v=%s", F.col("video_id")),
        )
    )


def select_segments(segments: DataFrame) -> DataFrame:
    """P5: the conjunctive selection gate + embed URL (P10,
    data_pipeline.py:659-660). Non-selected rows stay (selected=false)
    so the metadata document records them, exactly like metadata_all
    vs metadata_selected (K2)."""
    return segments.withColumn(
        "selected",
        (F.col("snr") >= MIN_SNR) & (F.col("speech_prob") >= MIN_SPEECH_PROB),
    ).withColumn(
        "embed_url",
        F.format_string(
            "https://www.youtube.com/embed/%s?start=%d&end=%d",
            F.col("video_id"),
            F.floor(F.col("start") / 16000),
            F.ceil(F.col("end") / 16000),
        ),
    )


def channel_metadata_document(segments: DataFrame) -> DataFrame:
    """A9: the per-channel nested metadata document
    map<video_id, array<struct{idx,url,selected,vad,snr}>> —
    data_pipeline.py:661-676 rebuilt as two aggregations:
    (channel, video) collect_list → channel map_from_entries.
    sort_array makes the document canonical (exactly-once
    re-publishing needs byte-stable output). Duration sums use
    (end-start) — the reference's negative-hours bug §7.4(1) fixed.

    Buffer bound: unlike the per-user event collectors (capped via
    _cap_per_key), these collect_lists are bounded by the DOMAIN —
    segments per video by VAD on a finite recording, videos per
    channel by the playlist — and the published document must be
    complete, so no truncation cap applies. A pathological input
    would be one multi-year recording, which the acquire stage's
    duration filter rejects upstream (plan_downloads).
    """
    per_video = (
        segments.groupBy("channel_id", "video_id")
        .agg(
            # BOUNDED: segments per video are bounded by VAD over a
            # finite recording (upstream duration filter)
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("seg_idx").alias("idx"),
                        F.col("embed_url").alias("url"),
                        F.col("selected"),
                        F.struct(F.col("start"), F.col("end")).alias("vad"),
                        F.col("snr"),
                        F.col("speech_prob"),
                    )
                )
            ).alias("segs"),
            F.sum(
                F.when(F.col("selected"), F.col("end") - F.col("start")).otherwise(0)
            ).alias("selected_samples"),
            F.sum(F.col("end") - F.col("start")).alias("total_samples"),
        )
    )
    return (
        per_video.groupBy("channel_id")
        .agg(
            # BOUNDED: videos per channel are bounded by the playlist
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(F.struct(F.col("video_id"), F.col("segs")))
                )
            ).alias("videos"),
            (F.sum("selected_samples") / 16000 / 3600).alias("selected_hours"),
            (F.sum("total_samples") / 16000 / 3600).alias("total_hours"),
        )
    )


def ingest_relational_plan(
    channels: DataFrame,
    ledger: DataFrame,
    playlist_backend,
    probe_backend,
) -> dict[str, DataFrame]:
    """The relational skeleton of E1 up to the audio boundary:
    returns {videos, skipped_channels, dead_letter} frames. The audio
    stages (download→VAD→SNR→AC) consume `videos` via the operators/
    kernels; tests drive them with synthetic segments."""
    from se_data_pipeline_spark.sources.acquire import fetch_playlists, probe_videos

    eligible, skipped = eligible_channels(channels)
    videos = fetch_playlists(
        eligible.select("id", "url"), playlist_backend
    ).join(
        F.broadcast(eligible.select(F.col("id").alias("channel_id"), "budget")),
        "channel_id",
    )
    fresh = dedup_against_ledger(videos, ledger)
    probed = probe_videos(fresh, probe_backend)
    ok, dead = split_dead_letter(probed)
    planned = plan_downloads(apply_budget(ok))
    return {
        "videos": planned,
        "skipped_channels": skipped,
        "dead_letter": dead,
    }
