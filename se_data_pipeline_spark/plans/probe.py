"""E2 — the channel quality probe (SURVEY §3 E2, filter_channel.py:
15-63): per channel, sample the first N videos, center-cut, VAD into
segments, score each (SNR + AC), and collect one quality record per
channel — the producer of the channel_quality table that E3.2 ranks.

urls → playlist acquire → per-channel limit (W1, max_per_channel=2)
→ [audio: download → center-cut → VAD → SNR → AC] → groupBy(url).
collect_list → quality JSONL (K3). Errors route to a dead-letter
frame (filter_channel.py:59-63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

MAX_PER_CHANNEL = 2  # filter_channel.py:99


def sample_videos(videos: DataFrame, max_per_channel: int = MAX_PER_CHANNEL) -> DataFrame:
    """First-N-per-channel in playlist order (the probe's
    max_per_chanel=2 slice)."""
    w = W.partitionBy("channel_id").orderBy("position")
    return (
        videos.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_per_channel)
        .drop("rn")
    )


def center_cut_bounds(duration_sec, cut_s: int = 600):
    """The probe's 10-minute center cut (yt_download.py:139-159):
    videos longer than cut_s keep [mid-300, mid+300]; shorter ones
    keep everything."""
    d = duration_sec
    half = cut_s // 2
    mid = (d / 2).cast("long")
    ss = F.when(d <= cut_s, 0).otherwise(mid - half)
    to = F.when(d <= cut_s, d).otherwise(mid + half)
    return F.struct(ss.cast("long").alias("ss"), to.cast("long").alias("to"))


def quality_records(scored_segments: DataFrame) -> DataFrame:
    """Collect per-channel probe output in the channel_quality shape
    {url, snrss, acss} (filter_channel.py:49-54). sort_array on a
    (video_id, seg_idx) key makes the arrays canonical, so the JSONL
    is byte-stable across retries."""
    collected = scored_segments.groupBy(
        F.col("channel_url").alias("url")
    ).agg(
        # BOUNDED: probe runs on a fixed per-channel video sample
        # (reference probes 3 videos/channel), segments VAD-bounded
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("video_id"),
                    F.col("seg_idx"),
                    F.col("snr"),
                    F.col("preds"),
                )
            )
        ).alias("segs")
    )
    return collected.select(
        "url",
        F.transform(F.col("segs"), lambda s: s["snr"]).alias("snrss"),
        F.transform(F.col("segs"), lambda s: s["preds"]).alias("acss"),
    )
