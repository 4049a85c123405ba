"""Deterministic domain-table fixtures (FIXTURES.md §A): channels,
channel_quality, video_ledger — the reference's own data model, with
the boundary cases the operators must survive (exact duplicate rows,
duplicate titles, nulls, threshold-straddling values, empty arrays).

Seed-fixed (42) and pure-Python generated → identical frames every
run on every machine; tests and the DuckDB cross-checks rely on that.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

from se_data_pipeline_spark.catalog import CHANNELS, CHANNEL_QUALITY, VIDEO_LEDGER

SEED = 42

AC_LABEL_POOL = [
    "Speech",
    "Narration, monologue",
    "Female speech, woman speaking",
    "Male speech, man speaking",
    "Conversation",
    "Music",
    "Sound effect",
    "Silence",
]


def channels_rows(n: int = 60) -> list[tuple]:
    rng = random.Random(SEED)
    rows = []
    for i in range(n):
        cid = f"UC{i:022d}"
        # log-skewed subs around the 10k filter and budget tiers;
        # force exact boundary values on the first rows
        boundary = [9_999, 10_000, 10_001, 29_999, 200_000, 200_001]
        n_subs = (
            boundary[i]
            if i < len(boundary)
            else int(10 ** rng.uniform(3.0, 6.0))
        )
        rows.append(
            (
                f"Channel {i % (n - 5)}",  # forces some duplicate titles
                cid,
                rng.randint(0, 5000) if rng.random() > 0.05 else None,
                int(10 ** rng.uniform(4, 8)) if rng.random() > 0.05 else None,
                n_subs,
                f"@handle{i}" if rng.random() > 0.2 else None,
                f"c{i}@example.com" if rng.random() > 0.5 else None,
                f"https://www.youtube.com/channel/{cid}",
            )
        )
    rows.append(rows[7])  # exact duplicate row (A1 dedup coverage)
    rows.append(rows[9])
    return rows


def channels_df(spark: SparkSession, n: int = 60) -> DataFrame:
    return spark.createDataFrame(channels_rows(n), CHANNELS)


def quality_rows(n: int = 50) -> list[tuple]:
    rng = random.Random(SEED + 1)
    rows = []
    for i in range(n):
        cid = f"UC{i:022d}"
        url = f"https://www.youtube.com/channel/{cid}"
        n_seg = rng.randint(0, 40)  # includes empty arrays
        snrss = [round(rng.uniform(-20.0, 100.0), 3) for _ in range(n_seg)]
        if n_seg >= 3:
            snrss[0], snrss[1] = 20.0, 20.001  # threshold straddle
        acss = [
            [
                {"label": lab, "score": round(rng.random(), 4)}
                for lab in rng.sample(AC_LABEL_POOL, 3)
            ]
            for _ in range(n_seg)
        ]
        rows.append((url, snrss, acss))
    # a probe row with no matching channel (inner-join coverage)
    rows.append(("https://www.youtube.com/channel/UCnotinchannels000000", [25.0], []))
    return rows


def quality_df(spark: SparkSession, n: int = 50) -> DataFrame:
    return spark.createDataFrame(quality_rows(n), CHANNEL_QUALITY)


def ledger_rows(videos: list[str], overlap_every: int = 2) -> list[tuple]:
    """~50% overlap with a given video-id list (FIXTURES A3)."""
    picked = [(v,) for v in videos[::overlap_every]]
    return picked + [("ZZXnotinplaylist",)]


def ledger_df(spark: SparkSession, videos: list[str]) -> DataFrame:
    return spark.createDataFrame(ledger_rows(videos), VIDEO_LEDGER)
