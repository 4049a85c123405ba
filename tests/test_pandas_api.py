"""Pandas API on Spark (pyspark.pandas) migration path.

The reference is pandas code (notebooks + data_pipeline.py). A user
porting it can keep pandas idioms — concat / drop_duplicates /
boolean-mask filter / merge / sort_values — on pyspark.pandas and get
distributed execution; this test runs the reference's E3.2 channel
merge+rank flow (yt_channel_list_result_merge cells 1-3 +
quality_merge cells 4-7 shapes) both ways and pins equality against
the DataFrame-API plan."""

from __future__ import annotations

import warnings

import pytest

from se_data_pipeline_spark.plans.channel_ranking import (
    MIN_SUBS,
    rank_channels,
)
from se_data_pipeline_spark.plans.fixtures import channels_df, quality_df


def test_pandas_api_channel_ranking_matches_dataframe_plan(spark):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import pyspark.pandas as ps

    channels = channels_df(spark, 60)
    quality = quality_df(spark, 50)
    expected = {
        r["url"]: (r["n_subs"], round(r["score"], 9))
        for r in rank_channels(channels, quality).collect()
    }

    # --- the same flow in pandas idioms (reference notebook style) ---
    pch = channels.pandas_api()
    # concat+dedup+filter (result_merge cells 1-3); the fixture frame
    # stands in for the concatenated shard CSVs
    pch = pch.drop_duplicates()
    pch = pch[pch["n_subs"] > MIN_SUBS]

    # per-channel probe stats (quality_merge cell 4): the HOF stage
    # stays in the DataFrame API (pandas has no native nested-array
    # columns) — mixed usage is the realistic migration midpoint.
    from se_data_pipeline_spark.plans.channel_ranking import (
        quality_stats,
        scored_stats,
    )

    pq = scored_stats(quality_stats(quality)).pandas_api()

    merged = pch.merge(pq, on="url", how="inner")
    ranked = merged.sort_values(["score", "url"], ascending=[False, True])

    got = {
        row.url: (row.n_subs, round(row.score, 9))
        for row in ranked.to_spark().collect()
    }
    assert got == expected
    assert len(got) > 0
