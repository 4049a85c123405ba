"""Unit tests for the curation operators (queries/curation.py):
PII redaction, sliding-window chunking, contamination scan, greedy
token bin-packing."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from se_data_pipeline_spark.queries.curation import (
    _CHUNK_SIZE,
    _CHUNK_STRIDE,
    _EMAIL_RE,
    _PACK_BUDGET,
    _PHONE_RE,
    _pack_group,
)

# ---------------------------------------------------------------- pii


def test_pii_regexes_redact_and_count(spark):
    df = spark.createDataFrame(
        [
            Row(s="mail a.b-c_9@sub.domain.org and +1-555-0042 twice "
                  "x@y.io end"),
            Row(s="no pii here"),
        ]
    )
    out = df.select(
        F.regexp_count("s", F.lit(_EMAIL_RE)).alias("ne"),
        F.regexp_count("s", F.lit(_PHONE_RE)).alias("np"),
        F.regexp_replace(
            F.regexp_replace("s", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("red"),
    ).collect()
    assert (out[0]["ne"], out[0]["np"]) == (2, 1)
    assert out[0]["red"] == "mail <EMAIL> and <PHONE> twice <EMAIL> end"
    assert (out[1]["ne"], out[1]["np"]) == (0, 0)
    assert out[1]["red"] == "no pii here"


# ---------------------------------------------------------------- chunks


def test_chunking_windows_exact(spark):
    # 80 tokens, size 32 stride 24 -> starts 0,24,48,72
    toks = [f"t{i}" for i in range(80)]
    df = spark.createDataFrame([Row(doc_id=1, text=" ".join(toks))])
    t = F.split(F.col("text"), " ")
    starts = F.sequence(F.lit(0), F.size(t) - 1, F.lit(_CHUNK_STRIDE))
    chunk = F.slice(F.col("toks"), F.col("start") + 1, _CHUNK_SIZE)
    rows = (
        df.select("doc_id", t.alias("toks"), F.explode(starts).alias("start"))
        .select(
            "start",
            F.size(chunk).alias("n"),
            F.array_join(chunk, " ").alias("text"),
        )
        .collect()
    )
    assert [r["start"] for r in rows] == [0, 24, 48, 72]
    assert [r["n"] for r in rows] == [32, 32, 32, 8]  # tail is short
    assert rows[1]["text"].split(" ")[0] == "t24"
    # overlap: last 8 tokens of chunk k == first 8 of chunk k+1
    assert rows[0]["text"].split(" ")[24:] == rows[1]["text"].split(" ")[:8]


# ---------------------------------------------------------------- packing


def test_pack_group_greedy_fold():
    pdf = pd.DataFrame(
        {
            "doc_id": [3, 1, 2, 4, 5],
            "lang": ["en"] * 5,
            "n_tokens": [300, 200, 250, 600, 100],
        }
    )
    out = _pack_group(pdf)
    # sorted by doc_id: tokens 200,250,300,600,100
    # bin0: 200+250=450 (+300 would be 750>500) -> bin1: 300
    # (+600 overflows) -> bin2: 600 alone -> bin3: 100
    assert list(out["doc_id"]) == [1, 2, 3, 4, 5]
    assert list(out["bin_id"]) == [0, 0, 1, 2, 3]


def test_pack_group_oversized_doc_gets_own_bin():
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "lang": ["en", "en"],
            "n_tokens": [_PACK_BUDGET + 50, 10],
        }
    )
    out = _pack_group(pdf)
    # first doc opens bin 0 even though it alone exceeds the budget;
    # the next doc must start a new bin
    assert list(out["bin_id"]) == [0, 1]


def test_pack_budget_never_exceeded_by_multi_doc_bins():
    pdf = pd.DataFrame(
        {
            "doc_id": range(20),
            "lang": ["en"] * 20,
            "n_tokens": [137] * 20,
        }
    )
    out = _pack_group(pdf)
    sums = out.groupby("bin_id")["n_tokens"].sum()
    assert (sums <= _PACK_BUDGET).all()  # 3*137=411, 4*137>500
    assert (out["bin_id"].diff().dropna() >= 0).all()  # monotone bins


# ------------------------------------------------------------ pipeline


@pytest.mark.parametrize(
    "qname",
    ["doc_pii_redaction", "doc_chunks", "token_bin_packing"],
)
def test_curation_queries_run_on_fixture(spark, sf_dir, qname):
    from se_data_pipeline_spark.queries import all_queries

    df = all_queries()[qname](spark, sf_dir)
    assert df.count() > 0


# ---------------------------------------------------------------- ewma


def test_ewma_fold_exact():
    from se_data_pipeline_spark.queries.events import _ewma_group

    pdf = pd.DataFrame(
        {
            "user_id": [1] * 4,
            "event_id": [4, 3, 2, 1],
            "ts": pd.to_datetime(
                ["2024-01-01 03:00", "2024-01-01 02:00",
                 "2024-01-01 01:00", "2024-01-01 00:00"]
            ),
            "value": [40.0, 30.0, 20.0, 10.0],
        }
    )
    out = _ewma_group(pdf)
    # sorted by ts: values 10,20,30,40; alpha=0.2
    # y = 10, 0.2*20+0.8*10=12, 0.2*30+0.8*12=15.6, 0.2*40+0.8*15.6=20.48
    assert list(out["event_id"]) == [1, 2, 3, 4]
    assert list(out["ewma"]) == [10.0, 12.0, 15.6, 20.48]
