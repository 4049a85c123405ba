"""Unit tests for the Catalyst-expression kernel library
(se_data_pipeline_spark.functions): text, arrays, vectors.

Each test builds a tiny in-memory frame and checks exact values —
these kernels are deterministic expressions, so exact equality holds.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from se_data_pipeline_spark.functions.arrays import (
    array_count_above,
    array_mean,
    speech_prob,
    weighted_label_score,
)
from se_data_pipeline_spark.functions.text import (
    ROLLING_HASH_BASE,
    ROLLING_HASH_MOD,
    distinct_token_ratio,
    mean_token_length,
    rolling_hash,
    simhash,
    stopword_ratio,
    token_count,
    token_hashes,
    word_shingles,
)
from se_data_pipeline_spark.functions.vectors import cosine, dot, norm, sign_bucket


def one(df, col):
    return df.select(col.alias("v")).collect()[0]["v"]


# ---------------------------------------------------------------- text


def test_token_count_and_mean_length(spark):
    df = spark.createDataFrame([Row(text="ab cd efg")])
    assert one(df, token_count(F.col("text"))) == 3
    assert one(df, mean_token_length(F.col("text"))) == pytest.approx(7 / 3)


def test_distinct_token_ratio(spark):
    df = spark.createDataFrame([Row(text="a b a b a")])
    assert one(df, distinct_token_ratio(F.col("text"))) == pytest.approx(2 / 5)


def test_stopword_ratio(spark):
    df = spark.createDataFrame([Row(text="the cat and the dog")])
    assert one(df, stopword_ratio(F.col("text"), ["the", "and"])) == pytest.approx(3 / 5)


def test_rolling_hash_matches_python_fold(spark):
    s = "hello world"
    expected = 0
    for ch in s:
        expected = (expected * ROLLING_HASH_BASE + ord(ch)) % ROLLING_HASH_MOD
    df = spark.createDataFrame([Row(text=s)])
    assert one(df, rolling_hash(F.col("text"))) == expected


def test_word_shingles_basic_and_short(spark):
    df = spark.createDataFrame([Row(text="a b c d e f")])
    got = one(df, word_shingles(F.col("text"), 5))
    assert sorted(got) == ["a b c d e", "b c d e f"]
    short = spark.createDataFrame([Row(text="a b c")])
    assert one(short, word_shingles(F.col("text"), 5)) == []


def test_word_shingles_udf_matches_expression(spark):
    from se_data_pipeline_spark.functions.text import word_shingles_udf

    texts = ["a b c d e f g", "x y x y x y", "too short", "a b c d e"]
    df = spark.createDataFrame([Row(text=t) for t in texts])
    expr = [
        sorted(r["v"])
        for r in df.select(word_shingles(F.col("text"), 5).alias("v")).collect()
    ]
    udf = [
        sorted(r["v"])
        for r in df.select(word_shingles_udf(5)(F.col("text")).alias("v")).collect()
    ]
    assert expr == udf


def test_word_shingles_distinct(spark):
    df = spark.createDataFrame([Row(text="x y x y x y")])  # repeating shingles
    got = one(df, word_shingles(F.col("text"), 2))
    assert sorted(got) == ["x y", "y x"]


def _py_token_hash(tok: str) -> int:
    h = 0
    for ch in tok:
        h = (h * ROLLING_HASH_BASE + ord(ch)) % ROLLING_HASH_MOD
    return h


def _py_simhash(text: str, bits: int = 16) -> int:
    hashes = [_py_token_hash(t) for t in text.split(" ")]
    out = 0
    for k in range(bits):
        vote = sum(1 if (h >> k) & 1 else -1 for h in hashes)
        if vote > 0:
            out |= 1 << k
    return out


def test_token_hashes_match_python(spark):
    s = "the quick brown fox"
    df = spark.createDataFrame([Row(text=s)])
    assert one(df, token_hashes(F.col("text"))) == [
        _py_token_hash(t) for t in s.split(" ")
    ]


def test_simhash_udf_matches_expression_form(spark):
    from se_data_pipeline_spark.functions.text import simhash_udf

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a b a b a",
        "single",
    ]
    df = spark.createDataFrame([Row(text=t) for t in texts])
    expr_vals = [r["v"] for r in df.select(simhash(F.col("text")).alias("v")).collect()]
    udf_vals = [
        r["v"] for r in df.select(simhash_udf()(F.col("text")).alias("v")).collect()
    ]
    assert expr_vals == udf_vals == [_py_simhash(t) for t in texts]


def test_simhash_matches_python_and_is_similarity_preserving(spark):
    a = "the quick brown fox jumps over the lazy dog near the river bank"
    b = a + " today"  # near-dup: one extra token
    c = "completely different words about spark catalyst physical plans"
    df = spark.createDataFrame([Row(text=t) for t in (a, b, c)])
    got = [r["v"] for r in df.select(simhash(F.col("text")).alias("v")).collect()]
    assert got == [_py_simhash(t) for t in (a, b, c)]
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(got[0], got[1]) < ham(got[0], got[2])


# -------------------------------------------------------------- arrays


def test_array_count_above(spark):
    df = spark.createDataFrame([Row(xs=[1.0, 25.0, 20.0, 30.5])])
    assert one(df, array_count_above(F.col("xs"), 20.0)) == 2  # strict >


def test_array_mean_and_empty(spark):
    df = spark.createDataFrame([Row(xs=[2.0, 4.0])])
    assert one(df, array_mean(F.col("xs"))) == pytest.approx(3.0)
    empty = df.select(F.array().cast("array<double>").alias("xs"))
    assert one(empty, array_mean(F.col("xs"))) is None  # null, not NaN


def test_weighted_label_score_and_speech_prob(spark):
    preds = [
        Row(label="Speech", score=0.6),
        Row(label="Music", score=0.3),
        Row(label="Silence", score=0.1),
    ]
    df = spark.createDataFrame([Row(preds=preds)])
    got = one(df, weighted_label_score(F.col("preds"), ["Speech"], ["Music"]))
    assert got == pytest.approx(0.6 - 0.3)
    # the reference's live label sets (audio_ac.py:53-79)
    assert one(df, speech_prob(F.col("preds"))) == pytest.approx(0.3)


# ------------------------------------------------------------- vectors


def test_dot_norm_cosine(spark):
    df = spark.createDataFrame([Row(a=[1.0, 2.0, 2.0], b=[2.0, 0.0, 1.0])])
    assert one(df, dot(F.col("a"), F.col("b"))) == pytest.approx(4.0)
    assert one(df, norm(F.col("a"))) == pytest.approx(3.0)
    expected = 4.0 / (3.0 * math.sqrt(5.0))
    assert one(df, cosine(F.col("a"), F.col("b"))) == pytest.approx(expected)


def test_cosine_self_is_one(spark):
    df = spark.createDataFrame([Row(a=[0.3, -0.4, 1.2])])
    assert one(df, cosine(F.col("a"), F.col("a"))) == pytest.approx(1.0)


def test_sign_bucket(spark):
    df = spark.createDataFrame([Row(a=[1.0, -1.0, 0.5, -0.2])])
    # dims 0..3 → bits 1,0,1,0 → 1 + 4 = 5
    assert one(df, sign_bucket(F.col("a"), [0, 1, 2, 3])) == 5


# ---------------------------------------------------------------- asof_join


def _asof_frames(spark):
    from datetime import datetime as dt

    left = spark.createDataFrame(
        [
            Row(k="a", ts=dt(2024, 1, 1, 0, 10), lbl="a10"),
            Row(k="a", ts=dt(2024, 1, 1, 0, 30), lbl="a30"),
            Row(k="b", ts=dt(2024, 1, 1, 0, 5), lbl="b05"),
            Row(k="c", ts=dt(2024, 1, 1, 0, 20), lbl="c20"),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=dt(2024, 1, 1, 0, 10), px=1.0),
            Row(k="a", ts=dt(2024, 1, 1, 0, 25), px=2.0),
            Row(k="b", ts=dt(2024, 1, 1, 0, 7), px=3.0),
        ]
    )
    return left, right


def test_asof_join_backward_inclusive_and_null(spark):
    from se_data_pipeline_spark.functions.joins import asof_join

    left, right = _asof_frames(spark)
    out = {
        r["lbl"]: (r["px_asof"])
        for r in asof_join(left, right, on="k").collect()
    }
    # a10 matches the EQUAL-timestamp right row (inclusive boundary);
    # a30 takes the later 0:25 row; b05 precedes b's only row -> null;
    # c has no right rows at all -> null.
    assert out == {"a10": 1.0, "a30": 2.0, "b05": None, "c20": None}


def test_asof_join_forward(spark):
    from se_data_pipeline_spark.functions.joins import asof_join

    left, right = _asof_frames(spark)
    out = {
        r["lbl"]: r["px_asof"]
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    # forward: earliest right at-or-after. a10 -> equal ts row (1.0),
    # a30 -> nothing after -> null, b05 -> 0:07 row, c -> null.
    assert out == {"a10": 1.0, "a30": None, "b05": 3.0, "c20": None}


def test_asof_join_carries_matched_row_atomically(spark):
    """Null columns in the matched right row must NOT fall back to an
    older right row's value (the struct payload is carried whole)."""
    from datetime import datetime as dt

    from se_data_pipeline_spark.functions.joins import asof_join

    left = spark.createDataFrame([Row(k="a", ts=dt(2024, 1, 1, 0, 30))])
    right = spark.createDataFrame(
        [
            Row(k="a", ts=dt(2024, 1, 1, 0, 10), px=7.0),
            Row(k="a", ts=dt(2024, 1, 1, 0, 20), px=None),
        ]
    )
    row = asof_join(left, right, on="k").collect()[0]
    assert row["px_asof"] is None  # latest row's null, not 7.0
    assert row["ts_asof"] == dt(2024, 1, 1, 0, 20)


# ---------------------------------------------------------------- UDTF


def test_sentence_split_udtf_matches_jvm_composition(spark):
    """The UDTF (flexibility path) and the explode/regexp composition
    (throughput path) must implement the same split semantics."""
    from se_data_pipeline_spark.operators.udtf import split_sentences

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="Hello world. How are you? Fine!"),
            Row(doc_id=2, text="no delimiter tail"),
            Row(doc_id=3, text=None),
            Row(doc_id=4, text="  . .x.  "),
        ]
    )
    got = {
        (r["doc_id"], r["sent_idx"], r["sentence"], r["n_tokens"])
        for r in split_sentences(df).collect()
    }

    sents = F.filter(
        F.transform(
            F.expr(r"regexp_extract_all(text, '[^.!?]*[.!?]|[^.!?]+$', 0)"),
            lambda s: F.trim(s),
        ),
        lambda s: s != "",
    )
    jvm = (
        df.select("doc_id", F.posexplode(sents).alias("sent_idx", "sentence"))
        .withColumn("n_tokens", F.size(F.split("sentence", r"\s+")))
    )
    want = {
        (r["doc_id"], r["sent_idx"], r["sentence"], r["n_tokens"])
        for r in jvm.collect()
    }
    assert got == want and len(got) >= 6


def test_asof_join_matches_pandas_merge_asof_property(spark):
    """Property test: on random keyed time series, asof_join must
    agree with pandas.merge_asof (backward, inclusive) — an
    independent reference implementation."""
    import numpy as np
    import pandas as pd

    from se_data_pipeline_spark.functions.joins import asof_join

    rng = np.random.RandomState(11)
    for trial in range(3):
        nl, nr = rng.randint(5, 40), rng.randint(0, 30)
        lpdf = pd.DataFrame(
            {
                "k": rng.choice(["a", "b", "c"], nl),
                "ts": pd.to_datetime(
                    rng.randint(0, 10_000, nl) * 1_000_000_000
                ),
                "lid": np.arange(nl),
            }
        )
        rpdf = pd.DataFrame(
            {
                "k": rng.choice(["a", "b", "c"], max(nr, 1)),
                "ts": pd.to_datetime(
                    rng.randint(0, 10_000, max(nr, 1)) * 1_000_000_000
                ),
                "px": rng.rand(max(nr, 1)).round(6),
            }
        ).drop_duplicates(subset=["k", "ts"])  # unique match per instant

        got = {
            r["lid"]: r["px_asof"]
            for r in asof_join(
                spark.createDataFrame(lpdf),
                spark.createDataFrame(rpdf),
                on="k",
                right_cols=["px"],
            ).collect()
        }
        want_df = pd.merge_asof(
            lpdf.sort_values("ts", kind="stable"),
            rpdf.sort_values("ts", kind="stable"),
            on="ts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        want = {
            int(r.lid): (None if pd.isna(r.px) else float(r.px))
            for r in want_df.itertuples()
        }
        assert got == want, f"trial {trial}"


def test_round_half_up_matches_sql_round(spark):
    """round_half_up must agree with Spark's F.round (which agrees
    with DuckDB) — including exact halves, where python round() and
    np.round diverge (banker's rounding)."""
    import numpy as np

    from se_data_pipeline_spark.functions.numeric import round_half_up

    vals = [92.9140625, 0.0000005, 1.0000015, -92.9140625, 0.1234564, 7.25]
    got = [float(round_half_up(v, 6)) for v in vals]
    want = [
        r["r"]
        for r in spark.createDataFrame([(v,) for v in vals], "v double")
        .select(F.round("v", 6).alias("r"))
        .collect()
    ]
    assert got == want
    # the exact-half case that bit at sf0.1: banker's gives ...062
    assert float(round_half_up(11893 / 128)) == 92.914063
    assert round(11893 / 128, 6) == 92.914062  # what we must NOT do
    # vectorized form
    assert round_half_up(np.array([7.25, -7.25]), 1).tolist() == [7.3, -7.3]


def test_connected_components_transitive_chain(spark, tmp_path):
    """A~B and B~C must cluster {A,B,C} even when A and C share no
    shingles directly — the transitivity that pairwise dedup misses."""
    import pandas as pd

    from se_data_pipeline_spark.queries.text import (
        dedup_connected_components,
    )

    # Sliding 16-token windows over a shared 18-token stream:
    # consecutive windows overlap in 15 tokens (5-gram Jaccard
    # 11/13 ≈ 0.846 ≥ 0.8) but A vs C overlap only 14 (10/14 ≈ 0.714
    # < 0.8) — so A-C is connected ONLY through B. D/E are an
    # identical pair; F is a singleton (must not be emitted).
    stream = [f"t{i}" for i in range(18)]
    a = " ".join(stream[0:16])
    b = " ".join(stream[1:17])
    c = " ".join(stream[2:18])
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "text": [a, b, c, "d1 d2 d3 d4 d5 d6",
                     "d1 d2 d3 d4 d5 d6", "z1 z2 z3 z4 z5 z6"],
            "lang": ["en"] * 6,
            "source": ["s"] * 6,
            "n_chars": [len(a)] * 6,
        }
    )
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_connected_components(spark, sf).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}


def test_zorder_key_exact_morton_order(spark):
    """zorder_key must produce the canonical Morton interleave: the
    4x4 grid sorted by key follows the Z curve."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from se_data_pipeline_spark.functions.numeric import zorder_key

    grid = spark.createDataFrame(
        [Row(x=x, y=y) for x in range(4) for y in range(4)]
    )
    rows = (
        grid.select("x", "y", zorder_key(F.col("x"), F.col("y"), 2).alias("z"))
        .orderBy("z")
        .collect()
    )
    # known values: z(3,0)=0b0101=5, z(0,3)=0b1010=10, z(3,3)=15
    byxy = {(r["x"], r["y"]): r["z"] for r in rows}
    assert byxy[(3, 0)] == 5 and byxy[(0, 3)] == 10 and byxy[(3, 3)] == 15
    # the curve visits the four 2x2 quadrants in Z order
    quadrant = [(r["x"] // 2, r["y"] // 2) for r in rows]
    assert quadrant == (
        [(0, 0)] * 4 + [(1, 0)] * 4 + [(0, 1)] * 4 + [(1, 1)] * 4
    )


# ---------------------------------------------- vectorized hash kernel


def test_prefix_hash_kernel_property():
    """Property test: the vectorized prefix-sum span-hash kernel must
    equal the scalar per-char fold for arbitrary ASCII token streams,
    and bail out (None) on non-ASCII so callers hit the scalar path."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from se_data_pipeline_spark.functions.text import (
        ROLLING_HASH_BASE,
        ROLLING_HASH_MOD,
        TOKEN_SEP,
        shingle_hashes_np,
        token_hashes_np,
    )

    def fold(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * ROLLING_HASH_BASE + ord(ch)) % ROLLING_HASH_MOD
        return h

    ascii_token = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=0,
        max_size=12,
    ).filter(lambda t: " " not in t)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(ascii_token, min_size=0, max_size=30))
    def check(toks):
        text = TOKEN_SEP.join(toks) if toks else ""
        got = token_hashes_np(text)
        want = np.asarray(
            [fold(t) for t in text.split(TOKEN_SEP)], dtype=np.int64
        )
        assert got is not None and np.array_equal(got, want)

        sh = shingle_hashes_np(text, 5)
        ts = text.split(TOKEN_SEP)
        want_sh = (
            np.asarray(
                [fold(" ".join(ts[i : i + 5])) for i in range(len(ts) - 4)],
                dtype=np.int64,
            )
            if len(ts) >= 5
            else np.empty(0, dtype=np.int64)
        )
        assert np.array_equal(sh, want_sh)

    check()
    assert token_hashes_np("héllo wörld") is None
    assert shingle_hashes_np("ü a b c d e", 5) is None


def test_doc_duplicate_passages_span_merge(spark, tmp_path):
    """Crafted corpus: docs A and B share one verbatim 7-token
    passage (=> 3 overlapping 5-windows merging into ONE span of 7
    tokens each side); doc C is clean; doc D is too short to window.
    Exercises window extraction, the >=2-distinct-docs inverted
    index, gaps-and-islands merging, and the zero-fill left join."""
    import os

    from se_data_pipeline_spark.queries import all_queries

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
    rows = [
        (1, "intro one two " + shared + " tail xx yy"),
        (2, "other lead in " + shared + " closing words here"),
        (3, "completely unrelated text with no repeats at all ok"),
        (4, "tiny doc"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    # minimal documents table on disk so load_table() finds it
    d = str(tmp_path / "sf")
    docs.write.parquet(os.path.join(d, "documents.parquet"))

    out = {
        r["doc_id"]: r
        for r in all_queries()["doc_duplicate_passages"](spark, d).collect()
    }
    assert len(out) == 4
    for doc_id in (1, 2):
        r = out[doc_id]
        assert r["n_dup_windows"] == 3  # 7-token run -> 3 k=5 windows
        assert r["n_dup_spans"] == 1  # ...merged into one span
        assert r["dup_tokens"] == 7
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_tokens"] == 0
    assert out[4]["n_dup_windows"] == 0 and out[4]["dup_coverage"] == 0.0
    n1 = len(rows[0][1].split(" "))
    assert abs(out[1]["dup_coverage"] - round(7 / n1, 6)) < 1e-9


def test_doc_span_dedup_rewrites_corpus_first_occurrence_wins(
    spark, tmp_path
):
    """Crafted corpus for the span-dedup TRANSFORM (K=5 chunks):
    doc 1 and doc 2 start with the same 5-token chunk — doc 1 (lower
    doc_id) keeps it, doc 2 loses it; doc 2's second chunk is unique
    and survives; doc 3 repeats ITS OWN first chunk (within-doc dup,
    second copy dropped); doc 4 consists ENTIRELY of doc 1's chunk
    and reassembles to ''. Also pins the trailing-partial-chunk rule
    (doc 2's last 2 tokens form their own chunk)."""
    import os

    from se_data_pipeline_spark.queries import all_queries

    c = "alpha beta gamma delta epsilon"  # one 5-token chunk
    rows = [
        (1, c + " one two three four five"),
        (2, c + " six seven eight nine ten tail end"),
        (3, c.replace("alpha", "zeta") + " " + c.replace("alpha", "zeta")),
        (4, c),
        (5, None),  # NULL text ≡ '': one empty chunk, first wins
        (6, None),  # second NULL doc loses its '' chunk to doc 5
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    d = str(tmp_path / "sf")
    docs.write.parquet(os.path.join(d, "documents.parquet"))

    out = {
        r["doc_id"]: r
        for r in all_queries()["doc_span_dedup"](spark, d).collect()
    }
    assert len(out) == 6
    # NULL text: exactly one chunk each (never sequence(1,0) junk);
    # doc 5 keeps the corpus's empty chunk, doc 6 dedups against it
    assert out[5]["n_chunks"] == 1 and out[5]["n_removed"] == 0
    assert out[5]["text_dedup"] == ""
    assert out[6]["n_chunks"] == 1 and out[6]["n_removed"] == 1
    assert out[6]["text_dedup"] == ""
    # doc 1: both chunks globally first -> untouched
    assert out[1]["n_chunks"] == 2 and out[1]["n_removed"] == 0
    assert out[1]["text_dedup"] == rows[0][1]
    # doc 2: chunk 0 lost to doc 1; unique middle + 2-token tail kept
    assert out[2]["n_chunks"] == 3 and out[2]["n_removed"] == 1
    assert out[2]["text_dedup"] == "six seven eight nine ten tail end"
    # doc 3: within-doc duplicate -> second copy dropped
    assert out[3]["n_chunks"] == 2 and out[3]["n_removed"] == 1
    assert out[3]["text_dedup"] == c.replace("alpha", "zeta")
    # doc 4: every chunk seen earlier -> empty rewrite
    assert out[4]["n_chunks"] == 1 and out[4]["n_removed"] == 1
    assert out[4]["text_dedup"] == ""


def test_session_window_strict_gap_boundary(spark, tmp_path):
    """An event exactly 30 minutes after the previous one starts a
    running session merged (inclusive gap boundary); one second
    later it opens a new session. Pins the semantics the oracle
    mirrors with `<= INTERVAL 30 MINUTE`."""
    import datetime as dt
    import os

    from se_data_pipeline_spark.queries import all_queries

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 10: gap exactly 30 min -> MERGES (inclusive boundary)
        (1, t0, 1.0, "view", 10, "{}"),
        (2, t0 + dt.timedelta(minutes=30), 1.0, "view", 10, "{}"),
        # user 20: gap 30:01 -> two sessions
        (3, t0, 1.0, "view", 20, "{}"),
        (4, t0 + dt.timedelta(minutes=30, seconds=1), 1.0, "view", 20, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, value double, "
        "event_type string, user_id bigint, props string",
    )
    d = str(tmp_path / "sf")
    ev.write.parquet(os.path.join(d, "events.parquet"))

    out = all_queries()["events_session_windows"](spark, d).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[10]) == 1  # boundary event merges (inclusive)
    s = by_user[10][0]
    assert s["n_events"] == 2
    assert s["session_end"] == t0 + dt.timedelta(minutes=60)
    assert len(by_user[20]) == 2


def test_leakage_safe_splits_cluster_consistency(spark):
    """Every near-dup pair must land in the SAME split — the whole
    point of cluster-keyed splitting — and the split map must cover
    every document exactly once."""
    from se_data_pipeline_spark.queries import all_queries

    sf_dir = "/root/testdata/sf0.01"
    qs = all_queries()
    splits = {
        r["doc_id"]: r["split"]
        for r in qs["leakage_safe_splits"](spark, sf_dir).collect()
    }
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert len(splits) == n_docs
    pairs = (
        qs["ngram_jaccard_pairs"](spark, sf_dir)
        .select("doc_a", "doc_b")
        .collect()
    )
    assert pairs, "fixture should contain near-dup pairs"
    for r in pairs:
        assert splits[r["doc_a"]] == splits[r["doc_b"]]


def test_duplicate_passages_property_vs_python_reference(spark, tmp_path):
    """Property test: the distributed passage-dedup pipeline must
    equal a direct per-corpus Python reference (set-of-windows
    membership + interval merging) on randomized tiny-alphabet
    corpora, where cross-doc window collisions are dense by
    construction."""
    import os
    import random

    from se_data_pipeline_spark.queries import all_queries

    k = 5

    def reference(corpus: dict[int, list[str]]):
        wins: dict[tuple, set] = {}
        for d, toks in corpus.items():
            for i in range(max(0, len(toks) - k + 1)):
                wins.setdefault(tuple(toks[i : i + k]), set()).add(d)
        dup = {w for w, ds in wins.items() if len(ds) >= 2}
        out = {}
        for d, toks in corpus.items():
            pos = [
                i
                for i in range(max(0, len(toks) - k + 1))
                if tuple(toks[i : i + k]) in dup
            ]
            spans = []
            for p in pos:
                if spans and p - spans[-1][1] <= k:
                    spans[-1][1] = p
                else:
                    spans.append([p, p])
            n_tok = len(toks)
            dup_tok = sum(b - a + k for a, b in spans)
            out[d] = (
                len(pos),
                len(spans),
                dup_tok,
                round(dup_tok / n_tok, 6) if n_tok else 0.0,
            )
        return out

    rng = random.Random(7)
    for trial in range(3):
        corpus = {
            d: [rng.choice("ab") for _ in range(rng.randint(0, 30))]
            for d in range(1, 13)
        }
        rows = [(d, " ".join(toks)) for d, toks in corpus.items()]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        sf = str(tmp_path / f"sf_{trial}")
        df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))

        got = {
            r["doc_id"]: (
                r["n_dup_windows"],
                r["n_dup_spans"],
                r["dup_tokens"],
                r["dup_coverage"],
            )
            for r in all_queries()["doc_duplicate_passages"](
                spark, sf
            ).collect()
        }
        # NOTE: splitting "" on " " yields one empty token, matching
        # the engine's whitespace tokenizer; reference must match.
        want = reference(
            {d: (t.split(" ") if t else [""]) for d, t in rows}
        )
        assert got == want, f"trial {trial}"


def test_token_hash_dims_kernel_parity():
    """The vectorized feature-hash dims kernel must equal the scalar
    rolling-hash fold mod n_dims for ASCII and non-ASCII (fallback)
    inputs, skipping empty tokens."""
    from se_data_pipeline_spark.functions.text import (
        ROLLING_HASH_BASE,
        ROLLING_HASH_MOD,
        TOKEN_SEP,
        token_hashes_np,
    )

    def scalar_dims(text, n_dims=16):
        out = []
        for tok in [t for t in text.split(TOKEN_SEP) if t]:
            h = 0
            for ch in tok:
                h = (h * ROLLING_HASH_BASE + ord(ch)) % ROLLING_HASH_MOD
            out.append(h % n_dims)
        return out

    for text in (
        "the quick  brown fox",  # double space -> empty token skipped
        "a",
        "  leading and trailing  ",
        "héllo wörld mixed ascii",  # non-ASCII -> fallback path
    ):
        toks = [t for t in text.split(TOKEN_SEP) if t]
        arr = token_hashes_np(TOKEN_SEP.join(toks)) if toks else None
        if arr is not None:
            got = (arr % 16).tolist()
        else:
            got = scalar_dims(text)
        assert got == scalar_dims(text), text


def test_kv_parse_udtf_schema_from_arguments(spark):
    """The analyze()-polymorphic UDTF must derive typed output
    columns from the constant keys argument at plan time, and parse
    rows accordingly (missing keys -> NULL)."""
    from se_data_pipeline_spark.operators.udtf import make_kv_parse_udtf

    spark.udtf.register("kv_parse", make_kv_parse_udtf())
    spark.createDataFrame(
        [(1, "a=x;b=y"), (2, "b=z;c=w"), (3, None)],
        "row_id bigint, props string",
    ).createOrReplaceTempView("kv_rows")

    out = spark.sql(
        """SELECT t.* FROM kv_rows,
           LATERAL kv_parse(row_id, props, 'a,b') t"""
    )
    assert [f.name for f in out.schema.fields] == ["row_id", "a", "b"]
    rows = {r["row_id"]: (r["a"], r["b"]) for r in out.collect()}
    assert rows == {1: ("x", "y"), 2: (None, "z"), 3: (None, None)}


def test_bloom_prune_keeps_all_members_and_prunes_most(spark):
    from se_data_pipeline_spark.functions.joins import (
        bloom_build,
        bloom_prune,
    )

    build = spark.range(0, 200).withColumnRenamed("id", "k")
    probe = spark.range(0, 20000).withColumnRenamed("id", "k")
    words = bloom_build(build, "k", n_bits=1 << 14, k=3)
    assert len(words) == (1 << 14) // 64
    kept = bloom_prune(probe, "k", words, n_bits=1 << 14, k=3)
    kept_keys = {r.k for r in kept.collect()}
    # no false negatives — every build key survives
    assert set(range(200)) <= kept_keys
    # pruning actually prunes: 200 members + bounded false positives
    # (k=3, 600 bits of 16384 set → fp ≈ (600/16384)^3 ≈ 5e-5; give
    # two orders of magnitude slack so the test can never flake)
    assert len(kept_keys) < 200 + 100


def test_bloom_prune_exact_after_rejoin(spark):
    from se_data_pipeline_spark.functions.joins import (
        bloom_build,
        bloom_prune,
    )

    build = spark.range(0, 50).select((F.col("id") * 7).alias("k"))
    probe = spark.range(0, 1000).withColumnRenamed("id", "k")
    words = bloom_build(build, "k", n_bits=1 << 10, k=3)
    got = (
        bloom_prune(probe, "k", words, n_bits=1 << 10, k=3)
        .join(build, "k")
        .orderBy("k")
        .collect()
    )
    assert [r.k for r in got] == [7 * i for i in range(50) if 7 * i < 1000]


def test_interval_join_half_open_and_overlap(spark):
    from se_data_pipeline_spark.functions.joins import interval_join

    pts = spark.createDataFrame(
        [(1, 0), (1, 5), (1, 10), (1, 19), (1, 20), (2, 5)],
        "k: int, t: bigint",
    )
    ivs = spark.createDataFrame(
        [(1, 0, 10, "a"), (1, 5, 20, "b"), (2, 100, 110, "c")],
        "k: int, s: bigint, e: bigint, iv: string",
    )
    got = sorted(
        (r.t, r.iv)
        for r in interval_join(
            pts, ivs, "k", F.col("t"), F.col("s"), F.col("e"), F.lit(7)
        ).collect()
    )
    # t=0,5 in [0,10); t=5,10,19 in [5,20); ends exclusive (10 not in
    # a, 20 not in b); overlapping windows both credited at t=5; key
    # 2's point misses its interval entirely. Band=7 exercises
    # intervals spanning 2-3 buckets.
    assert got == [(0, "a"), (5, "a"), (5, "b"), (10, "b"), (19, "b")]


def test_rolling_corr_year_boundary_matches_global_window(spark):
    """The boundary-replicated per-year windows must equal a plain
    global window on a series crossing December 31 — the seam the
    sf fixtures (one month of data) never exercise."""
    import datetime as dt

    from pyspark.sql import Window as W

    from se_data_pipeline_spark.queries.events import _rolling_corr_7d

    rows = [
        (dt.datetime(2023, 12, 20) + dt.timedelta(days=i),
         (i * 7) % 13 + 1,
         float((i * 11) % 17) + 0.5)
        for i in range(25)  # Dec 20 .. Jan 13 — spans the boundary
    ]
    daily = spark.createDataFrame(
        rows, "day: timestamp, n_views: bigint, purchase_value: double"
    )
    got = {
        r["day"]: r["corr_7d"]
        for r in _rolling_corr_7d(daily).collect()
    }
    gw = W.orderBy("day").rowsBetween(-6, W.currentRow)
    vcol = F.col("n_views").cast("double")
    exp_df = (
        daily.withColumn("c", F.corr(vcol, F.col("purchase_value")).over(gw))
        .withColumn("vv", F.var_samp(vcol).over(gw))
        .withColumn("vp", F.var_samp("purchase_value").over(gw))
        .select(
            "day",
            F.when((F.col("vv") > 0) & (F.col("vp") > 0),
                   F.round("c", 6)).alias("corr_7d"),
        )
    )
    exp = {r["day"]: r["corr_7d"] for r in exp_df.collect()}
    assert got == exp
    assert len(got) == 25
    # the January days whose frames straddle the seam are non-null
    jan2 = dt.datetime(2024, 1, 2)
    assert got[jan2] is not None


def test_cap_bucket_truncates_hot_buckets_deterministically(spark):
    """_cap_bucket keeps the first `cap` doc_ids per key (ordered by
    doc_id) and leaves cold buckets intact — the spill-safe guard the
    posting-list builders in queries/text.py rely on at scale."""
    from se_data_pipeline_spark.queries.text import _cap_bucket

    rows = [("hot", f"d{i:03d}") for i in range(20)] + [
        ("cold", "d900"),
        ("cold", "d901"),
    ]
    e = spark.createDataFrame(rows, "sh: string, doc_id: string")
    out = _cap_bucket(e, "sh", cap=5).collect()
    hot = sorted(r["doc_id"] for r in out if r["sh"] == "hot")
    cold = sorted(r["doc_id"] for r in out if r["sh"] == "cold")
    assert hot == [f"d{i:03d}" for i in range(5)]
    assert cold == ["d900", "d901"]
    # default cap is far above any fixture bucket: identity on this data
    assert _cap_bucket(e, "sh").count() == len(rows)


def test_cap_bucket_strict_raises_on_flood(spark):
    """strict=True turns the silent hot-bucket truncation into a
    loud failure the moment a bucket EXCEEDS the cap — the ADVICE r9
    contract for queries (multimodal_phash_pairs) whose brute-force
    oracle has no cap: diverge loudly, never silently."""
    import pytest

    from se_data_pipeline_spark.queries.text import _cap_bucket

    rows = [("hot", f"d{i:03d}") for i in range(20)] + [
        ("cold", "d900"),
        ("cold", "d901"),
    ]
    e = spark.createDataFrame(rows, "sh: string, doc_id: string")
    with pytest.raises(Exception, match="bucket flood"):
        _cap_bucket(e, "sh", cap=5, strict=True).collect()
    # a bucket exactly AT the cap drops nothing -> no divergence,
    # strict passes and returns every row
    assert _cap_bucket(e, "sh", cap=20, strict=True).count() == len(rows)


def test_pack_sign_bits_and_hamming_codes(spark):
    """Packed sign-bit codes: bit k set iff v[k] > 0 (bit 63 = the
    long sign bit), and bit_count(xor) equals the unpacked
    sign-disagreement count — the BQ stage-1 kernel."""
    import random

    from se_data_pipeline_spark.functions.vectors import (
        hamming_codes,
        pack_sign_bits,
    )

    df = spark.createDataFrame(
        [([0.5, -1.0, 2.0, 0.0],), ([-0.1, 3.0, -2.0, 1.0],)],
        "v: array<double>",
    )
    codes = [
        r["c"] for r in df.select(pack_sign_bits(F.col("v"), 4).alias("c")).collect()
    ]
    assert codes == [0b0101, 0b1010]  # x > 0 strictly: the 0.0 dim is unset

    rng = random.Random(7)
    v1 = [rng.uniform(-1, 1) for _ in range(64)]
    v2 = [rng.uniform(-1, 1) for _ in range(64)]
    v1[63], v2[63] = 1.0, -1.0  # force a bit-63 (sign-bit) disagreement
    truth = sum((x > 0) != (y > 0) for x, y in zip(v1, v2))
    got = (
        spark.createDataFrame(
            [(v1, v2)], "a: array<double>, b: array<double>"
        )
        .select(
            hamming_codes(
                pack_sign_bits(F.col("a")), pack_sign_bits(F.col("b"))
            ).alias("h")
        )
        .collect()[0]["h"]
    )
    assert got == truth

    with pytest.raises(ValueError):
        pack_sign_bits(F.col("a"), 65)


def test_winnowing_guarantee_property():
    """Hypothesis check of the two winnowing invariants (Schleimer/
    Wilkerson/Aiken): (1) every fingerprint is the hash of some
    k-gram of the input; (2) every sliding w-window of the k-gram
    hash sequence is covered by a selected fingerprint — the
    guarantee that any shared run of >= w+k-1 tokens produces a
    shared fingerprint between two documents."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from se_data_pipeline_spark.functions.text import (
        winnow_fingerprints_py,
    )

    K, W = 4, 5
    token = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1,
        max_size=6,
    ).filter(lambda t: " " not in t)

    def kgram_hashes(toks):
        return [
            int(
                hashlib.md5(
                    " ".join(toks[i : i + K]).encode()
                ).hexdigest()[:12],
                16,
            )
            for i in range(len(toks) - K + 1)
        ]

    @settings(max_examples=200, deadline=None)
    @given(st.lists(token, min_size=0, max_size=40))
    def check(toks):
        fps = winnow_fingerprints_py(" ".join(toks), K, W)
        if len(toks) < K:
            assert fps == []
            return
        hs = kgram_hashes(toks)
        fpset = set(fps)
        assert fpset <= set(hs)  # (1) no fabricated fingerprints
        assert len(fps) == len(fpset)  # dedup holds
        if len(hs) < W:
            assert fps == [min(hs)]
            return
        for j in range(len(hs) - W + 1):  # (2) window coverage
            assert any(h in fpset for h in hs[j : j + W])

    check()


def test_minhash_signature_algebra_property():
    """Exact MinHash algebra on the shingle-hash multiset level:
    sig(A union B) == elementwise min(sig(A), sig(B)), and signatures
    are invariant under element order and duplication. This is the
    mergeability contract the LSH banding and any sharded/streaming
    signature combine rely on."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from se_data_pipeline_spark.queries.text import _mh_sig_from_hashes

    elem = st.integers(min_value=0, max_value=2**40)
    arrays = st.lists(elem, min_size=1, max_size=50)

    @settings(max_examples=200, deadline=None)
    @given(arrays, arrays)
    def check(a, b):
        sa = _mh_sig_from_hashes(np.asarray(a, dtype=np.int64))
        sb = _mh_sig_from_hashes(np.asarray(b, dtype=np.int64))
        su = _mh_sig_from_hashes(np.asarray(a + b, dtype=np.int64))
        assert np.array_equal(su, np.minimum(sa, sb))
        # order- and duplication-invariance
        rng = np.random.default_rng(0)
        shuffled = np.asarray(a + a, dtype=np.int64)
        rng.shuffle(shuffled)
        assert np.array_equal(_mh_sig_from_hashes(shuffled), sa)

    check()


def test_cap_order_lines_truncates_mega_baskets(spark):
    """_cap_order_lines keeps the first `cap` lineitem rows per order
    by l_partkey and leaves small baskets intact — the mega-basket
    guard the C(m,2) pair generators in queries/relational.py rely
    on at scale."""
    from se_data_pipeline_spark.queries.relational import (
        _cap_order_lines,
    )

    rows = [(1, p) for p in range(30, 0, -1)] + [(2, 7), (2, 9)]
    li = spark.createDataFrame(
        rows, "l_orderkey: long, l_partkey: long"
    )
    out = _cap_order_lines(li, cap=5).collect()
    big = sorted(r["l_partkey"] for r in out if r["l_orderkey"] == 1)
    small = sorted(r["l_partkey"] for r in out if r["l_orderkey"] == 2)
    assert big == [1, 2, 3, 4, 5]  # lowest partkeys survive
    assert small == [7, 9]
    # default cap is far above any fixture basket: identity
    assert _cap_order_lines(li).count() == len(rows)
