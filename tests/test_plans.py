"""Pipeline tests over the domain fixtures (FIXTURES.md §A):
channel ranking (E3.2) cross-checked against a DuckDB oracle, and the
ingest relational skeleton (E1) end-to-end with the fake acquire
backend."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from se_data_pipeline_spark.plans import fixtures
from se_data_pipeline_spark.plans.channel_ranking import (
    MIN_SUBS,
    rank_channels,
)
from se_data_pipeline_spark.plans.ingest import (
    channel_metadata_document,
    ingest_relational_plan,
    select_segments,
    video_budget,
)
from se_data_pipeline_spark.plans.probe import (
    center_cut_bounds,
    quality_records,
    sample_videos,
)
from se_data_pipeline_spark.sources.acquire import (
    ERR_OFFLINE,
    ERR_PREMIERE,
    FakeAcquireBackend,
    fetch_playlists,
    probe_videos,
    split_dead_letter,
)


# ------------------------------------------------------ channel ranking


def test_rank_channels_against_duckdb(spark):
    """The full E3.2 result (scores, join, filter, dedup, order)
    must match an independent SQL restatement over the same fixture
    rows."""
    channels = fixtures.channels_df(spark)
    quality = fixtures.quality_df(spark)
    got = rank_channels(channels, quality).collect()

    con = duckdb.connect()
    con.execute("CREATE TABLE channels(title VARCHAR, id VARCHAR, n_videos BIGINT, n_views BIGINT, n_subs BIGINT, custom_url VARCHAR, email VARCHAR, url VARCHAR)")
    con.executemany(
        "INSERT INTO channels VALUES (?,?,?,?,?,?,?,?)", fixtures.channels_rows()
    )
    con.execute("CREATE TABLE quality(url VARCHAR, snrss DOUBLE[], acss STRUCT(label VARCHAR, score DOUBLE)[][])")
    con.executemany(
        "INSERT INTO quality VALUES (?,?,?)",
        fixtures.quality_rows(),  # dicts map to DuckDB STRUCTs directly
    )
    oracle = con.execute(f"""
        WITH stats AS (
          SELECT url, len(snrss) AS n_total,
                 len(list_filter(snrss, x -> x > 20.0)) AS n_snr_ok,
                 len(list_filter(acss, seg ->
                   list_sum([CASE
                     WHEN p.label IN ('Narration, monologue',
                                      'Female speech, woman speaking',
                                      'Male speech, man speaking', 'Speech')
                       THEN p.score
                     WHEN p.label IN ('Conversation', 'Music', 'Sound effect')
                       THEN -p.score
                     ELSE 0 END for p in seg]) > 0.9)) AS n_ac_ok
          FROM quality),
        mx AS (SELECT MAX(n_snr_ok) m1, MAX(n_ac_ok) m2 FROM stats),
        scored AS (
          SELECT s.*,
                 (CASE WHEN m1 > 0 THEN s.n_snr_ok * 1.0 / m1 ELSE 0 END
                + CASE WHEN m2 > 0 THEN s.n_ac_ok * 1.0 / m2 ELSE 0 END) AS score
          FROM stats s CROSS JOIN mx)
        SELECT c.title, c.id, c.n_videos, c.n_views, c.n_subs,
               s.n_total, s.n_snr_ok, s.n_ac_ok, s.score, c.url
        FROM (SELECT DISTINCT * FROM channels) c
        JOIN scored s ON s.url = c.url
        WHERE c.n_subs > {MIN_SUBS}
        ORDER BY s.score DESC, c.id
    """).fetchall()

    assert len(got) == len(oracle) > 0
    for g, o in zip(got, oracle):
        assert tuple(g)[:8] == tuple(o)[:8]
        assert g["score"] == pytest.approx(o[8])
        assert g["url"] == o[9]


def test_rank_scores_are_globally_normalized(spark):
    ranked = rank_channels(
        fixtures.channels_df(spark), fixtures.quality_df(spark)
    ).collect()
    assert max(r["score"] for r in ranked) <= 2.0 + 1e-9
    assert any(r["score"] > 0 for r in ranked)


# ---------------------------------------------------------- E1 skeleton


def test_ingest_relational_plan_end_to_end(spark):
    backend = FakeAcquireBackend()
    channels = fixtures.channels_df(spark)
    some_videos = backend.playlist_ids(
        "https://www.youtube.com/channel/UC" + "0" * 22
    )
    ledger = fixtures.ledger_df(spark, some_videos)

    out = ingest_relational_plan(channels, ledger, backend, backend)
    videos = out["videos"].collect()
    skipped = out["skipped_channels"].collect()
    dead = out["dead_letter"].collect()

    assert len(videos) > 0
    # budget respected per channel
    per_channel: dict[str, int] = {}
    budgets: dict[str, int] = {}
    for v in videos:
        per_channel[v["channel_id"]] = per_channel.get(v["channel_id"], 0) + 1
        budgets[v["channel_id"]] = v["budget"]
        # trim rule consistent with duration
        d, t = v["duration_sec"], v["trim"]
        if d < 180:
            assert (t["ss"], t["to"]) == (0, d)
        elif d > 2042:
            assert (t["ss"], t["to"]) == (120, d - 120)
        else:
            assert (t["ss"], t["to"]) == (60, d - 60)
        assert v["video_url"].endswith(v["video_id"])
    for ch, n in per_channel.items():
        assert n <= budgets[ch]

    # ledger rows are gone
    ledger_ids = {r["video_id"] for r in ledger.collect()}
    assert not ledger_ids & {v["video_id"] for v in videos}

    # dead letters carry typed error classes; skips carry reasons
    assert {d["error_class"] for d in dead} <= {ERR_PREMIERE, ERR_OFFLINE}
    assert all(s["reason"] == "too_few_videos" for s in skipped)


def test_video_budget_tiers(spark):
    df = spark.createDataFrame(
        [Row(n_subs=s) for s in (5_000, 10_000, 29_999, 49_000, 99_999, 150_000, 250_000)]
    )
    got = [r["b"] for r in df.select(video_budget(F.col("n_subs")).alias("b")).collect()]
    assert got == [10, 20, 20, 30, 40, 50, 60]


def test_segment_selection_and_metadata_document(spark):
    segs = spark.createDataFrame(
        [
            Row(channel_id="c1", video_id="v1", seg_idx="v1_00000000",
                start=0, end=16000 * 10, snr=25.0, speech_prob=0.95),
            Row(channel_id="c1", video_id="v1", seg_idx="v1_00000001",
                start=16000 * 12, end=16000 * 20, snr=10.0, speech_prob=0.99),
            Row(channel_id="c1", video_id="v2", seg_idx="v2_00000000",
                start=0, end=16000 * 5, snr=30.0, speech_prob=0.5),
        ]
    )
    sel = select_segments(segs)
    rows = {r["seg_idx"]: r for r in sel.collect()}
    assert rows["v1_00000000"]["selected"] is True
    assert rows["v1_00000001"]["selected"] is False  # snr gate
    assert rows["v2_00000000"]["selected"] is False  # speech gate
    assert rows["v1_00000001"]["embed_url"] == (
        "https://www.youtube.com/embed/v1?start=12&end=20"
    )

    doc = channel_metadata_document(sel).collect()
    assert len(doc) == 1
    d = doc[0]
    assert set(d["videos"].keys()) == {"v1", "v2"}
    assert len(d["videos"]["v1"]) == 2
    # duration math is positive (reference bug §7.4(1) fixed)
    assert d["selected_hours"] == pytest.approx(10 / 3600)
    assert d["total_hours"] == pytest.approx(23 / 3600)


# ------------------------------------------------------------- E2 probe


def test_probe_plan_shapes(spark):
    backend = FakeAcquireBackend()
    channels = fixtures.channels_df(spark).limit(4)
    videos = fetch_playlists(channels.select("id", "url"), backend)
    sampled = sample_videos(videos)
    counts = sampled.groupBy("channel_id").count().collect()
    assert all(c["count"] <= 2 for c in counts)

    probed = probe_videos(sampled, backend)
    ok, _ = split_dead_letter(probed)
    cut = ok.withColumn("cut", center_cut_bounds(F.col("duration_sec")))
    for r in cut.collect():
        d, c = r["duration_sec"], r["cut"]
        if d <= 600:
            assert (c["ss"], c["to"]) == (0, d)
        else:
            assert c["to"] - c["ss"] == 600

    # quality_records collects the channel_quality shape
    scored = ok.select(
        F.col("channel_id"),
        F.format_string(
            "https://www.youtube.com/channel/%s", F.col("channel_id")
        ).alias("channel_url"),
        "video_id",
        F.concat_ws("_", "video_id", "position").alias("seg_idx"),
        (F.col("duration_sec") * 0.01).alias("snr"),
        F.array(
            F.struct(F.lit("Speech").alias("label"), F.lit(0.9).alias("score"))
        ).alias("preds"),
    )
    q = quality_records(scored).collect()
    assert len(q) == len(counts)
    for r in q:
        assert len(r["snrss"]) == len(r["acss"]) >= 1
        assert all(p["label"] == "Speech" for seg in r["acss"] for p in seg)


def test_build_corpus_end_to_end(spark, tmp_path):
    """The full corpus build: survivors = selected docs only, each in
    exactly one split directory; no near-dup pair straddles splits;
    manifest totals match what is on disk."""
    import os

    from pyspark.sql import functions as F

    from se_data_pipeline_spark.plans.corpus_build import build_corpus
    from se_data_pipeline_spark.queries import all_queries

    sf_dir = "/root/testdata/sf0.01"
    out = str(tmp_path / "corpus")
    manifest = build_corpus(spark, sf_dir, out, n_shards=4).collect()
    qs = all_queries()

    expected = {
        r["doc_id"]
        for r in qs["corpus_joint_curation"](spark, sf_dir)
        .filter("selected")
        .collect()
    }
    on_disk = {}
    for split in ("train", "val", "test"):
        p = os.path.join(out, split)
        has_shards = os.path.exists(p) and any(
            e.startswith("shard=") for e in os.listdir(p)
        )
        if has_shards:
            for r in spark.read.parquet(p).select("doc_id").collect():
                assert r["doc_id"] not in on_disk, "doc in two splits"
                on_disk[r["doc_id"]] = split
    assert set(on_disk) == expected

    pair_splits = {
        (r["doc_a"], r["doc_b"])
        for r in qs["ngram_jaccard_pairs"](spark, sf_dir)
        .select("doc_a", "doc_b")
        .collect()
    }
    for a, b in pair_splits:
        if a in on_disk and b in on_disk:
            assert on_disk[a] == on_disk[b]

    total_manifest = sum(r["n_docs"] for r in manifest)
    assert total_manifest == len(expected)
    for r in manifest:
        p = os.path.join(out, r["split"], f"shard={r['shard']}")
        n = spark.read.parquet(p).count()
        assert n == r["n_docs"]
