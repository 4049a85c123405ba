"""E1 capstone: the complete ingest pipeline end-to-end — fake
acquire backends, synthesized audio per planned video, VAD → SNR →
classification kernels, selection, nested metadata document, and the
exactly-once publisher — everything the reference's
data_pipeline.process_channel does, as one lazy Spark program."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from se_data_pipeline_spark.functions.arrays import speech_prob
from se_data_pipeline_spark.operators.audio import snr_from_wav, vad_split_segments
from se_data_pipeline_spark.operators.classify import classify_segments
from se_data_pipeline_spark.plans import fixtures
from se_data_pipeline_spark.plans.ingest import (
    channel_metadata_document,
    ingest_relational_plan,
    select_segments,
)
from se_data_pipeline_spark.sources.acquire import FakeAcquireBackend
from se_data_pipeline_spark.sources.publish import (
    CheckpointedPublisher,
    LocalDirPublisher,
    publish_metadata_json,
)

SR = 16_000


def test_full_ingest_end_to_end(spark, tmp_path):
    def synth_audio(video_id: str) -> bytes:
        # deterministic per-video audio: 2 tone bursts + silence
        # (nested so cloudpickle ships it by value to workers)
        import numpy as np

        from se_data_pipeline_spark.operators.audio import encode_wav

        sr = 16_000
        seed = sum(ord(c) for c in video_id)
        t = np.arange(sr) / sr
        freq = 200 + (seed % 200)
        burst = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
        gap = np.zeros(sr, dtype=np.float32)
        return encode_wav(np.concatenate([burst, gap, burst, gap]), sr)

    backend = FakeAcquireBackend()
    channels = fixtures.channels_df(spark).limit(6)
    ledger = fixtures.ledger_df(
        spark,
        backend.playlist_ids("https://www.youtube.com/channel/UC" + "0" * 22),
    )

    # relational skeleton: budget, playlist, ledger dedup, errors, trim
    out = ingest_relational_plan(channels, ledger, backend, backend)
    planned = out["videos"].limit(8)  # cap the audio stage for test speed

    # acquire-audio stage (fake downloader): one WAV per planned video
    audio_udf = F.udf(synth_audio, "binary").asNondeterministic()
    recordings = planned.select(
        "channel_id", "video_id", audio_udf("video_id").alias("audio")
    )

    # kernel chain: VAD split -> SNR -> classification -> speech prob
    segs = vad_split_segments(recordings)
    scored = classify_segments(segs.withColumn("snr", snr_from_wav("audio")))
    scored = scored.withColumn("speech_prob", speech_prob(F.col("preds")))

    # selection + nested metadata document
    selected = select_segments(scored.drop("audio", "preds"))
    docs = channel_metadata_document(selected).collect()
    assert len(docs) >= 1
    by_channel = {d["channel_id"]: d for d in docs}
    n_videos = sum(len(d["videos"]) for d in docs)
    assert n_videos == 8  # every planned video produced a metadata entry
    for d in docs:
        assert d["total_hours"] > 0
        for vid, seg_list in d["videos"].items():
            assert len(seg_list) == 2  # two bursts per synthesized video
            for s in seg_list:
                assert s["vad"]["end"] > s["vad"]["start"]
                assert s["url"].startswith("https://www.youtube.com/embed/")

    # publish: canonical JSON per channel through the exactly-once sink
    pub = CheckpointedPublisher(
        LocalDirPublisher(str(tmp_path / "pub")), str(tmp_path / "ledger.txt")
    )
    for d in docs:
        payload = publish_metadata_json(
            {"channel": d["channel_id"], "videos": sorted(d["videos"].keys())}
        )
        assert pub.publish(f"chan-{d['channel_id']}", [payload.decode()])
        assert not pub.publish(f"chan-{d['channel_id']}", [payload.decode()])
    published = os.listdir(str(tmp_path / "pub"))
    assert len(published) == len(by_channel)
    # published artifacts are valid canonical JSON
    for f in published:
        with open(tmp_path / "pub" / f) as fh:
            obj = json.loads(fh.read())
        assert obj["channel"] in by_channel
