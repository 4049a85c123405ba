"""Adapter-seam tests (SURVEY §5c / VERDICT r2 #9): the silero / HF
glue code — parameter mapping, timestamp conversion, resampling,
payload shaping — is real and testable against recorded fixtures;
only the model/network call itself stays stubbed behind an injectable
callable."""

from __future__ import annotations

import numpy as np
import pytest

from se_data_pipeline_spark.operators.audio import (
    VAD_SR,
    SileroVad,
    VadConfig,
    decode_wav,
    encode_wav,
    vad_split_segments,
)
from se_data_pipeline_spark.operators.classify import (
    AC_SR,
    HfAstClassifier,
)
from se_data_pipeline_spark.sources.publish import (
    CheckpointedPublisher,
    HfHubPublisher,
)


# ------------------------------------------------------------- silero


def test_silero_kwargs_map_reference_defaults():
    """VadConfig defaults must map to exactly the reference's
    get_speech_timestamps arguments (audio_vad.py:23-26)."""
    vad = SileroVad(model_fn=lambda x, sr, kw: [])
    assert vad.silero_kwargs() == {
        "min_speech_duration_ms": 500,
        "max_speech_duration_s": 15.0,
        "min_silence_duration_ms": 150,
        "speech_pad_ms": 30,
    }


def test_silero_spans_from_fixture_timestamps():
    """Raw silero timestamp dicts (recorded-fixture shape) become
    sorted, clamped (start, end) spans."""
    fixture = [
        {"start": 32000, "end": 48000},
        {"start": 0, "end": 16000},
        {"start": 60000, "end": 999999},  # past end -> clamped
        {"start": 50000, "end": 50000},  # empty -> dropped
    ]
    seen = {}

    def model_fn(x, sr, kwargs):
        seen["sr"] = sr
        seen["kwargs"] = kwargs
        return fixture

    vad = SileroVad(model_fn=model_fn)
    x = np.zeros(64000, dtype=np.float32)
    spans = vad.speech_spans(x, VAD_SR)
    assert spans == [(0, 16000), (32000, 48000), (60000, 64000)]
    assert seen["sr"] == VAD_SR
    assert seen["kwargs"]["min_speech_duration_ms"] == 500


def test_silero_backend_drives_vad_split_with_rescale(spark):
    """End-to-end through vad_split_segments: fixture timestamps at
    16 kHz slice the ORIGINAL 48 kHz signal x3 (audio_vad.py:48-57),
    with start/end reported in 16 kHz units."""
    sr = 48_000
    x = np.arange(sr * 2, dtype=np.float32) / (sr * 2)  # ramp: position-coded
    fixture = [{"start": 8000, "end": 16000}]  # 0.5s-1.0s at 16k

    backend = SileroVad(model_fn=lambda x16, s, kw: fixture)
    from pyspark.sql import Row

    rec = spark.createDataFrame(
        [Row(channel_id="c", video_id="v", audio=bytearray(encode_wav(x, sr)))]
    )
    rows = vad_split_segments(rec, backend=backend).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["start"], r["end"]) == (8000, 16000)
    assert r["seg_idx"] == "v_00000000"
    y, ysr = decode_wav(bytes(r["audio"]))
    assert ysr == sr
    # sliced from the 48k original at x3 offsets
    np.testing.assert_allclose(y, x[24000:48000], atol=2 / 32767)


# ----------------------------------------------------------------- HF AST


def test_hf_ast_resamples_and_shapes_fixture_predictions():
    """Clips resample to the pipeline's 16 kHz; recorded prediction
    JSON normalizes to score-desc sorted [{label, score}] lists."""
    fixture = [
        [
            {"label": "Music", "score": 0.1},
            {"label": "Speech", "score": 0.9},
            {"label": "Conversation", "score": 0.1},
        ]
    ]
    seen = {}

    def pipeline_fn(clips, sr):
        seen["lens"] = [len(c) for c in clips]
        seen["sr"] = sr
        return fixture

    clf = HfAstClassifier(pipeline_fn=pipeline_fn)
    clip_48k = np.zeros(48_000, dtype=np.float32)  # 1 s at 48 kHz
    preds = clf.predict_batch([clip_48k], 48_000)
    assert seen["sr"] == AC_SR
    assert seen["lens"] == [16_000]  # resampled to 1 s at 16 kHz
    assert preds == [
        [
            {"label": "Speech", "score": 0.9},
            {"label": "Conversation", "score": 0.1},
            {"label": "Music", "score": 0.1},
        ]
    ]


def test_hf_ast_top_k_cut():
    fixture = [[{"label": l, "score": s} for l, s in
                [("A", 0.5), ("B", 0.3), ("C", 0.2)]]]
    clf = HfAstClassifier(pipeline_fn=lambda c, s: fixture, top_k=2)
    preds = clf.predict_batch([np.zeros(AC_SR, dtype=np.float32)], AC_SR)
    assert [p["label"] for p in preds[0]] == ["A", "B"]


# ----------------------------------------------------------------- HF Hub


def test_hf_hub_request_shape_and_upload():
    """Request shaping mirrors hf.py:35-48's upload kwargs; the
    injected upload_fn records exactly one shaped call."""
    calls = []
    pub = HfHubPublisher(
        "org/corpus", branch="dev", upload_fn=calls.append
    )
    req = pub.request("batch-000000001", b"{}")
    assert req == {
        "repo_id": "org/corpus",
        "repo_type": "dataset",
        "revision": "dev",
        "path_in_repo": "batches/batch-000000001.json",
        "commit_message": "publish batch-000000001",
        "payload": b"{}",
    }
    pub.upload("batch-000000001", b"{}")
    assert calls == [req]


def test_hf_hub_behind_checkpointed_publisher(tmp_path):
    """The shaped transport slots into the exactly-once publisher:
    committed batch ids never re-upload."""
    calls = []
    pub = CheckpointedPublisher(
        HfHubPublisher("org/corpus", upload_fn=calls.append),
        str(tmp_path / "ledger.txt"),
        backoff_s=0.0,
    )
    assert pub.publish("b0", ['{"x":1}']) is True
    assert pub.publish("b0", ['{"x":1}']) is False
    assert len(calls) == 1
    assert calls[0]["path_in_repo"] == "batches/b0.json"
