"""Batched audio classification (SURVEY D3/D4): the reference runs an
HF audio-classification pipeline over all segments of a video under a
GPU semaphore (audio_ac.py:35-50, mp.py:5). Here the classifier is a
pluggable backend behind one mapInPandas operator:

- FakeAcClassifier: deterministic signal-feature rules (energy +
  zero-crossing rate) → {label, score} lists; drives tests and the
  correctness harness.
- HfAstClassifier: stub for the real MIT/ast-finetuned-audioset model
  — requires torch/transformers (not in this container); on a real
  cluster it becomes the executor-singleton with
  spark.task.resource.gpu.amount instead of a semaphore.

The speech-probability reduction over the predictions is NOT a UDF —
it is the Catalyst expression functions.arrays.speech_prob (F12/D4).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Protocol

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from se_data_pipeline_spark.operators.audio import decode_wav

AC_LABELS = [
    "Speech",
    "Narration, monologue",
    "Female speech, woman speaking",
    "Male speech, man speaking",
    "Conversation",
    "Music",
    "Sound effect",
    "Silence",
]


class AcBackend(Protocol):
    def predict_batch(self, clips: list[np.ndarray], sr: int) -> list[list[dict]]:
        """One prediction list [{label, score}, ...] per clip."""
        ...


class FakeAcClassifier:
    """Deterministic rule-based classifier: scores derive from frame
    energy and zero-crossing rate, so identical bytes → identical
    predictions on every run (what oracle-style tests need).
    Heuristic: strong + mid-ZCR → speech-ish labels; strong +
    high-ZCR → music/noise; weak → silence."""

    top_k = 3

    def predict_batch(self, clips: list[np.ndarray], sr: int) -> list[list[dict]]:
        out = []
        for x in clips:
            if len(x) == 0:
                out.append([{"label": "Silence", "score": 1.0}])
                continue
            energy = float(np.sqrt(np.mean(x.astype(np.float64) ** 2)))
            zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
            loud = min(energy * 20.0, 1.0)
            speechness = loud * float(np.exp(-((zcr - 0.1) ** 2) / 0.02))
            musicness = loud * float(np.exp(-((zcr - 0.45) ** 2) / 0.08))
            preds = [
                {"label": "Speech", "score": round(speechness, 6)},
                {"label": "Music", "score": round(musicness, 6)},
                {"label": "Silence", "score": round(1.0 - loud, 6)},
            ]
            preds.sort(key=lambda p: (-p["score"], p["label"]))
            out.append(preds[: self.top_k])
        return out


AC_MODEL_ID = "MIT/ast-finetuned-audioset-10-10-0.4593"  # audio_ac.py:37
AC_SR = 16_000  # the pipeline's expected rate (audio_ac.py:24)


def _load_hf_pipeline_fn():
    """The ONLY part of the HF backend that needs torch/transformers:
    build the audio-classification pipeline and return a callable
    `(clips16k: list[np.ndarray], sr) -> list[list[{label, score}]]`."""
    try:
        import transformers
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "HfAstClassifier requires torch+transformers; use "
            "FakeAcClassifier in environments without them"
        ) from e

    pipe = transformers.pipeline(  # pragma: no cover
        "audio-classification", model=AC_MODEL_ID
    )

    def pipeline_fn(clips, sr):  # pragma: no cover
        return pipe([np.asarray(c, dtype=np.float32) for c in clips])

    return pipeline_fn  # pragma: no cover


class HfAstClassifier:
    """HF AST classifier adapter (audio_ac.py:35-50). The payload
    shaping is real, offline-testable code: clips resample to the
    pipeline's 16 kHz (the reference's librosa.load(sr=16000),
    audio_ac.py:24), raw predictions normalize to sorted
    [{label, score}] lists (score desc, label asc tiebreak — the HF
    pipeline's own ordering). Only `pipeline_fn` — the model call —
    needs the libraries; inject a fake to test against recorded
    prediction JSON. The reference's gpu_lock (mp.py:5) maps to
    spark.task.resource.gpu.amount, not code."""

    def __init__(self, pipeline_fn=None, top_k: int | None = None) -> None:
        self._pipeline_fn = pipeline_fn or _load_hf_pipeline_fn()
        self.top_k = top_k

    def predict_batch(self, clips: list[np.ndarray], sr: int) -> list[list[dict]]:
        # High-quality sinc resample to the model rate — the fidelity
        # the reference gets from librosa in its AC preprocessing.
        from se_data_pipeline_spark.operators.audio import resample_sinc

        clips16 = [
            np.asarray(x, dtype=np.float32)
            if sr == AC_SR
            else resample_sinc(np.asarray(x, dtype=np.float32), sr, AC_SR)
            for x in clips
        ]
        raw = self._pipeline_fn(clips16, AC_SR)
        return [self._shape(p) for p in raw]

    def _shape(self, pred: list[dict]) -> list[dict]:
        out = sorted(
            (
                {"label": str(d["label"]), "score": float(d["score"])}
                for d in pred
            ),
            key=lambda d: (-d["score"], d["label"]),
        )
        return out[: self.top_k] if self.top_k else out


_PRED_SCHEMA_SUFFIX = "preds array<struct<label string, score double>>"


def gpu_classify_profile(
    gpus_per_task: float = 1.0,
    cpus_per_task: int = 1,
    executor_gpus: int = 1,
    executor_cores: int | None = None,
    discovery_script: str = "",
):
    """T6 as code: a stage-level ResourceProfile for the classify
    stage — the Spark replacement for the reference's process-wide
    GPU semaphore (mp.py:5, audio_ac.py:35-50). Attach it via
    classify_segments(..., profile=...): only the classify stage's
    tasks then demand `gpus_per_task` of the `gpu` resource, so the
    scheduler serializes GPU work per device cluster-wide while every
    other stage keeps full CPU parallelism — the semaphore's
    exclusion property, but elastic and per-stage instead of
    per-process.

    Requires a cluster manager with stage-level scheduling
    (YARN/k8s/standalone + dynamic allocation); local mode accepts
    the profile's construction but refuses execution, so tests assert
    the profile contents and the wiring, not a local run."""
    from pyspark.resource import (
        ExecutorResourceRequests,
        ResourceProfileBuilder,
        TaskResourceRequests,
    )

    treqs = (
        TaskResourceRequests()
        .cpus(cpus_per_task)
        .resource("gpu", gpus_per_task)
    )
    ereqs = ExecutorResourceRequests().resource(
        "gpu", executor_gpus, discoveryScript=discovery_script
    )
    if executor_cores is not None:
        ereqs = ereqs.cores(executor_cores)
    return ResourceProfileBuilder().require(treqs).require(ereqs).build

# Executor-side singleton cache: one backend instance per (executor,
# backend-class) — the Spark analog of the reference's module-level
# model global (audio_ac.py:35-40).
_BACKEND_SINGLETON: dict[str, AcBackend] = {}


def classify_segments(
    segments: DataFrame,
    backend_factory=FakeAcClassifier,
    audio_col: str = "audio",
    profile=None,
) -> DataFrame:
    """Append a `preds` column (array<struct<label,score>>) to segment
    rows by running the backend over decoded audio in Arrow batches.

    Batching: one predict_batch call per Arrow batch (the reference
    batched per video, audio_ac.py:43) — tune
    spark.sql.execution.arrow.maxRecordsPerBatch to the accelerator's
    optimal batch size. The backend is constructed lazily once per
    executor process, not per batch.

    `profile`: optional stage-level ResourceProfile (see
    gpu_classify_profile) scoping GPU demand to THIS stage only (T6).
    """
    out_schema = ", ".join(
        [f"{name} {dt.simpleString()}" for name, dt in zip(segments.schema.names, [f.dataType for f in segments.schema.fields])]
        + [_PRED_SCHEMA_SUFFIX]
    )
    cols = list(segments.columns)
    key = f"{backend_factory.__module__}.{backend_factory.__qualname__}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = _BACKEND_SINGLETON.get(key)
        if backend is None:
            backend = _BACKEND_SINGLETON.setdefault(key, backend_factory())
        for pdf in batches:
            clips, srs = [], []
            for data in pdf[audio_col]:
                if data is None:
                    clips.append(np.zeros(0, dtype=np.float32))
                    srs.append(16_000)
                else:
                    x, sr = decode_wav(bytes(data))
                    clips.append(x)
                    srs.append(sr)
            sr = srs[0] if srs else 16_000
            preds = backend.predict_batch(clips, sr)
            pdf = pdf.copy()
            pdf["preds"] = [
                [(p["label"], float(p["score"])) for p in plist] for plist in preds
            ]
            yield pdf[cols + ["preds"]]

    if profile is not None:
        return segments.mapInPandas(run, out_schema, profile=profile)
    return segments.mapInPandas(run, out_schema)
