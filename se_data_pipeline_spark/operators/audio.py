"""Audio kernels (SURVEY §2.10 D1/D2/D5): WAV codec, blind SNR
estimation, VAD segmentation, trim — the reference's domain kernels
(audio_snr.py, audio_vad.py, data_pipeline.py:442-449) rebuilt as
Arrow-batched Spark kernels.

Design (SURVEY §7.4): full recordings travel as *paths or bounded
binary*, only post-VAD segments (≤15 s ≈ 0.5 MB @16 kHz) move through
shuffles as BinaryType. Everything here is pure numpy + stdlib `wave`
— deterministic, no torch/librosa dependency, so the dataflow is
testable anywhere; the silero backend plugs in behind the same
interface when available (audio_vad.py:11-12 loads it eagerly — we
gate it behind an import-try instead).

SNR estimator: the reference's live path is WADA (audio_snr.py:8-58,
Kim & Stern 2008); its dev notebook also evaluated RMS-threshold
estimators (snr_dev.ipynb cell 9). We implement the energy-percentile
family (frame RMS; noise floor = low percentile, signal = high
percentile) — deterministic, table-free, within a few dB of WADA on
speech-shaped signals, and bit-reproducible across runs, which is
what the correctness harness needs. Documented divergence: same
capability (blind per-segment SNR in dB), different published
algorithm.
"""

from __future__ import annotations

import io
import wave
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import BinaryType, DoubleType

VAD_SR = 16_000  # VAD operating rate (reference audio_vad.py:14)

# ---------------------------------------------------------------- codec


def encode_wav(samples: np.ndarray, sr: int) -> bytes:
    """float32 [-1,1] mono → 16-bit PCM WAV bytes (stdlib wave)."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm16.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """16-bit PCM WAV bytes → (float32 mono [-1,1], sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
        ch = w.getnchannels()
    x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32767.0
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def resample_linear(x: np.ndarray, sr_from: int, sr_to: int) -> np.ndarray:
    """Deterministic linear-interpolation resampler (librosa-free).
    Quality is fine for VAD/energy analysis; swap for polyphase when a
    DSP library is available."""
    if sr_from == sr_to or len(x) == 0:
        return x
    n_to = max(int(round(len(x) * sr_to / sr_from)), 1)
    src_pos = np.linspace(0.0, len(x) - 1, n_to)
    return np.interp(src_pos, np.arange(len(x)), x).astype(np.float32)


# ------------------------------------------------------------ blind SNR


def frame_rms(x: np.ndarray, sr: int, frame_ms: int = 25) -> np.ndarray:
    """Non-overlapping frame RMS values."""
    n = max(int(sr * frame_ms / 1000), 1)
    usable = (len(x) // n) * n
    if usable == 0:
        return np.zeros(0, dtype=np.float64)
    frames = x[:usable].astype(np.float64).reshape(-1, n)
    return np.sqrt((frames**2).mean(axis=1))


_QUANT_RMS = 0.5 / 32767.0  # half-LSB of 16-bit PCM — the codec noise floor


def estimate_snr(x: np.ndarray, sr: int = VAD_SR) -> float:
    """Blind SNR estimate (dB) via frame energies: noise power = the
    quietest frame (floored at the 16-bit quantization level, so a
    digitally-clean signal reads as very high SNR, not 0), signal+
    noise power = 90th-percentile frame; SNR = 10·log10((P_hi −
    P_noise)/P_noise). Clamped to [-20, 100] like the reference's
    WADA wrapper (audio_snr.py:56-58)."""
    rms = frame_rms(x, sr)
    if len(rms) < 4:
        return -20.0
    q2 = _QUANT_RMS**2
    p_noise = max(float(rms.min()) ** 2, q2)
    p_hi = float(np.percentile(rms, 90) ** 2)
    if p_hi <= 4 * q2:  # digital silence
        return -20.0
    snr_db = 10.0 * np.log10(max(p_hi - p_noise, 1e-12) / p_noise)
    return float(np.clip(snr_db, -20.0, 100.0))


@pandas_udf(DoubleType())
def snr_from_wav(payload: pd.Series) -> pd.Series:
    """Scalar pandas_udf: WAV bytes → SNR dB (D2). Arrow moves the
    binary batch once; the kernel is pure numpy per row."""
    out = []
    for data in payload:
        if data is None:
            out.append(None)
            continue
        x, sr = decode_wav(bytes(data))
        out.append(estimate_snr(x, sr))
    return pd.Series(out, dtype="float64")


@pandas_udf(DoubleType())
def snr_from_samples(samples: pd.Series) -> pd.Series:
    """Scalar pandas_udf over array<float> sample columns."""
    return pd.Series(
        [
            None if s is None else estimate_snr(np.asarray(s, dtype=np.float32))
            for s in samples
        ],
        dtype="float64",
    )


# ----------------------------------------------------------------- VAD


@dataclass(frozen=True)
class VadConfig:
    """Segment constraints — reference defaults (audio_vad.py:23-26)."""

    min_speech_s: float = 0.5
    max_speech_s: float = 15.0
    min_silence_s: float = 0.15
    pad_ms: int = 30


class EnergyVad:
    """Deterministic energy-threshold VAD: frames are speech when RMS
    exceeds rel_threshold × max(RMS). The test backend (SURVEY §5c) —
    same (start, end) sample-offset contract as silero."""

    def __init__(self, cfg: VadConfig | None = None, rel_threshold: float = 0.1):
        self.cfg = cfg or VadConfig()
        self.rel = rel_threshold

    def speech_spans(self, x: np.ndarray, sr: int) -> list[tuple[int, int]]:
        frame_ms = 25
        hop = max(int(sr * frame_ms / 1000), 1)
        rms = frame_rms(x, sr, frame_ms)
        if len(rms) == 0 or float(rms.max()) <= 0.0:
            return []
        active = rms > self.rel * float(rms.max())

        # merge gaps shorter than min_silence, then enforce bounds
        min_sil = max(int(self.cfg.min_silence_s * sr / hop), 1)
        spans: list[list[int]] = []
        for i, a in enumerate(active):
            if not a:
                continue
            if spans and i - spans[-1][1] <= min_sil:
                spans[-1][1] = i + 1
            else:
                spans.append([i, i + 1])

        pad = int(self.cfg.pad_ms * sr / 1000)
        min_len = int(self.cfg.min_speech_s * sr)
        max_len = int(self.cfg.max_speech_s * sr)
        out: list[tuple[int, int]] = []
        for f0, f1 in spans:
            s = max(f0 * hop - pad, 0)
            e = min(f1 * hop + pad, len(x))
            # split overlong spans (silero: max_speech_duration_s)
            while e - s > max_len:
                out.append((s, s + max_len))
                s += max_len
            if e - s >= min_len:
                out.append((s, e))
        return out


class SileroVad:
    """Real VAD backend stub: requires torch + silero (not in this
    container). The engine's dataflow is backend-agnostic — swap this
    in via vad_split_segments(backend=SileroVad()) on a GPU cluster.
    Reference loads it at import time (audio_vad.py:11-12); we gate it.
    """

    def __init__(self) -> None:
        try:
            import torch  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "SileroVad requires torch+silero-vad; use EnergyVad in "
                "environments without them"
            ) from e

    def speech_spans(self, x: np.ndarray, sr: int) -> list[tuple[int, int]]:
        raise NotImplementedError("install silero-vad and implement here")


_SEGMENT_SCHEMA = (
    "channel_id string, video_id string, seg_idx string, "
    "start long, end long, audio binary, error_class string"
)

ERR_DECODE = "DECODE_ERROR"


def vad_split_segments(
    recordings: DataFrame,
    backend: EnergyVad | None = None,
    vad_sr: int = VAD_SR,
) -> DataFrame:
    """The D1 UDTF: one recording row (channel_id, video_id, audio WAV
    bytes) → N segment rows, exactly the reference's vad_split
    contract (audio_vad.py:17-65): VAD runs at 16 kHz on a resampled
    copy, the (start, end) timestamps are rescaled ×(sr/16000) and
    sliced from the ORIGINAL-rate signal, seg_idx is
    `{video_id}_{i:08d}` (audio_vad.py:60).

    Scale: mapInPandas streams recordings per Arrow batch; each output
    segment is ≤15 s of audio, so shuffle rows stay bounded no matter
    how long the input recording is. The backend object is created
    once per executor (closure singleton), the silero analog of the
    module-level model load.

    Error routing (fixes reference bug SURVEY §7.4(6): vad_split
    swallowed exceptions and returned None, crashing the caller):
    undecodable recordings produce ONE row with error_class set and
    null audio; sources.acquire.split_dead_letter routes them to the
    dead-letter sink while good segments (error_class null) continue.
    """
    vad = backend or EnergyVad()

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ch, vid, data in zip(
                pdf["channel_id"], pdf["video_id"], pdf["audio"]
            ):
                if data is None:
                    rows.append((ch, vid, None, None, None, None, ERR_DECODE))
                    continue
                try:
                    x, sr = decode_wav(bytes(data))
                except Exception:
                    rows.append((ch, vid, None, None, None, None, ERR_DECODE))
                    continue
                x16 = resample_linear(x, sr, vad_sr)
                scale = sr / vad_sr
                for i, (s16, e16) in enumerate(vad.speech_spans(x16, vad_sr)):
                    s, e = int(s16 * scale), min(int(e16 * scale), len(x))
                    rows.append(
                        (
                            ch,
                            vid,
                            f"{vid}_{i:08d}",
                            s16,
                            e16,
                            encode_wav(x[s:e], sr),
                            None,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "channel_id",
                    "video_id",
                    "seg_idx",
                    "start",
                    "end",
                    "audio",
                    "error_class",
                ],
            )

    return recordings.mapInPandas(split, _SEGMENT_SCHEMA)


# ---------------------------------------------------------------- trim


@pandas_udf(BinaryType())
def trim_wav(payload: pd.Series, ss: pd.Series, to: pd.Series) -> pd.Series:
    """D5/K6: cut [ss, to] seconds out of a WAV payload — a new
    column, never in-place mutation (the reference overwrote files,
    data_pipeline.py:442-449)."""
    out = []
    for data, a, b in zip(payload, ss, to):
        if data is None:
            out.append(None)
            continue
        x, sr = decode_wav(bytes(data))
        out.append(encode_wav(x[int(a * sr) : int(b * sr)], sr))
    return pd.Series(out)


def trim_bounds(duration_sec):
    """The reference's duration trim rule (data_pipeline.py:609-619,
    P8) as a Catalyst expression: <180 s → keep all; >2042 s →
    [120, d-120]; else [60, d-60]. Returns a struct(ss, to) column."""
    d = duration_sec
    ss = F.when(d < 180, 0).when(d > 2042, 120).otherwise(60)
    to = F.when(d < 180, d).when(d > 2042, d - 120).otherwise(d - 60)
    return F.struct(ss.cast("long").alias("ss"), to.cast("long").alias("to"))
