"""Acquire connectors (SURVEY §2.1 S7-S11): the external-world fetch
stage — playlist listing, audio download, metadata/format probes —
behind pluggable backends with a typed error taxonomy and dead-letter
routing (T4).

The real backend (YtDlpBackend) shells out to yt-dlp exactly as the
reference does (yt_download.py, test2.py): argv construction, stdout
parsing and the stderr->error-class taxonomy are pure functions
tested against recorded fixtures; only the subprocess call itself
needs the binary + network (injectable runner). The deterministic
fakes generate stable synthetic data from key hashes, so every
downstream operator is testable.

Execution-model decisions (SURVEY §4.1 "acquire barrier"):
- fetch UDFs are marked asNondeterministic() so Catalyst neither
  reorders them before cheap filters nor re-executes them;
- acquire outputs should be checkpointed (written to storage) before
  expensive reuse — network results are not replayable.
"""

from __future__ import annotations

import hashlib
import os
import re
import subprocess
from typing import Callable, Protocol

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Typed error classes (yt_download.py:120-129).
ERR_PREMIERE = "PREMIERE_VIDEO"
ERR_OFFLINE = "OFFLINE_VIDEO"
ERR_NO_OUTPUT = "NO_OUTPUT_FILE"
ERROR_CLASSES = (ERR_PREMIERE, ERR_OFFLINE, ERR_NO_OUTPUT)
# Unclassified non-zero exit (the reference re-raises the raw stderr,
# yt_download.py:130): typed here so dead-letter routing still works.
ERR_DOWNLOAD = "DOWNLOAD_ERROR"


class PlaylistBackend(Protocol):
    def playlist_ids(self, channel_url: str) -> list[str]:
        """S8: channel URL → ordered video ids."""
        ...


class ProbeBackend(Protocol):
    def video_duration_sec(self, video_url: str) -> int:
        """S10: metadata probe."""
        ...

    def error_class(self, video_url: str) -> str | None:
        """S9 failure taxonomy: None = fetchable."""
        ...


def _stable_int(key: str, mod: int) -> int:
    """Deterministic pseudo-random int from a key (md5-based, seed-free
    and platform-stable — NOT Python's randomized hash())."""
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big") % mod


class FakeAcquireBackend:
    """Deterministic synthetic backend: per-channel video count and
    per-video durations/errors derive from md5 of the ids. Mirrors the
    reference's observable behaviors: variable playlist sizes, a few
    premiere/offline videos, durations spanning every trim-rule branch.
    """

    def __init__(self, max_videos: int = 80, error_rate_pct: int = 6):
        self.max_videos = max_videos
        self.error_rate_pct = error_rate_pct

    def playlist_ids(self, channel_url: str) -> list[str]:
        n = 5 + _stable_int(channel_url, self.max_videos - 4)
        cid = channel_url.rsplit("/", 1)[-1]
        return [f"{cid[:6]}v{i:05d}" for i in range(n)]

    def video_duration_sec(self, video_url: str) -> int:
        # spread over [30, 3030) so <180 / 180-2042 / >2042 all occur
        return 30 + _stable_int(video_url + ":d", 3000)

    def error_class(self, video_url: str) -> str | None:
        r = _stable_int(video_url + ":e", 100)
        if r < self.error_rate_pct // 2:
            return ERR_PREMIERE
        if r < self.error_rate_pct:
            return ERR_OFFLINE
        return None


# -------------------------------------------------- yt-dlp adapter
# Real transport code for S8-S11, structured like the silero
# (operators/audio.py SileroVad) and HF (operators/classify.py
# HfAstClassifier) adapters: argv construction + output parsing +
# stderr->error-class mapping are pure functions testable against
# recorded fixtures; only the subprocess execution itself needs the
# yt-dlp binary + network (injectable `runner`, default
# subprocess.run).


def yt_playlist_argv(channel_url: str) -> list[str]:
    """Flat-playlist id listing command (yt_download.py:15)."""
    return ["yt-dlp", "--flat-playlist", "--print", "id", channel_url]


def yt_formats_argv(video_url: str) -> list[str]:
    """Format-table probe command (yt_download.py:32)."""
    return ["yt-dlp", "-F", video_url]


def yt_duration_argv(video_url: str) -> list[str]:
    """Metadata-only duration probe. The reference uses the yt_dlp
    Python API's extract_info(download=False)['duration']
    (yt_download.py:72-77); the CLI equivalent keeps this adapter
    binary-only and runner-injectable."""
    return ["yt-dlp", "--skip-download", "--print", "duration", video_url]


def yt_download_argv(
    video_url: str,
    output_dir: str = "./",
    ss: float | None = None,
    to: float | None = None,
    strict_clip: bool = False,
) -> list[str]:
    """Audio-download command, argument-for-argument the reference's
    (yt_download.py:96-117): bestaudio -> wav, resampled to 48 kHz
    mono by the ffmpeg postprocessor, optional ffmpeg [ss, to) clip
    window, id-templated output path.

    strict_clip=True emits a WORKING clip window
    (``ffmpeg:-ss {ss} -to {to}``, no embedded quotes) instead of the
    reference's bug-compatible quoted form — opt in when you want the
    clip to actually apply rather than argv parity."""
    video_id = video_url.split("v=")[-1]
    output_template = os.path.join(output_dir, f"{video_id}.%(ext)s")
    command = [
        "yt-dlp",
        "-f",
        "bestaudio",
        "--extract-audio",
        "--audio-format",
        "wav",
        "--audio-quality",
        "0",
        "--postprocessor-args",
        "-ar 48000 -ac 1",
    ]
    if ss is not None and to is not None:
        if strict_clip:
            clip = f"ffmpeg:-ss {ss} -to {to}"
        else:
            # Reference-parity quirk (yt_download.py:112-114): the
            # inner quotes are embedded verbatim in the argv element.
            # Since argv bypasses the shell, yt-dlp shlex-splits the
            # value into one malformed ffmpeg token and the clip
            # window is silently ignored — the reference downloads
            # full videos and trims afterwards (K6), which is why
            # this never surfaced. Kept byte-identical for
            # argv-parity; pass strict_clip=True for a working
            # window.
            clip = f'ffmpeg:"-ss {ss} -to {to}"'
        command.extend(["--external-downloader-args", clip])
    command.extend(["-o", output_template, video_url])
    return command


def parse_playlist_ids(stdout: str) -> list[str]:
    """One id per stdout line, blanks dropped (yt_download.py:23-24)."""
    return [vid for vid in stdout.strip().split("\n") if vid]


def formats_have_48k_audio(stdout: str, strict: bool = False) -> bool:
    """True iff the -F table lists an audio-only format at 48 kHz
    (yt_download.py:43-49).

    Fidelity note (reference parity, default bug-compatible): the
    bare '48k' substring also matches a 48 kbps *bitrate* token
    (yt-dlp prints e.g. 'audio only ... 48k ... 44100Hz'), so a
    44.1 kHz stream at 48 kbps false-positively reports 48 kHz. The
    reference makes the same check. strict=True anchors on the
    sample-rate column instead (``48000Hz`` / ``48kHz`` tokens) —
    opt in for a correct probe at the cost of parity."""
    if strict:
        sr = re.compile(r"\b(?:48000Hz|48kHz)\b")
        return any(
            "audio only" in line and sr.search(line)
            for line in stdout.splitlines()
        )
    return any(
        "audio only" in line and ("48000Hz" in line or "48k" in line)
        for line in stdout.splitlines()
    )


def classify_yt_stderr(stderr: str) -> str:
    """Map yt-dlp stderr to the typed error taxonomy
    (yt_download.py:120-130), e.g.
    'ERROR: [youtube] TQkOB9uMtdw: Premieres in 9 hours'."""
    if "Premiere" in stderr:  # covers "Premieres in N hours" too
        return ERR_PREMIERE
    if "Offline" in stderr or "This live event will begin in a few moments" in stderr:
        return ERR_OFFLINE
    return ERR_DOWNLOAD


def classify_download_result(
    returncode: int, stderr: str, output_exists: bool
) -> str | None:
    """Full download outcome -> error class; None = success. A zero
    exit without the expected .wav is NO_OUTPUT_FILE
    (yt_download.py:132-134)."""
    if returncode != 0:
        return classify_yt_stderr(stderr)
    if not output_exists:
        return ERR_NO_OUTPUT
    return None


class AcquireError(Exception):
    """Typed acquire failure; .error_class feeds dead-letter routing
    (T4), .stderr keeps the raw transcript for the dead-letter row."""

    def __init__(self, error_class: str, stderr: str = ""):
        super().__init__(error_class)
        self.error_class = error_class
        self.stderr = stderr


class YtDlpBackend:
    """Real S8-S11 backend (yt_download.py:14-28,82-136): shells out
    to yt-dlp. `runner` has the subprocess.run(argv, ...) contract and
    defaults to it; tests inject a fake returning recorded
    stdout/stderr so every code path here runs without network."""

    def __init__(self, runner: Callable | None = None):
        self._run = runner if runner is not None else self._subprocess_run

    @staticmethod
    def _subprocess_run(argv: list[str]):  # pragma: no cover - needs binary
        return subprocess.run(
            argv, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True
        )

    # PlaylistBackend
    def playlist_ids(self, channel_url: str) -> list[str]:
        result = self._run(yt_playlist_argv(channel_url))
        if result.returncode != 0:
            raise AcquireError(classify_yt_stderr(result.stderr), result.stderr)
        return parse_playlist_ids(result.stdout)

    # ProbeBackend
    def video_duration_sec(self, video_url: str) -> int:
        result = self._run(yt_duration_argv(video_url))
        if result.returncode != 0:
            raise AcquireError(classify_yt_stderr(result.stderr), result.stderr)
        return int(float(result.stdout.strip()))

    def error_class(self, video_url: str) -> str | None:
        """Probe fetchability via the format table: a failing -F call
        is classified; a succeeding one means downloadable."""
        result = self._run(yt_formats_argv(video_url))
        if result.returncode != 0:
            return classify_yt_stderr(result.stderr)
        return None

    # S11 format probe
    def has_48k_audio(self, video_url: str) -> bool:
        result = self._run(yt_formats_argv(video_url))
        if result.returncode != 0:
            return False
        return formats_have_48k_audio(result.stdout)

    # S9 download kernel
    def download_audio(
        self,
        video_url: str,
        output_dir: str = "./",
        ss: float | None = None,
        to: float | None = None,
    ) -> str:
        """Fetch bestaudio as 48 kHz mono wav; returns the output path
        or raises a typed AcquireError (yt_download.py:118-136)."""
        os.makedirs(output_dir, exist_ok=True)
        video_id = video_url.split("v=")[-1]
        output_file = os.path.join(output_dir, f"{video_id}.wav")
        result = self._run(yt_download_argv(video_url, output_dir, ss=ss, to=to))
        err = classify_download_result(
            result.returncode, result.stderr, os.path.exists(output_file)
        )
        if err is not None:
            raise AcquireError(err, result.stderr)
        return output_file


def fetch_playlists(channels: DataFrame, backend: PlaylistBackend) -> DataFrame:
    """S8 as an acquire stage: channels(url, id) → one row per video
    (channel_id, video_id, position), via a non-deterministic
    array-returning UDF + posexplode (SURVEY S8).

    Partitioning: the fetch runs one task per channel partition —
    exactly the reference's process-per-channel fan-out
    (data_pipeline.py:774) but elastic. The UDF is nondeterministic →
    Catalyst keeps it after pushed-down channel filters and never
    double-fetches."""

    @pandas_udf(ArrayType(StringType()))
    def _ids(urls: pd.Series) -> pd.Series:
        return pd.Series([backend.playlist_ids(u) for u in urls])

    ids_udf = _ids.asNondeterministic()
    return (
        channels.select(F.col("id").alias("channel_id"), "url")
        .withColumn("video_ids", ids_udf("url"))
        .select(
            "channel_id",
            F.posexplode("video_ids").alias("position", "video_id"),
        )
        .select("channel_id", "video_id", F.col("position").cast("int"))
    )


_PROBE_SCHEMA = StructType(
    [
        StructField("duration_sec", IntegerType()),
        StructField("error_class", StringType()),
    ]
)


def probe_videos(videos: DataFrame, backend: ProbeBackend) -> DataFrame:
    """S9/S10/S11 acquire stage: append duration + error_class per
    video in one fetch pass (struct-returning nondeterministic UDF —
    one network round per row, not two)."""

    @pandas_udf(_PROBE_SCHEMA)
    def _probe(video_ids: pd.Series) -> pd.DataFrame:
        durs, errs = [], []
        for vid in video_ids:
            url = f"https://www.youtube.com/watch?v={vid}"
            err = backend.error_class(url)
            dur = None
            if err is None:
                # A per-video probe failure must dead-letter the ROW,
                # not crash the task (T4): the real YtDlpBackend raises
                # AcquireError on non-zero exit, and int(float(...))
                # raises ValueError when yt-dlp prints 'NA' for a
                # missing duration (e.g. live streams whose -F probe
                # succeeds).
                try:
                    dur = backend.video_duration_sec(url)
                except AcquireError as exc:
                    err = exc.error_class
                except ValueError:
                    err = ERR_DOWNLOAD
            errs.append(err)
            durs.append(dur)
        return pd.DataFrame({"duration_sec": durs, "error_class": errs})

    probe_udf = _probe.asNondeterministic()
    return videos.withColumn("probe", probe_udf("video_id")).select(
        *videos.columns,
        F.col("probe.duration_sec").alias("duration_sec"),
        F.col("probe.error_class").alias("error_class"),
    )


def split_dead_letter(
    df: DataFrame, error_col: str = "error_class"
) -> tuple[DataFrame, DataFrame]:
    """T4: route typed failures out of the main flow. Returns
    (ok, dead) — dead keeps every column plus the error class, ready
    for an append-mode JSON sink (the reference's err.jsonl /
    skipped_channels.txt, filter_channel.py:59-63)."""
    ok = df.filter(F.col(error_col).isNull()).drop(error_col)
    dead = df.filter(F.col(error_col).isNotNull())
    return ok, dead
