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
from se_data_pipeline_spark.sources.acquire import (
    ERR_DOWNLOAD,
    ERR_NO_OUTPUT,
    ERR_OFFLINE,
    ERR_PREMIERE,
    AcquireError,
    YtDlpBackend,
    classify_download_result,
    classify_yt_stderr,
    fetch_playlists,
    formats_have_48k_audio,
    parse_playlist_ids,
    probe_videos,
    yt_download_argv,
    yt_duration_argv,
    yt_formats_argv,
    yt_playlist_argv,
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


# ----------------------------------------------------------------- yt-dlp


class _Result:
    def __init__(self, returncode=0, stdout="", stderr=""):
        self.returncode = returncode
        self.stdout = stdout
        self.stderr = stderr


class _FakeRunner:
    """Records argv; replays recorded stdout/stderr per subcommand."""

    def __init__(self, results):
        self.results = list(results)
        self.argvs = []

    def __call__(self, argv):
        self.argvs.append(argv)
        return self.results.pop(0)


def test_yt_playlist_argv_matches_reference():
    """yt_download.py:15 builds exactly this flat-playlist command."""
    assert yt_playlist_argv("https://www.youtube.com/@chan") == [
        "yt-dlp", "--flat-playlist", "--print", "id",
        "https://www.youtube.com/@chan",
    ]


def test_yt_download_argv_matches_reference():
    """yt_download.py:96-117: bestaudio -> wav at 48 kHz mono, output
    templated by video id."""
    url = "https://www.youtube.com/watch?v=TQkOB9uMtdw"
    assert yt_download_argv(url, "/tmp/out") == [
        "yt-dlp", "-f", "bestaudio", "--extract-audio",
        "--audio-format", "wav", "--audio-quality", "0",
        "--postprocessor-args", "-ar 48000 -ac 1",
        "-o", "/tmp/out/TQkOB9uMtdw.%(ext)s", url,
    ]


def test_yt_download_argv_clip_window():
    """ss/to insert the ffmpeg downloader-args clause
    (yt_download.py:105-109)."""
    argv = yt_download_argv("u?v=x", "/tmp/out", ss=0, to=600)
    i = argv.index("--external-downloader-args")
    assert argv[i + 1] == 'ffmpeg:"-ss 0 -to 600"'
    assert argv[-1] == "u?v=x"


def test_yt_download_argv_strict_clip_is_working_form():
    """strict_clip=True drops the reference's embedded quotes so
    yt-dlp shlex-splits a VALID ffmpeg -ss/-to pair; the default
    stays byte-identical to the reference (argv parity)."""
    argv = yt_download_argv("u?v=x", "/tmp/out", ss=0, to=600, strict_clip=True)
    i = argv.index("--external-downloader-args")
    assert argv[i + 1] == "ffmpeg:-ss 0 -to 600"
    # default unchanged — parity pinned by test_yt_download_argv_clip_window
    default = yt_download_argv("u?v=x", "/tmp/out", ss=0, to=600)
    assert default[default.index("--external-downloader-args") + 1] == (
        'ffmpeg:"-ss 0 -to 600"'
    )


def test_parse_playlist_ids_drops_blanks():
    assert parse_playlist_ids("a1\n\nb2\nc3\n") == ["a1", "b2", "c3"]


def test_formats_table_48k_detection():
    """-F table parsing (yt_download.py:43-49): audio-only AND 48k."""
    table_48k = (
        "ID  EXT RESOLUTION\n"
        "249 webm audio only 2ch 50k opus 48000Hz\n"
        "602 mp4 256x144 30fps\n"
    )
    table_44k = "140 m4a audio only 2ch 129k mp4a 44100Hz\n"
    video_only = "602 mp4 256x144 48k video only\n"
    assert formats_have_48k_audio(table_48k) is True
    assert formats_have_48k_audio(table_44k) is False
    assert formats_have_48k_audio(video_only) is False


def test_formats_table_48k_strict_rejects_bitrate_token():
    """The documented parity bug: a 44.1 kHz stream at 48 kbps
    matches the bare '48k' substring. Default keeps reference
    behavior (false positive); strict=True anchors on the
    sample-rate token and rejects it."""
    bitrate_4448 = "250 webm audio only 2ch 48k opus 44100Hz\n"
    assert formats_have_48k_audio(bitrate_4448) is True  # parity bug
    assert formats_have_48k_audio(bitrate_4448, strict=True) is False
    real_48k = "249 webm audio only 2ch 50k opus 48000Hz\n"
    assert formats_have_48k_audio(real_48k, strict=True) is True
    khz_form = "249 webm audio only 2ch 50k opus 48kHz\n"
    assert formats_have_48k_audio(khz_form, strict=True) is True


def test_stderr_taxonomy_recorded_fixtures():
    """Recorded stderr lines (yt_download.py:120-129) route to the
    typed classes."""
    assert (
        classify_yt_stderr("ERROR: [youtube] TQkOB9uMtdw: Premieres in 9 hours\n")
        == ERR_PREMIERE
    )
    assert classify_yt_stderr("ERROR: [youtube] abc: Offline\n") == ERR_OFFLINE
    assert (
        classify_yt_stderr("This live event will begin in a few moments\n")
        == ERR_OFFLINE
    )
    assert classify_yt_stderr("ERROR: [youtube] xyz: Video unavailable\n") == ERR_DOWNLOAD


def test_classify_download_result_no_output_file():
    """rc=0 but missing .wav -> NO_OUTPUT_FILE (yt_download.py:132-134)."""
    assert classify_download_result(0, "", output_exists=False) == ERR_NO_OUTPUT
    assert classify_download_result(0, "", output_exists=True) is None
    assert classify_download_result(1, "x Premieres y", True) == ERR_PREMIERE


def test_ytdlp_backend_playlist_and_duration():
    runner = _FakeRunner([
        _Result(stdout="vidA\nvidB\n"),
        _Result(stdout="1234.0\n"),
    ])
    be = YtDlpBackend(runner=runner)
    assert be.playlist_ids("https://www.youtube.com/@c") == ["vidA", "vidB"]
    assert be.video_duration_sec("u?v=vidA") == 1234
    assert runner.argvs[0][:4] == ["yt-dlp", "--flat-playlist", "--print", "id"]
    assert runner.argvs[1] == yt_duration_argv("u?v=vidA")


def test_ytdlp_backend_error_class_probe():
    runner = _FakeRunner([
        _Result(returncode=1, stderr="ERROR: Premieres in 2 hours"),
        _Result(returncode=0, stdout="249 webm audio only 48000Hz"),
    ])
    be = YtDlpBackend(runner=runner)
    assert be.error_class("u?v=a") == ERR_PREMIERE
    assert be.error_class("u?v=b") is None
    assert runner.argvs[0] == yt_formats_argv("u?v=a")


def test_ytdlp_backend_download_success_and_typed_failure(tmp_path):
    out = str(tmp_path)

    class _TouchRunner(_FakeRunner):
        def __call__(self, argv):
            # simulate yt-dlp writing the postprocessed wav
            (tmp_path / "vidZ.wav").write_bytes(b"RIFF")
            return super().__call__(argv)

    be = YtDlpBackend(runner=_TouchRunner([_Result()]))
    path = be.download_audio("https://www.youtube.com/watch?v=vidZ", out)
    assert path.endswith("vidZ.wav")

    be2 = YtDlpBackend(runner=_FakeRunner([_Result(returncode=1, stderr="Offline")]))
    with pytest.raises(AcquireError) as ei:
        be2.download_audio("u?v=vidQ", out)
    assert ei.value.error_class == ERR_OFFLINE

    # rc=0 with no file -> NO_OUTPUT_FILE
    be3 = YtDlpBackend(runner=_FakeRunner([_Result()]))
    with pytest.raises(AcquireError) as ei:
        be3.download_audio("u?v=vidMissing", out)
    assert ei.value.error_class == ERR_NO_OUTPUT


def test_ytdlp_backend_drives_fetch_and_probe_stages(spark):
    """The real adapter (with a recorded-fixture runner) slots into the
    Spark acquire stages exactly like FakeAcquireBackend does."""
    from pyspark.sql import Row

    from types import SimpleNamespace

    def _per_url_runner(argv):
        # SimpleNamespace keeps the closure executor-picklable (the
        # test module itself is not importable on executors)
        if "--flat-playlist" in argv:
            return SimpleNamespace(returncode=0, stdout="v001\nv002\n", stderr="")
        url = argv[-1]
        if "v001" in url:
            return SimpleNamespace(returncode=0, stdout="90.0\n", stderr="")
        return SimpleNamespace(
            returncode=1, stdout="", stderr="ERROR: x: Premieres in 1 hour"
        )

    be = YtDlpBackend(runner=_per_url_runner)
    chans = spark.createDataFrame([Row(id="c1", url="https://www.youtube.com/@c1")])
    vids = fetch_playlists(chans, be)
    rows = {r["video_id"]: r for r in probe_videos(vids, be).collect()}
    assert set(rows) == {"v001", "v002"}
    assert rows["v001"]["duration_sec"] == 90
    assert rows["v001"]["error_class"] is None
    assert rows["v002"]["error_class"] == ERR_PREMIERE


def test_probe_videos_dead_letters_per_video_probe_failures(spark):
    """A per-video failure inside the duration probe (AcquireError on
    non-zero exit, or ValueError when yt-dlp prints 'NA' for a live
    stream whose -F probe succeeds) must dead-letter THAT row — error
    class set, duration null — not crash the whole Spark task (T4)."""
    from pyspark.sql import Row
    from types import SimpleNamespace

    def _runner(argv):
        url = argv[-1]
        if argv[1] == "-F":  # fetchability probe: everything looks fine
            return SimpleNamespace(
                returncode=0,
                stdout="251 webm audio only 2 [en] opus 48000Hz\n",
                stderr="",
            )
        # duration probe
        if "vOK" in url:
            return SimpleNamespace(returncode=0, stdout="90.0\n", stderr="")
        if "vNA" in url:  # live stream: duration prints 'NA'
            return SimpleNamespace(returncode=0, stdout="NA\n", stderr="")
        return SimpleNamespace(
            returncode=1, stdout="", stderr="ERROR: boom: Offline"
        )

    be = YtDlpBackend(runner=_runner)
    vids = spark.createDataFrame(
        [
            Row(channel_id="c", video_id="vOK", position=0),
            Row(channel_id="c", video_id="vNA", position=1),
            Row(channel_id="c", video_id="vERR", position=2),
        ]
    )
    rows = {r["video_id"]: r for r in probe_videos(vids, be).collect()}
    assert rows["vOK"]["duration_sec"] == 90
    assert rows["vOK"]["error_class"] is None
    assert rows["vNA"]["duration_sec"] is None
    assert rows["vNA"]["error_class"] == ERR_DOWNLOAD
    assert rows["vERR"]["duration_sec"] is None
    assert rows["vERR"]["error_class"] == ERR_OFFLINE


def test_gpu_classify_profile_contents_and_wiring(spark, monkeypatch):
    """T6 done-criterion (VERDICT r4/r5): the stage-level
    ResourceProfile carries the requested task/executor GPU amounts,
    and classify_segments(..., profile=p) threads exactly that
    profile into its mapInPandas stage."""
    from pyspark.sql import Row

    from se_data_pipeline_spark.operators.audio import encode_wav
    from se_data_pipeline_spark.operators.classify import (
        FakeAcClassifier,
        classify_segments,
        gpu_classify_profile,
    )

    p = gpu_classify_profile(
        gpus_per_task=0.5,
        cpus_per_task=2,
        executor_gpus=2,
        executor_cores=8,
        discovery_script="/opt/getGpus.sh",
    )
    tr = p.taskResources
    assert tr["gpu"].amount == 0.5
    assert tr["cpus"].amount == 2.0
    er = p.executorResources
    assert er["gpu"].amount == 2
    assert er["gpu"].discoveryScript == "/opt/getGpus.sh"
    assert er["cores"].amount == 8

    # Wiring: capture the profile kwarg at the mapInPandas seam (local
    # mode accepts profile construction but refuses execution, so the
    # spy substitutes a profile-less stage after asserting the wiring).
    seg = spark.createDataFrame(
        [Row(seg_idx="s0", audio=encode_wav(np.zeros(160, "f4"), 16_000))]
    )
    seen = {}
    cls = type(seg)  # the concrete (classic/connect) DataFrame class
    orig = cls.mapInPandas

    def spy(self, func, schema, barrier=False, profile=None):
        seen["profile"] = profile
        return orig(self, func, schema, barrier=barrier)

    monkeypatch.setattr(cls, "mapInPandas", spy)
    out = classify_segments(seg, FakeAcClassifier, profile=p)
    assert seen["profile"] is p
    assert out.collect()[0]["preds"]  # stage still runs sans profile
