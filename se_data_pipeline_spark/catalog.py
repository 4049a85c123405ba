"""Typed schema registry + table loaders.

The reference (SURVEY §1.3) had implicit/inferred schemas everywhere
("N/A" strings for nulls, pandas dtype inference). The engine declares
every schema explicitly: typed nulls, no inference in production paths.

Two table families:

- RELATIONAL: the driver-provided TPC-H-ish parquet tables
  (/root/testdata/sf*/..., see TESTDATA.md). Parquet carries its own
  schema; we still declare the expected StructTypes for validation.

- DOMAIN: the reference's own data model (channels / channel_quality /
  videos / segments / ledger — SURVEY §1.1, FIXTURES.md §A), used by
  the plans/ pipelines and their tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Relational tables (driver-provided parquet)
# --------------------------------------------------------------------------

RELATIONAL_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Declared column contracts (name:type DDL) — the engine's typed view
# of the driver tables. validate_table() checks a scan against these;
# queries rely on exactly these names/types.
RELATIONAL_SCHEMAS: dict[str, str] = {
    "region": "r_regionkey int, r_name string",
    "nation": "n_nationkey int, n_name string, n_regionkey int",
    "customer": (
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string"
    ),
    "supplier": "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    "part": (
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double"
    ),
    "orders": (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
    ),
    "lineitem": (
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp_ntz"
    ),
    "events": (
        "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
        "value double, props string"
    ),
    "documents": (
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ),
    "embeddings": "vec_id bigint, embedding array<float>, label int",
}


def validate_table(df: DataFrame, name: str) -> None:
    """Assert a loaded table matches its declared contract — fail fast
    at plan time instead of mid-query on a drifted input."""
    expected = T._parse_datatype_string(RELATIONAL_SCHEMAS[name])
    actual = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in df.schema.fields]
    )
    declared = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in expected.fields]
    )
    if actual != declared:
        raise ValueError(
            f"table {name!r} drifted from contract:\n"
            f"  declared: {declared.simpleString()}\n"
            f"  actual:   {actual.simpleString()}"
        )


# events.ts physical-form probe cache: path -> (file fingerprint,
# form). Keyed on the probed file's (path, mtime, size) — NOT path
# alone — so a table rewritten in place with the other precision
# (compaction/replica flows writing real timestamps over a nanos
# original) invalidates the entry instead of applying a stale read
# schema (ADVICE r6). See load_table.
_EVENTS_TS_FORM: dict[str, tuple[tuple, str]] = {}


def _events_probe_target(path: str) -> str | None:
    """The concrete parquet file whose footer decides the ts form."""
    import glob

    if not os.path.isdir(path):
        return path
    # Spark-written tables are DIRECTORIES of part files (the
    # hostile-corpus fixtures, scale replicas); the driver testdata
    # ships single files. Probe the first part file.
    parts = sorted(
        glob.glob(os.path.join(path, "part-*"))
        + glob.glob(os.path.join(path, "*.parquet"))
    )
    return parts[0] if parts else None


def _events_ts_form(path: str) -> str:
    """'nanos' | 'us': which physical form this events.parquet ships
    ts in. Probed with a pyarrow footer read — pure driver-side
    metadata, no Spark job (keeping plan construction job-free for
    the eager-audit gate). The footer read is cached per file
    fingerprint; the stat/glob re-runs per call, which is the cost
    of staying correct under in-place rewrites and is negligible
    next to plan construction."""
    import pyarrow.parquet as pq

    target = _events_probe_target(path)
    if target is None:
        return "us"  # no part files: nothing to read either way
    try:
        st = os.stat(target)
        fingerprint = (target, st.st_mtime_ns, st.st_size)
    except OSError:
        fingerprint = (target, None, None)
    cached = _EVENTS_TS_FORM.get(path)
    if cached is not None and cached[0] == fingerprint:
        return cached[1]
    t = pq.read_schema(target).field("ts").type
    form = "nanos" if getattr(t, "unit", None) == "ns" else "us"
    _EVENTS_TS_FORM[path] = (fingerprint, form)
    return form


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver parquet table WITH its declared schema.
    Passing the explicit schema (RELATIONAL_SCHEMAS) instead of
    inferring does two things that matter:

    - scale: no footer-sampling at plan time — on a multi-million-
      file 100 TB table, schema inference is a real driver cost;
    - auditability: plan construction runs ZERO Spark jobs, so
      tools/plan_audit.py's eager-collect hard gate (any job at plan
      build fails) stays strict — the inference job used to fire once
      per scan and would have drowned real eager-collect signals.

    Parquet scans still get predicate pushdown + column pruning from
    Catalyst automatically.

    `events.ts` has shipped in two physical forms across testdata
    generations: parquet TIMESTAMP(NANOS) (rejected by Spark unless
    read as long via the legacy conf, then rebuilt at microsecond
    precision — exactly DuckDB's truncation) and plain timestamp[us]
    with no zone (read natively as TIMESTAMP_NTZ). A cached pyarrow
    footer probe (driver-side, jobless) picks the right read schema.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        if _events_ts_form(path) == "nanos":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            nanos_ddl = RELATIONAL_SCHEMAS["events"].replace(
                "ts timestamp_ntz", "ts bigint"
            )
            return spark.read.schema(nanos_ddl).parquet(path).withColumn(
                "ts", F.expr("timestamp_micros(ts div 1000)")
            )
        return spark.read.schema(RELATIONAL_SCHEMAS["events"]).parquet(path)
    return spark.read.schema(RELATIONAL_SCHEMAS[name]).parquet(path)


def parallelize_scan(df: DataFrame, min_file_factor: int = 2) -> DataFrame:
    """Round-robin repartition a scan-rooted frame to the session's
    default parallelism WHEN the file layout cannot provide it — the
    guide §2.5 "one huge unsplittable file" remedy, made
    scale-adaptive instead of unconditional. The driver testdata
    tables are single-file single-row-group parquet, so every scan
    is ONE task and heavy narrow compute (per-char HOF folds, exact
    percentile buffers) serializes on one core of local[32]. A
    production 100 TB table has thousands of splits, where the extra
    exchange would be pure overhead — so the repartition fires only
    when the scan's file count is well below the core count
    (inputFiles() is a driver-side listing, no job). Use ONLY ahead
    of row-local compute whose per-row results are
    partitioning-invariant (the caller's proof obligation)."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file-backed frames: leave untouched
        return df
    if n_files and n_files * min_file_factor <= par:
        return df.repartition(par)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in RELATIONAL_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every relational table as a temp view for spark.sql()."""
    for name in RELATIONAL_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# --------------------------------------------------------------------------
# Domain tables (the reference's data model; FIXTURES.md §A)
# --------------------------------------------------------------------------

# channels CSV: yt_channel_list_result_merge.ipynb:L42 column list;
# "N/A" → typed nulls (SURVEY §1.3).
CHANNELS = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("id", T.StringType(), False),
        T.StructField("n_videos", T.LongType(), True),
        T.StructField("n_views", T.LongType(), True),
        T.StructField("n_subs", T.LongType(), True),
        T.StructField("custom_url", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("url", T.StringType(), False),
    ]
)

# channel_quality JSONL: filter_channel.py:49-54 writer shape
# {url, snrss: [float], acss: [[{label, score}]]}.
AC_PREDICTION = T.StructType(
    [
        T.StructField("label", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)

CHANNEL_QUALITY = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("snrss", T.ArrayType(T.DoubleType()), True),
        T.StructField("acss", T.ArrayType(T.ArrayType(AC_PREDICTION)), True),
    ]
)

# videos: yt_get_playlist_ids output (yt_download.py:14-28) + probe
# metadata; position drives the per-channel top-N window (SURVEY W1).
VIDEOS = T.StructType(
    [
        T.StructField("channel_id", T.StringType(), False),
        T.StructField("video_id", T.StringType(), False),
        T.StructField("position", T.IntegerType(), False),
        T.StructField("duration_sec", T.LongType(), True),
        T.StructField("error_class", T.StringType(), True),
    ]
)

# ingest ledger: data_pipeline.py:27-439 hard-coded id set → a proper
# dimension table, broadcast anti-joined (SURVEY J3/T1).
VIDEO_LEDGER = T.StructType([T.StructField("video_id", T.StringType(), False)])

# segments: audio_vad.py:48-65 producer / data_pipeline.py:658-676
# consumer; sample offsets @16 kHz; audio payload optional.
SEGMENTS = T.StructType(
    [
        T.StructField("channel_id", T.StringType(), False),
        T.StructField("video_id", T.StringType(), False),
        T.StructField("seg_idx", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
        T.StructField("snr", T.DoubleType(), True),
        T.StructField("speech_prob", T.DoubleType(), True),
        T.StructField("audio", T.BinaryType(), True),
    ]
)

DOMAIN_SCHEMAS: dict[str, T.StructType] = {
    "channels": CHANNELS,
    "channel_quality": CHANNEL_QUALITY,
    "videos": VIDEOS,
    "video_ledger": VIDEO_LEDGER,
    "segments": SEGMENTS,
}


def observe_quality(
    df: DataFrame, name: str, rules: dict[str, "Column"]
) -> tuple[DataFrame, "Observation"]:
    """Attach in-flight data-quality metrics to a plan via
    df.observe(): each rule is a Boolean Column counted as it streams
    past — the metrics ride the SAME pass as whatever action consumes
    the frame, so validation costs zero extra scans (at 100 TB a
    separate validation job doubles the read bill; this makes it
    free). Returns (instrumented_df, observation); read
    observation.get after the first action completes.

    Complements data_quality_report (a standalone report query) and
    validate_table (plan-time schema contract): observe_quality is
    the always-on production counter path.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(cond, 1).otherwise(0)).alias(rule)
        for rule, cond in rules.items()
    ]
    return df.observe(obs, *metrics), obs
