"""Typed file scans (SURVEY §2.1 S1-S6) and file sinks (K1-K5).

Every reader declares its schema explicitly (the reference inferred
everything — SURVEY §1.3); "N/A" markers become typed nulls at scan
time so numeric columns stay numeric. All readers accept globs /
directories, so multi-file union (S2) is the same call as one file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from se_data_pipeline_spark.catalog import CHANNELS, CHANNEL_QUALITY

NA_MARKERS = ("N/A", "NA", "")


def _na_to_null(df: DataFrame) -> DataFrame:
    """Stringly-typed 'N/A' placeholders → typed nulls (the reference
    wrote literal \"N/A\" into numeric CSV columns,
    starngage_crawler.ipynb:L327-L334)."""
    return df.replace(list(NA_MARKERS), None)


def read_channels_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1/S2: channel-list CSV(s) with the declared 8-column schema
    (yt_channel_list_result_merge.ipynb:L42). Reading a directory or
    glob unions shards implicitly — the reference's pd.concat(map(
    read_csv, files)) is just a wider scan here, still one job."""
    raw = (
        spark.read.schema(
            # read numerics as string first so "N/A" survives the parse,
            # then null-out markers and cast to the declared types.
            "title string, id string, n_videos string, n_views string, "
            "n_subs string, custom_url string, email string, url string"
        )
        .option("header", True)
        .csv(path)
    )
    cleaned = _na_to_null(raw)
    return cleaned.select(
        "title",
        "id",
        F.col("n_videos").cast("long").alias("n_videos"),
        F.col("n_views").cast("long").alias("n_views"),
        F.col("n_subs").cast("long").alias("n_subs"),
        "custom_url",
        "email",
        "url",
    )


def read_quality_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """S3: probe-result JSONL with the nested array-of-structs schema
    (filter_channel.py:49-54 writer shape)."""
    return spark.read.schema(CHANNEL_QUALITY).json(path)


def read_url_lines(spark: SparkSession, path: str) -> DataFrame:
    """S4: one-URL-per-line text scan (filter_channel.py:100-101),
    trimmed and de-blanked."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("url"))
        .filter(F.col("url") != "")
    )


def read_json_document(spark: SparkSession, path: str) -> DataFrame:
    """S5: whole-file JSON document (starngage_crawler.ipynb cell 14
    json.load)."""
    return spark.read.option("multiLine", True).json(path)


def read_binary_files(spark: SparkSession, path: str, glob: str = "*.wav") -> DataFrame:
    """S6: binary-file scan (audio payloads). Columns: path,
    modificationTime, length, content. Decode/resample happens in the
    audio kernels (operators/audio.py), never driver-side."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


# --------------------------------------------------------------- sinks


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """K1: header CSV write. single_file=True coalesces to one
    partition — only for small final outputs (the reference's channel
    lists); large outputs keep their partitioning."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K2/K3: JSON-lines write; mode="append" is the dead-letter /
    probe-result accumulation pattern (filter_channel.py:49-63)."""
    df.write.mode(mode).json(path)


def write_text_log(df: DataFrame, path: str, sep: str = "|") -> None:
    """K4: delimited text append — the reference's skip-log shape
    ('{channel_id}|{reason}', data_pipeline.py:545-548). Every column
    is stringified and joined with `sep`; append mode accumulates
    across runs like the reference's open(..., 'a')."""
    cols = [F.col(c).cast("string") for c in df.columns]
    df.select(F.concat_ws(sep, *cols).alias("value")).write.mode(
        "append"
    ).text(path)


def write_columnar(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
) -> None:
    """Columnar table write (parquet or ORC — both built into Spark,
    both predicate-pushdown + column-pruning capable). The engine's
    canonical at-scale sink: partition_by gives partition-pruned
    reads, and per-file column stats give row-group skipping.

    This is REPLACE-THE-TABLE semantics, so the partitioned write
    sets partitionOverwriteMode=static as a per-WRITER option
    (overriding the session conf without mutating it): under a
    dynamic-mode session a partitioned overwrite keeps any old
    partition absent from the new frame — stale partitions would
    silently survive a rewrite (the compact_term_stats bug class,
    r7). Callers that WANT per-partition upsert use the per-writer
    dynamic-mode pattern in streaming/jobs.py instead."""
    w = df.write.mode("overwrite").format(fmt)
    if partition_by:
        w = w.option("partitionOverwriteMode", "static").partitionBy(
            *partition_by
        )
    w.save(path)


def read_columnar(
    spark: SparkSession, path: str, fmt: str = "parquet",
    merge_schema: bool = False,
) -> DataFrame:
    """Columnar table read. merge_schema=True reconciles files written
    under evolving schemas (new nullable columns appear as null on old
    files) — the schema-evolution story for a long-lived 100 TB
    table. Off by default: merging footers costs a pass over file
    metadata."""
    r = spark.read.format(fmt)
    if merge_schema:
        r = r.option("mergeSchema", True)
    return r.load(path)
