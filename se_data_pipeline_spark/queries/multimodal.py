"""Multimodal-column plumbing (SURVEY M8 / prompt: image/audio/video
as opaque binary + typed metadata).

The container has no codec libraries, so *decode* is a deterministic
fake (byte-level math) or an explicit NotImplementedError stub
(operators/multimodal.py) — but the Spark-side plumbing is real:
BinaryType columns, Arrow-batched mapInPandas with an explicit output
schema, per-batch vectorized numpy, and results that an independent
DuckDB oracle reproduces byte-for-byte (the corpus is ASCII, so
ascii(char) == byte value).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from se_data_pipeline_spark.catalog import load_table
from se_data_pipeline_spark.queries import query

_CHECKSUM_MOD = 1_000_003

_PAYLOAD_STATS_SCHEMA = (
    "doc_id long, n_bytes int, checksum long, mean_byte double, std_byte double"
)


def _payload_stats_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched kernel: per-row byte stats from the binary
    payload. Sums are exact integers (bytes ≤ 255, docs ≤ 1 KB), so
    the float math afterwards is bit-identical to the SQL oracle."""
    import numpy as np

    from se_data_pipeline_spark.functions.numeric import round_half_up

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:  # NULL payload: NULL stats row
                rows.append((doc_id, None, None, None, None))
                continue
            b = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
            n = len(b)
            if n == 0:  # empty payload: NULL stats (mirrors SQL
                # aggregates over an empty list), not a 1/0 crash
                rows.append((doc_id, 0, None, None, None))
                continue
            s1 = int(b.sum())
            s2 = int((b * b).sum())
            mean = s1 / n
            var = max(s2 / n - mean * mean, 0.0)
            rows.append(
                (
                    doc_id,
                    n,
                    s1 % _CHECKSUM_MOD,
                    # SQL-ROUND semantics, NOT python round(): a mean
                    # over a power-of-two count lands on exact halves
                    float(round_half_up(mean)),
                    float(round_half_up(var**0.5)),
                )
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_bytes", "checksum", "mean_byte", "std_byte"]
        )


@query(
    "multimodal_payload_stats",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, [ascii(c) for c in string_split(text, '')] AS bs
      FROM documents)
    SELECT doc_id,
           CAST(len(bs) AS INTEGER)                       AS n_bytes,
           CAST(list_sum(bs) % {_CHECKSUM_MOD} AS BIGINT) AS checksum,
           ROUND(CAST(list_sum(bs) AS DOUBLE) / len(bs), 6) AS mean_byte,
           ROUND(sqrt(greatest(
             CAST(list_sum([x * x for x in bs]) AS DOUBLE) / len(bs)
             - (CAST(list_sum(bs) AS DOUBLE) / len(bs))
               * (CAST(list_sum(bs) AS DOUBLE) / len(bs)), 0.0)), 6) AS std_byte
    FROM b
    """,
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column analysis through the real multimodal path:
    text → BinaryType payload (stand-in for image/audio bytes) →
    Arrow-batched mapInPandas with a declared output schema → typed
    per-item metadata (size, checksum, intensity moments).

    Scale: mapInPandas streams Arrow batches executor-side — no
    collect, no per-row Python calls; batch size is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch so executor memory
    is payload-size-aware. This is exactly the decode/feature shape a
    100 TB image/audio pipeline runs, with the codec swapped in.
    """
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(_payload_stats_batches, _PAYLOAD_STATS_SCHEMA)


_FEATURE_SCHEMA = (
    "doc_id long, n_frames int, "
    "f_q1 double, f_q2 double, f_q3 double, f_q4 double"
)
_FRAME_BYTES = 32


def _frame_feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Frame-sampling + feature extraction over an opaque payload:
    split bytes into fixed-size "frames" (the video-frame analog),
    take every frame's mean intensity as a 4-bucket profile. A real
    pipeline swaps the byte math for a decoder; the batching, schema
    and partition behavior stay identical."""
    import numpy as np

    from se_data_pipeline_spark.functions.numeric import round_half_up

    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:  # NULL payload: NULL feature row
                out.append((doc_id, None, None, None, None, None))
                continue
            b = np.frombuffer(bytes(payload), dtype=np.uint8)
            n_frames = max(len(b) // _FRAME_BYTES, 1)
            frames = b[: n_frames * _FRAME_BYTES].reshape(n_frames, -1)
            means = frames.mean(axis=1)
            # 4-bucket temporal profile: mean intensity per quarter
            quarters = np.array_split(means, 4)
            feature = [
                float(round_half_up(q.mean())) if len(q) else 0.0
                for q in quarters
            ]
            out.append((doc_id, n_frames, *feature))
        yield pd.DataFrame(
            out,
            columns=["doc_id", "n_frames", "f_q1", "f_q2", "f_q3", "f_q4"],
        )


@query(
    "multimodal_frame_features",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, [ascii(c) for c in string_split(text, '')] AS bs
      FROM documents),
    f AS (
      SELECT doc_id, bs,
             CAST(greatest(len(bs) // {_FRAME_BYTES}, 1) AS INTEGER)
               AS n_frames
      FROM b),
    m AS (
      SELECT doc_id, n_frames,
             [list_avg(bs[(i - 1) * {_FRAME_BYTES} + 1 : i * {_FRAME_BYTES}])
              for i in range(1, n_frames + 1)] AS means
      FROM f),
    q AS (
      SELECT doc_id, n_frames, means,
             (n_frames // 4) + CASE WHEN n_frames % 4 >= 1
                                    THEN 1 ELSE 0 END AS e1,
             2 * (n_frames // 4) + CASE WHEN n_frames % 4 >= 2 THEN 2
                                        WHEN n_frames % 4 = 1 THEN 1
                                        ELSE 0 END AS e2,
             3 * (n_frames // 4) + least(n_frames % 4, 3) AS e3
      FROM m)
    SELECT doc_id, n_frames,
           ROUND(COALESCE(list_avg(means[1 : e1]), 0), 6) AS f_q1,
           ROUND(COALESCE(list_avg(means[e1 + 1 : e2]), 0), 6) AS f_q2,
           ROUND(COALESCE(list_avg(means[e2 + 1 : e3]), 0), 6) AS f_q3,
           ROUND(COALESCE(list_avg(means[e3 + 1 : n_frames]), 0), 6)
             AS f_q4
    FROM q
    """,
)
def multimodal_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample + per-frame feature extraction (video analog) as
    vectorized numpy over Arrow batches; emits the 4-bucket temporal
    profile as scalar double columns (f_q1..f_q4).

    The oracle replays the byte math in SQL (the corpus is ASCII, so
    ascii(char) == the UTF-8 byte): 32-byte frames → frame means →
    np.array_split-style quarter boundaries (first n%4 quarters get
    the extra frame) → half-up rounding. Frame sums are exact
    integers in double, so the two engines agree bit-for-bit before
    rounding.
    """
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(_frame_feature_batches, _FEATURE_SCHEMA)


# --------------------------------------------------------------------------
# Content-addressed exact dedup over opaque binary payloads: digest
# the bytes, group by digest — the first stage of every media dedup
# pipeline (image/audio exact-copy removal) and the CAS key a 100 TB
# blob store shards on. Text→UTF-8 bytes stands in for the media
# payload exactly as in multimodal_payload_stats.
# --------------------------------------------------------------------------
@query(
    "multimodal_exact_dedup",
    oracle="""
    SELECT md5(text) AS digest,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS canonical_doc_id,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
    FROM documents
    GROUP BY digest
    ORDER BY digest
    """,
)
def multimodal_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary dedup by MD5 content address: one digest per
    payload (computed JVM-side on the raw bytes — no Python), one
    hash aggregate keyed on the 16-byte digest, canonical = min id.

    Scale: the shuffle carries (digest, id, n_bytes) — never the
    payload; at 100 TB the digest group-by is the cheapest possible
    dedup pass (fixed 32-hex key, map-side partial counts) and its
    output IS the CAS manifest. DuckDB's md5(VARCHAR) hashes the
    UTF-8 bytes, which is exactly Spark's md5(encode(text, 'UTF-8')),
    so the digests match across engines."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return (
        payloads.groupBy(F.md5("payload").alias("digest"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.sum(F.octet_length("payload")).cast("long").alias(
                "total_bytes"
            ),
        )
        .orderBy("digest")
    )
