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


# --------------------------------------------------------------------------
# Perceptual near-dup over opaque binary payloads: the aHash
# (average-hash) fingerprint + the Manku et al. 2007 banded
# Hamming-k design (WWW '07, "Detecting Near-Duplicates for Web
# Crawling" — 64-bit fingerprint, k=3, table keys wide enough that
# buckets stay SPARSE as the corpus grows). multimodal_exact_dedup
# catches byte-identical copies; this catches re-encoded /
# slightly-perturbed copies, whose fingerprints differ in a few bits.
#
# Band width matters at scale: a first cut used 16 bands x 4 bits,
# whose 16 possible values per band saturate — bucket size grows
# linearly with the corpus and the C(m,2) pair fan-out quadratically
# (the 10x scale check timed out). Manku's 4 tables x 16-bit keys
# give 65,536 values per table, so bucket occupancy stays ~corpus/65k
# and total pair work grows linearly. Recall is still exactly 1 for
# hamming <= 3 by pigeonhole (3 flips cannot touch all 4 bands).
#
# Random payload fingerprints sit ~32 bits apart (measured min 9 on
# the fixture), so true hamming<=3 near-dups do not occur naturally
# in synthetic word-soup; the query therefore PLANTS deterministic
# perturbed copies (every doc_id % 20 == 0 gets a twin at
# id + 10_000_000 with its last byte replaced by '~') — the same
# in-query deterministic-fixture pattern as
# ann_recall_clustered_report. The perturbation is plain SQL, so the
# oracle rebuilds the identical corpus and the planted pairs are
# value-checked end-to-end: every planted twin lands at hamming <= 2
# and no unplanted pair comes near the threshold.
# --------------------------------------------------------------------------
_PHASH_BITS = 64
_PHASH_BANDS = 4
_PHASH_BAND_BITS = _PHASH_BITS // _PHASH_BANDS
_PHASH_MAX_HAMMING = 3  # < _PHASH_BANDS, so banding has recall 1
_PHASH_PLANT_MOD = 20
_PHASH_PLANT_OFFSET = 10_000_000


def _ahash_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched aHash kernel: 64 equal byte-blocks per payload
    (floor boundaries, the np.array_split rule), bit i = 1 iff block
    i's mean exceeds the payload's global mean. The comparison is the
    exact integer cross-multiply block_sum*n > total_sum*block_len —
    no float division — so the SQL oracle reproduces every bit. A
    real image pipeline swaps the byte blocks for decoded 8x8
    luminance; the banding/verify dataflow downstream is unchanged."""
    import numpy as np

    idx = np.arange(_PHASH_BITS + 1)
    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if payload is None:  # NULL payload: no fingerprint
                out.append((doc_id, None))
                continue
            b = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                np.int64
            )
            n = len(b)
            bounds = (idx * n) // _PHASH_BITS
            csum = np.concatenate(([0], np.cumsum(b)))
            bsum = csum[bounds[1:]] - csum[bounds[:-1]]
            blen = bounds[1:] - bounds[:-1]
            total = int(b.sum()) if n else 0
            bits = (bsum * n) > (total * blen)
            out.append(
                (doc_id, "".join("1" if x else "0" for x in bits))
            )
        yield pd.DataFrame(out, columns=["doc_id", "ahash"])


@query(
    "multimodal_phash_pairs",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_PHASH_PLANT_OFFSET} AS doc_id,
             substr(text, 1, length(text) - 1) || '~' AS text
      FROM documents WHERE doc_id % {_PHASH_PLANT_MOD} = 0),
    b AS (
      SELECT doc_id, [ascii(c) for c in string_split(text, '')] AS bs,
             length(text) AS n
      FROM corpus),
    h AS (
      SELECT doc_id,
             [CASE WHEN CAST(list_sum(
                      bs[(i*n)//{_PHASH_BITS} + 1
                         : ((i+1)*n)//{_PHASH_BITS}]) AS BIGINT) * n
                       > CAST(list_sum(bs) AS BIGINT)
                         * (((i+1)*n)//{_PHASH_BITS}
                            - (i*n)//{_PHASH_BITS})
                   THEN 1 ELSE 0 END
              for i in range(0, {_PHASH_BITS})] AS bits
      FROM b),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(list_sum([abs(a.bits[i] - b.bits[i])
                            for i in range(1, {_PHASH_BITS + 1})])
                  AS INTEGER) AS hamming
      FROM h a JOIN h b ON a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, hamming
    FROM p WHERE hamming <= {_PHASH_MAX_HAMMING}
    ORDER BY doc_a, doc_b
    """,
)
def multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup pairs, the Manku et al. WWW'07 design:
    aHash fingerprint per payload (Arrow kernel, exact integer bit
    rule) → 4 tables of 16-bit band keys → band-bucket candidate join
    → exact Hamming verify at <= 3. Because the threshold (3) is
    below the band count (4), any pair within it agrees on at least
    one full band (pigeonhole), so banding is RECALL-1 at the
    verification threshold and the brute-force SQL oracle (all pairs,
    exact Hamming over the same planted corpus) is the equality
    contract, not just a bound. Extends the multimodal family from
    exact (CAS digest) to perceptual dedup — the image/audio
    near-copy pass. Planted perturbed twins (see the block comment)
    make the check non-trivial at every sf: 25 pairs at sf0.01, all
    verified hamming <= 2, zero unplanted pairs (random fingerprints
    sit >= 9 apart).

    Scale shape: fingerprints are 64-char strings (payloads never
    leave the kernel); the fingerprint frame is localCheckpoint'ed
    once (EAGER_OK: three consumers — band explode + both verify
    sides); each table's key space is 2^16, so bucket occupancy
    stays ~corpus/65k and pair fan-out grows LINEARLY with the
    corpus (the 4-bit-band variant saturated quadratically — see the
    block comment); degenerate identical-fingerprint floods (e.g.
    constant payloads) hit the STRICT bucket guard — past
    MAX_DOCS_PER_BUCKET the query raises rather than silently
    dropping pairs the uncapped brute-force oracle reports (ADVICE
    r9: engine and oracle stay an equality contract under floods);
    verification joins are doc-keyed equi-joins.

    Oracle caveat (the standing multimodal-family convention, see the
    module docstring): the kernel fingerprints UTF-8 BYTES while the
    SQL oracle fingerprints per-CHARACTER code points — identical on
    this verified-ASCII fixture (ascii(char) == byte), divergent on
    multi-byte text. A non-ASCII corpus needs a bytes-capable oracle,
    not a kernel change (the byte view is the production-correct one
    for opaque media payloads).
    """
    from se_data_pipeline_spark.queries.text import _cap_bucket

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.filter(
        F.col("doc_id") % _PHASH_PLANT_MOD == 0
    ).select(
        (F.col("doc_id") + _PHASH_PLANT_OFFSET).alias("doc_id"),
        F.concat(
            F.expr("substring(text, 1, length(text) - 1)"), F.lit("~")
        ).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(planted)
    payloads = corpus.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    par = max(spark.sparkContext.defaultParallelism, 8)
    h = (
        payloads.repartition(par)
        .mapInPandas(_ahash_batches, "doc_id long, ahash string")
        .filter(F.col("ahash").isNotNull())
        .localCheckpoint(eager=True)  # 3-consumer reuse (EAGER_OK)
    )
    bands = h.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_PHASH_BANDS - 1)),
                lambda i: F.substring(
                    F.col("ahash"),
                    i * _PHASH_BAND_BITS + 1,
                    F.lit(_PHASH_BAND_BITS),
                ),
            )
        ).alias("band_idx", "band_val"),
    ).select(
        "doc_id",
        F.concat_ws(":", "band_idx", "band_val").alias("bkey"),
    )
    buckets = (
        # strict: the brute-force oracle below has NO cap, so a
        # flooded band bucket (constant payloads) must raise instead
        # of silently dropping pairs the oracle reports (ADVICE r9)
        _cap_bucket(bands, "bkey", strict=True)
        .groupBy("bkey")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    pairs = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.expr(
                        """transform(ds, (x, i) ->
                             transform(slice(ds, i + 2, size(ds)),
                                       y -> struct(x AS a, y AS b)))"""
                    )
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
    )
    ha = h.select(F.col("doc_id").alias("a"), F.col("ahash").alias("fa"))
    hb = h.select(F.col("doc_id").alias("b"), F.col("ahash").alias("fb"))
    return (
        pairs.join(ha, "a")
        .join(hb, "b")
        .withColumn(
            "hamming",
            F.size(
                F.filter(
                    F.zip_with(
                        F.split(F.col("fa"), ""),
                        F.split(F.col("fb"), ""),
                        lambda x, y: x != y,
                    ),
                    lambda v: v,
                )
            ).cast("int"),
        )
        .filter(F.col("hamming") <= _PHASH_MAX_HAMMING)
        .select(
            F.col("a").alias("doc_a"),
            F.col("b").alias("doc_b"),
            "hamming",
        )
        .orderBy("doc_a", "doc_b")
    )
