"""Training-data curation operators beyond the dedup/similarity
family: PII redaction, document chunking (sliding token windows),
benchmark-contamination detection, and greedy token bin-packing.

These are the remaining pieces of the M8 north star (SURVEY §7.2):
everything a 100 TB LLM-corpus pipeline runs between raw scrape and
tokenized shards. All but the packing operator are pure Catalyst
expressions; packing is a per-group stateful pass (applyInPandas)
whose DuckDB oracle is a recursive CTE computing the same fold.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from se_data_pipeline_spark.catalog import load_table
from se_data_pipeline_spark.functions.text import word_shingles_udf
from se_data_pipeline_spark.queries import query

# --------------------------------------------------------------------------
# PII redaction: regex scrubbing of emails / phone numbers.
#
# The synthetic corpus contains no natural PII, so the query first
# derives a contact line deterministically from (doc_id, source) —
# identically in both engines — then redacts it. The operator under
# test is the redaction itself: global regexp_replace + match counts,
# all JVM-side (reference parity: P11's regex email extraction,
# starngage_crawler.ipynb:L323 cell 15, inverted into removal).
# --------------------------------------------------------------------------
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"


@query(
    "doc_pii_redaction",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail-' || source || '.net or call +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
      FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(raw, '{_PHONE_RE}')) AS n_phones,
           md5(regexp_replace(
                 regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_fp
    FROM raw
    """,
)
def doc_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/phone scrubbing over the corpus: one pass, two global
    regexp_replace calls plus regexp_count — entirely inside
    whole-stage codegen, no UDF.

    Scale: regex scrubbing is embarrassingly parallel and pipeline-
    able with the scan; at 100 TB the only cost that matters is that
    it happens in the SAME pass as other row-local curation (quality
    score, lang-id), never as its own job. The md5 fingerprint keeps
    the verified result narrow."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail-"),
        F.col("source"),
        F.lit(".net or call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(raw, F.lit(_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(raw, F.lit(_PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_fp"),
    )


# --------------------------------------------------------------------------
# Document chunking: sliding token windows (size 32, stride 24) —
# the pretokenization step that turns documents into model-sized
# pieces with overlap.
# --------------------------------------------------------------------------
_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24


@query(
    "doc_chunks",
    oracle=f"""
    SELECT doc_id,
           CAST(s / {_CHUNK_STRIDE} AS INTEGER) AS chunk_id,
           CAST(least(s + {_CHUNK_SIZE}, len(toks)) - s AS INTEGER)
             AS n_tokens,
           array_to_string(
             toks[s + 1 : least(s + {_CHUNK_SIZE}, len(toks))], ' ')
             AS chunk_text
    FROM (SELECT doc_id, toks, unnest(range(0, len(toks), {_CHUNK_STRIDE}))
            AS s
          FROM (SELECT doc_id, string_split(text, ' ') AS toks
                FROM documents))
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: tokens → start offsets (sequence with
    stride) → explode → slice. One row per chunk, `stride < size`
    gives 8-token overlap between neighbors.

    Scale: explode fan-out is ~n_tokens/stride per document and the
    whole operator is row-local (zero shuffles); chunk rows inherit
    the input partitioning, which is exactly what the downstream
    tokenizer/packer wants. Column-pruned scan reads only (doc_id,
    text)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(
        F.lit(0), F.size(toks) - 1, F.lit(_CHUNK_STRIDE)
    )
    chunk = F.slice(
        F.col("toks"), F.col("start") + 1, _CHUNK_SIZE
    )
    return (
        docs.select("doc_id", toks.alias("toks"), F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / _CHUNK_STRIDE).cast("int").alias("chunk_id"),
            F.size(chunk).alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


# --------------------------------------------------------------------------
# Benchmark-contamination check: which training documents share any
# k-gram with a held-out benchmark set (docs with doc_id % 97 == 0
# stand in for the eval suite). Real pipelines use k of 8-13; the
# synthetic corpus' n-gram diversity makes k=4 the smallest size
# with nonzero overlap, so that's what the fixture pins.
# --------------------------------------------------------------------------
_CONTAM_K = 4
_BENCH_MOD = 97


@query(
    "benchmark_contamination",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, list_distinct(
        [array_to_string(toks[i : i + {_CONTAM_K - 1}], ' ')
         for i in range(1, len(toks) - {_CONTAM_K - 2})]) AS s
      FROM (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents)),
    e AS (SELECT doc_id, unnest(s) AS sh FROM sh),
    bench AS (SELECT doc_id AS bdoc, sh FROM e
              WHERE doc_id % {_BENCH_MOD} = 0),
    train AS (SELECT * FROM e WHERE doc_id % {_BENCH_MOD} <> 0)
    SELECT t.doc_id,
           COUNT(DISTINCT t.sh) AS n_shared_ngrams,
           COUNT(DISTINCT b.bdoc) AS n_bench_docs
    FROM train t JOIN bench b ON t.sh = b.sh
    GROUP BY t.doc_id
    """,
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination scan: k-gram inverted index over both sides,
    train⋈bench on the shingle hash, per-train-doc counts of shared
    n-grams and distinct benchmark docs hit. Only contaminated docs
    appear (inner join).

    Scale: the benchmark side is tiny (an eval suite, not a corpus)
    — at 100 TB its distinct-shingle set broadcasts, so the check is
    a map-side semi-join over the train scan with NO train-side
    shuffle before the per-doc count. Keys are xxhash64 of the
    8-gram (8 bytes), not the string."""
    docs = load_table(spark, sf_dir, "documents")
    par = max(spark.sparkContext.defaultParallelism, 8)
    # explode_outer + null-filter on the GENERATED attribute: plain
    # explode() infers a `size(udf(text))>0` pre-filter that runs the
    # shingle UDF in a second ArrowEvalPython pass over the corpus
    # (see _shingle_index in queries/text.py).
    e = (
        docs.repartition(par)
        .select(
            "doc_id",
            F.explode_outer(
                word_shingles_udf(_CONTAM_K)(F.col("text"))
            ).alias("sh_str"),
        )
        .filter(F.col("sh_str").isNotNull())
        .select("doc_id", F.xxhash64("sh_str").alias("sh"))
    )
    bench = e.filter(F.col("doc_id") % _BENCH_MOD == 0).select(
        F.col("doc_id").alias("bdoc"), "sh"
    )
    train = e.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return (
        train.join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("sh").alias("n_shared_ngrams"),
            F.countDistinct("bdoc").alias("n_bench_docs"),
        )
    )


# --------------------------------------------------------------------------
# Greedy token bin-packing: sequence documents (per language, in
# doc_id order) into training-context bins of <= 500 tokens; a doc
# that would overflow the open bin closes it and starts the next.
# --------------------------------------------------------------------------
_PACK_BUDGET = 500

_PACK_SCHEMA = "doc_id long, lang string, n_tokens int, bin_id int"


def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    bin_id, acc, out = 0, 0, []
    for tok in pdf["n_tokens"]:
        if acc > 0 and acc + tok > _PACK_BUDGET:
            bin_id += 1
            acc = tok
        else:
            acc += tok
        out.append(bin_id)
    pdf["bin_id"] = out
    return pdf[["doc_id", "lang", "n_tokens", "bin_id"]]


@query(
    "token_bin_packing",
    oracle=f"""
    WITH RECURSIVE t AS (
      SELECT lang, doc_id,
             CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id)
                  AS INTEGER) AS rn
      FROM documents),
    s AS (
      SELECT lang, doc_id, n_tokens, rn, 0 AS bin_id, n_tokens AS acc
      FROM t WHERE rn = 1
      UNION ALL
      SELECT t.lang, t.doc_id, t.n_tokens, t.rn,
             CASE WHEN s.acc + t.n_tokens > {_PACK_BUDGET}
                  THEN s.bin_id + 1 ELSE s.bin_id END,
             CASE WHEN s.acc + t.n_tokens > {_PACK_BUDGET}
                  THEN t.n_tokens ELSE s.acc + t.n_tokens END
      FROM t JOIN s ON t.lang = s.lang AND t.rn = s.rn + 1)
    SELECT doc_id, lang, n_tokens, CAST(bin_id AS INTEGER) AS bin_id
    FROM s
    """,
)
def token_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential packing into ≤500-token bins, per language:
    the step that turns curated docs into fixed-budget training
    sequences. Inherently a sequential fold per group → applyInPandas
    with an explicit in-group sort; the oracle replays the identical
    fold as a recursive CTE.

    Scale: a global per-language fold would serialize 100 TB through
    a handful of tasks — a real pipeline packs per (lang, shard)
    where shard is the upstream partition, which keeps bins local
    and fully parallel at the cost of one underfull bin per shard.
    The group key here is the demo's only concession to the oracle
    (DuckDB must replay the same chain)."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    return sized.groupBy("lang").applyInPandas(_pack_group, _PACK_SCHEMA)


# --------------------------------------------------------------------------
# Training-mix sampling: deterministic per-source quotas (the "data
# mixing" step that reweights web/code/reference sources before
# training). Sources are tiered by their numeric suffix; each keeps
# a hash-ranked fraction of its docs, so the sample is stable across
# runs, engines, and partitionings.
# --------------------------------------------------------------------------
_MIX_FRACS = {0: 0.6, 1: 0.3, 2: 0.1}  # source_num % 3 -> keep fraction


@query(
    "training_mix_sample",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             CASE CAST(regexp_extract(source, '[0-9]+') AS INTEGER) % 3
                  WHEN 0 THEN {_MIX_FRACS[0]}
                  WHEN 1 THEN {_MIX_FRACS[1]}
                  ELSE {_MIX_FRACS[2]} END AS frac
      FROM documents),
    r AS (
      SELECT doc_id, source, frac,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY source) AS cnt
      FROM d)
    SELECT doc_id, source, ROUND(frac, 2) AS mix_frac
    FROM r WHERE rk <= CAST(ceil(frac * cnt) AS INTEGER)
    """,
)
def training_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source reweighting: per-source keep-fraction by
    tier, membership decided by rank of md5(doc_id) within the
    source — a reproducible sample (same docs at any partitioning or
    cluster size), unlike TABLESAMPLE/rand().

    Scale: one shuffle on source (the rank window); the per-source
    count rides the same window. Skewed mega-sources are the usual
    suspects — their window sorts in one task, so at 100 TB you rank
    by hash RANGE instead (keep if md5 < frac * 2^128, no sort, no
    window), trading exact quota counts for zero shuffles; both
    forms are deterministic. The windowed form here keeps quotas
    exact for the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    num = F.regexp_extract("source", "[0-9]+", 0).cast("int")
    frac = (
        F.when(num % 3 == 0, F.lit(_MIX_FRACS[0]))
        .when(num % 3 == 1, F.lit(_MIX_FRACS[1]))
        .otherwise(F.lit(_MIX_FRACS[2]))
    )
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    cw = W.partitionBy("source")
    r = docs.select(
        "doc_id",
        "source",
        frac.alias("frac"),
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(cw).alias("cnt"),
    )
    return r.filter(
        F.col("rk") <= F.ceil(F.col("frac") * F.col("cnt")).cast("int")
    ).select("doc_id", "source", F.round("frac", 2).alias("mix_frac"))


# --------------------------------------------------------------------------
# Cross-modal curation funnel: text-quality gate × semantic dedup.
# --------------------------------------------------------------------------
_JOINT_QUALITY_MIN = 0.33


@query(
    "corpus_joint_curation",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    q AS (
      SELECT doc_id,
             0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
           + 0.3 * least(1.0, len(toks) / 150.0)
           + 0.3 * (CAST(len(list_filter(toks,
                 t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
                    / len(toks)) AS quality
      FROM t),
    b AS (
      SELECT *,
             (CASE WHEN embedding[1]  > 0 THEN 1 ELSE 0 END
            + CASE WHEN embedding[14] > 0 THEN 2 ELSE 0 END
            + CASE WHEN embedding[28] > 0 THEN 4 ELSE 0 END
            + CASE WHEN embedding[42] > 0 THEN 8 ELSE 0 END) AS bucket
      FROM embeddings),
    p AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM b a JOIN b b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE list_sum([CAST(a.embedding[i+1] AS DOUBLE)
                      * CAST(b.embedding[i+1] AS DOUBLE)
                      for i in range(64)])
            / (sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              for x in a.embedding]))
               * sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                                for x in b.embedding])))
            >= 0.45),
    dropped AS (SELECT DISTINCT vec_b AS doc_id FROM p)
    SELECT d.doc_id,
           ROUND(q.quality, 6)                       AS quality,
           ROUND(q.quality, 6)
             >= CAST({_JOINT_QUALITY_MIN} AS DOUBLE) AS passed_text,
           dropped.doc_id IS NULL                    AS kept_semantic,
           ROUND(q.quality, 6)
             >= CAST({_JOINT_QUALITY_MIN} AS DOUBLE)
             AND dropped.doc_id IS NULL              AS selected
    FROM documents d
    JOIN q USING (doc_id)
    LEFT JOIN dropped USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def corpus_joint_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cross-MODAL curation funnel: a document survives iff it
    (a) passes the TEXT quality gate (composite lexical score from
    `doc_quality_score`) AND (b) survives SEMANTIC dedup in
    embedding space (`semantic_dedup_keep`, joined on the aligned
    doc_id/vec_id key). This is the join shape every multimodal
    training pipeline runs — per-modality signals computed
    independently (and cheaply, in parallel), then one key-
    partitioned join to make the keep decision; no signal ever needs
    the other modality's raw payload.

    Docs without an embedding row default to kept_semantic=true
    (nothing to dedup against) via the LEFT join. Output keeps ALL
    docs with their per-gate verdicts so downstream can audit funnel
    attrition, not just the survivors."""
    from se_data_pipeline_spark.queries.text import doc_quality_score
    from se_data_pipeline_spark.queries.vectors import semantic_dedup_keep

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    q = doc_quality_score(spark, sf_dir)
    sem = semantic_dedup_keep(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), F.col("kept").alias("kept_sem")
    )
    out = (
        docs.join(q, "doc_id")
        .join(sem, "doc_id", "left")
        .select(
            "doc_id",
            "quality",
            (
                F.col("quality") >= F.lit(_JOINT_QUALITY_MIN)
            ).alias("passed_text"),
            F.coalesce("kept_sem", F.lit(True)).alias("kept_semantic"),
            (
                (F.col("quality") >= F.lit(_JOINT_QUALITY_MIN))
                & F.coalesce("kept_sem", F.lit(True))
            ).alias("selected"),
        )
        .orderBy("doc_id")
    )
    return out


# --------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis A-ES).
# --------------------------------------------------------------------------
@query(
    "weighted_corpus_sample",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    q AS (
      SELECT doc_id,
             ROUND(
               0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
             + 0.3 * least(1.0, len(toks) / 150.0)
             + 0.3 * (CAST(len(list_filter(toks,
                   t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
                      / len(toks)), 6) AS w
      FROM t),
    k AS (
      SELECT doc_id, w,
             ln((CAST(doc_id % 1000003 * 2654435761 % 1000003 AS DOUBLE)
                 + 0.5) / 1000003) / w AS skey
      FROM q WHERE w > 0)
    SELECT doc_id, w AS weight, ROUND(skey, 6) AS sample_key
    FROM k ORDER BY skey DESC, doc_id LIMIT 50
    """,
)
def weighted_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, quality-proportional
    (Efraimidis & Spirakis 2006 A-ES): each doc gets the key
    ln(u)/w — u a deterministic hash-uniform in (0,1), w its quality
    score — and the sample is the top-k by key. One expression pass
    plus a TakeOrderedAndProject top-k: no global sort, no rejection
    loop, no driver RNG, and the same sample on every engine/run
    (the hash replaces an RNG exactly like `doc_stratified_sample`).

    This is the quality-weighted corpus subsetting step (DoReMi-style
    mixtures, quality-upweighted pretraining subsets) in its
    shuffle-free form; ranking by u^(1/w) and by ln(u)/w is
    order-equivalent, the log form just avoids pow underflow at tiny
    weights. Weight = the ROUNDED quality score, which is pinned
    engine-identical by `doc_quality_score`'s oracle."""
    from se_data_pipeline_spark.queries.text import doc_quality_score

    q = doc_quality_score(spark, sf_dir).filter(F.col("quality") > 0)
    u = (
        (F.col("doc_id") % 1_000_003 * 2654435761 % 1_000_003).cast(
            "double"
        )
        + 0.5
    ) / 1_000_003
    k = q.select(
        "doc_id",
        F.col("quality").alias("weight"),
        (F.log(u) / F.col("quality")).alias("skey"),
    )
    return (
        k.orderBy(F.desc("skey"), F.asc("doc_id"))
        .limit(50)
        .select("doc_id", "weight", F.round("skey", 6).alias("sample_key"))
    )


# --------------------------------------------------------------------------
# Funnel attrition report: one row summarizing the whole curation run.
# --------------------------------------------------------------------------
@query(
    "corpus_funnel_report",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    q AS (
      SELECT doc_id,
             ROUND(
               0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
             + 0.3 * least(1.0, len(toks) / 150.0)
             + 0.3 * (CAST(len(list_filter(toks,
                   t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
                      / len(toks)), 6) AS quality
      FROM t),
    b AS (
      SELECT *,
             (CASE WHEN embedding[1]  > 0 THEN 1 ELSE 0 END
            + CASE WHEN embedding[14] > 0 THEN 2 ELSE 0 END
            + CASE WHEN embedding[28] > 0 THEN 4 ELSE 0 END
            + CASE WHEN embedding[42] > 0 THEN 8 ELSE 0 END) AS bucket
      FROM embeddings),
    p AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM b a JOIN b b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE list_sum([CAST(a.embedding[i+1] AS DOUBLE)
                      * CAST(b.embedding[i+1] AS DOUBLE)
                      for i in range(64)])
            / (sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                              for x in a.embedding]))
               * sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                                for x in b.embedding])))
            >= 0.45),
    dropped AS (SELECT DISTINCT vec_b AS doc_id FROM p),
    v AS (
      SELECT d.doc_id,
             q.quality >= CAST({_JOINT_QUALITY_MIN} AS DOUBLE) AS pt,
             dropped.doc_id IS NULL AS ks
      FROM documents d
      JOIN q USING (doc_id)
      LEFT JOIN dropped USING (doc_id))
    SELECT COUNT(*)                                    AS n_total,
           CAST(SUM(CASE WHEN pt THEN 1 ELSE 0 END) AS BIGINT)
             AS n_passed_text,
           CAST(SUM(CASE WHEN ks THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept_semantic,
           CAST(SUM(CASE WHEN pt AND ks THEN 1 ELSE 0 END) AS BIGINT)
             AS n_selected,
           ROUND(SUM(CASE WHEN pt AND ks THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6)                        AS keep_rate
    FROM v
    """,
)
def corpus_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row attrition report over the curation funnel — the run
    summary a corpus-build job logs/alerts on (keep-rate collapsing
    to ~0 or jumping to ~1 is the canonical sign a gate broke). Pure
    aggregation over the per-doc verdict frame from
    `corpus_joint_curation`: conditional-sum counts per gate plus
    the final keep rate; adds one 1-row aggregate to the funnel's
    own plan, nothing else."""
    v = corpus_joint_curation(spark, sf_dir)
    return v.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("passed_text"), 1).otherwise(0))
        .cast("long")
        .alias("n_passed_text"),
        F.sum(F.when(F.col("kept_semantic"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept_semantic"),
        F.sum(F.when(F.col("selected"), 1).otherwise(0))
        .cast("long")
        .alias("n_selected"),
        F.round(
            F.sum(F.when(F.col("selected"), 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("keep_rate"),
    )


# --------------------------------------------------------------------------
# Contiguous global ID assignment without a global window — the
# scalable zipWithIndex: range-partition on the sort key, count per
# partition (a job over ≤ n_partitions rows), turn the counts into
# per-partition offsets on the driver, then offset + per-partition
# row_number. Every training pipeline needs stable dense ids (shard
# addressing, example indexing); the naive ROW_NUMBER() OVER
# (ORDER BY ...) funnels 100 TB through ONE task.
# --------------------------------------------------------------------------
@query(
    "doc_stable_ids",
    oracle="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT)
             AS stable_id
    FROM documents
    """,
)
def doc_stable_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 0-based ids in doc_id order, computed with NO
    unpartitioned window: repartitionByRange(32, doc_id) gives
    ordered disjoint key ranges (partition i's keys all precede
    partition i+1's), per-partition counts collect as ≤ 32 rows, a
    prefix sum over them on the driver yields each partition's global
    offset, and the id is offset + row_number within the partition.
    Three narrow stages; the only full-data exchange is the range
    partitioning itself. Boundaries are deterministic for a fixed
    lineage (RangePartitioner samples with a fixed seed), so the
    counts job and the output job see identical partitioning; at
    cluster scale you'd persist the ranged frame to pin it across
    the two jobs."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ranged = docs.repartitionByRange(32, "doc_id").withColumn(
        "pid", F.spark_partition_id()
    )
    counts = ranged.groupBy("pid").count().collect()
    acc = 0
    offsets = []
    for row in sorted(counts, key=lambda r: r["pid"]):
        offsets.append((row["pid"], acc))
        acc += row["count"]
    offsets_df = spark.createDataFrame(
        offsets, "pid: int, offset: bigint"
    )
    w = W.partitionBy("pid").orderBy("doc_id")
    return (
        ranged.withColumn("local_rank", F.row_number().over(w))
        .join(F.broadcast(offsets_df), "pid")
        .select(
            "doc_id",
            (F.col("offset") + F.col("local_rank") - 1).alias(
                "stable_id"
            ),
        )
    )


# --------------------------------------------------------------------------
# Quantile normalization (Q-Q mapping): re-express each source's
# document-length distribution on the GLOBAL distribution's scale —
# the batch-effect correction that makes per-source signals
# comparable before corpus-wide thresholding (the same transform ML
# preprocessing applies across feature batches).
# --------------------------------------------------------------------------
@query(
    "doc_quantile_normalized_length",
    oracle="""
    WITH g AS (
      SELECT quantile_cont(n_chars,
               [x * 0.01 FOR x IN range(0, 101)]) AS grid
      FROM documents),
    pr AS (
      SELECT doc_id, source, n_chars,
             percent_rank() OVER (
               PARTITION BY source ORDER BY n_chars, doc_id) AS p
      FROM documents),
    m AS (
      SELECT doc_id, source, n_chars, p,
             CAST(floor(p * 100) AS INT) AS idx,
             p * 100 - floor(p * 100) AS frac
      FROM pr)
    SELECT doc_id, source, n_chars,
           ROUND(p, 6) AS source_pctile,
           ROUND(CASE WHEN idx >= 100 THEN grid[101]
                 ELSE grid[idx + 1]
                      + frac * (grid[idx + 2] - grid[idx + 1]) END,
                 4) AS normalized_length
    FROM m CROSS JOIN g
    ORDER BY doc_id
    """,
)
def doc_quantile_normalized_length(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Each doc's length re-expressed as the global length at the
    same percentile its length holds WITHIN ITS SOURCE: sources with
    systematically short docs stop looking uniformly low-quality.

    Scale shape: percent_rank is partitioned by source (the whole
    point — per-source distributions); the global reference is a
    101-point exact quantile grid from ONE 1-row aggregate
    (percentile(col, array)), broadcast to every task; the mapping
    is pure arithmetic (floor index + linear blend) inside codegen.
    No global window anywhere; the grid is the only global state and
    it is O(101) regardless of corpus size. Both engines use the
    standard (n-1)p interpolated quantile, so values hash-match
    exactly."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    grid_points = ",".join(str(x / 100.0) for x in range(101))
    g = docs.agg(
        F.expr(
            f"percentile(n_chars, array({grid_points}))"
        ).alias("grid")
    )
    pr_w = W.partitionBy("source").orderBy("n_chars", "doc_id")
    pr = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.percent_rank().over(pr_w).alias("p"),
    )
    idx = F.floor(F.col("p") * 100).cast("int")
    frac = F.col("p") * 100 - F.floor(F.col("p") * 100)
    lo = F.element_at(F.col("grid"), idx + 1)
    hi = F.element_at(F.col("grid"), idx + 2)
    return (
        pr.crossJoin(F.broadcast(g))
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round("p", 6).alias("source_pctile"),
            F.round(
                F.when(
                    idx >= 100, F.element_at(F.col("grid"), 101)
                ).otherwise(lo + frac * (hi - lo)),
                4,
            ).alias("normalized_length"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Temperature-scaled source mixture (multilingual-LM sampling weights).
# --------------------------------------------------------------------------
_MIX_ALPHA = 0.7


@query(
    "training_mix_temperature",
    oracle=f"""
    WITH per_src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source),
    tot AS (
      SELECT CAST(SUM(n_docs) AS DOUBLE) AS n_total,
             SUM(pow(CAST(n_docs AS DOUBLE), {_MIX_ALPHA})) AS z
      FROM per_src)
    SELECT p.source, p.n_docs,
           ROUND(p.n_docs / t.n_total, 6) AS natural_frac,
           ROUND(pow(CAST(p.n_docs AS DOUBLE), {_MIX_ALPHA}) / t.z, 6)
             AS temp_frac,
           ROUND((pow(CAST(p.n_docs AS DOUBLE), {_MIX_ALPHA}) / t.z)
                 / (p.n_docs / t.n_total), 4) AS boost,
           CAST(ROUND(pow(CAST(p.n_docs AS DOUBLE), {_MIX_ALPHA}) / t.z
                      * t.n_total) AS BIGINT) AS target_docs
    FROM per_src p CROSS JOIN tot t
    ORDER BY p.source
    """,
)
def training_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights per source — the
    multilingual-LM mixture rule w_i = p_i^alpha / sum_j p_j^alpha
    (alpha=0.7): upsamples tail sources, downsamples the head, and
    reports the per-source boost factor and the resampled target doc
    count at the corpus's own size.

    Scale: one shuffle (source rollup, pre-aggregated map-side); the
    normalizer is a 1-row broadcast. The p_i^alpha / sum p_j^alpha
    form cancels N^alpha, so it's computed directly on counts —
    identical association in both engines, ROUND hash-stable."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = per_src.agg(
        F.sum("n_docs").cast("double").alias("n_total"),
        F.sum(F.pow(F.col("n_docs").cast("double"), _MIX_ALPHA)).alias("z"),
    )
    temp = F.pow(F.col("n_docs").cast("double"), _MIX_ALPHA) / F.col("z")
    nat = F.col("n_docs") / F.col("n_total")
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.round(nat, 6).alias("natural_frac"),
            F.round(temp, 6).alias("temp_frac"),
            F.round(temp / nat, 4).alias("boost"),
            F.round(temp * F.col("n_total"))
            .cast("long")
            .alias("target_docs"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Curriculum ordering: difficulty-ranked training phases per language.
# --------------------------------------------------------------------------
_CURRICULUM_PHASES = 4


@query(
    "doc_curriculum_phases",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_tokens
      FROM documents),
    ranked AS (
      SELECT doc_id, lang, n_tokens,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_tokens, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY lang) AS cnt
      FROM scored)
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(LEAST(CAST(ceil(rk * {_CURRICULUM_PHASES}.0 / cnt)
                           AS INTEGER),
                      {_CURRICULUM_PHASES}) AS INTEGER) AS phase
    FROM ranked
    ORDER BY doc_id
    """,
)
def doc_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning phase assignment: rank documents within
    each language by a difficulty proxy (token count — swap in
    perplexity or quality score for a real run) and cut into 4
    equal-count phases, easiest first — the deterministic ordering a
    curriculum training loop consumes shard by shard.

    Scale: difficulty is row-local; the only shuffle is the per-lang
    rank window (language-partitioned — never global). Phase = the
    ceil of the rank fraction, integer arithmetic end to end; the
    (n_tokens, doc_id) tie-break makes ranks engine-identical."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    scored = docs.select(
        "doc_id",
        "lang",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
        )
        .cast("long")
        .alias("n_tokens"),
    )
    w = W.partitionBy("lang").orderBy("n_tokens", "doc_id")
    cw = W.partitionBy("lang")
    ranked = scored.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(cw).alias("cnt"),
    )
    phase = F.least(
        F.ceil(F.col("rk") * float(_CURRICULUM_PHASES) / F.col("cnt")).cast(
            "int"
        ),
        F.lit(_CURRICULUM_PHASES),
    )
    return ranked.select(
        "doc_id", "lang", "n_tokens", phase.cast("int").alias("phase")
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Token-budget projection: temperature mix x tokenizer cost per source.
# --------------------------------------------------------------------------
@query(
    "token_budget_projection",
    oracle=f"""
    WITH pt AS (
      SELECT source,
             list_sum([(length(t) + 3) // 4 for t in
               regexp_extract_all(text,
                 '''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')])
               AS n_sub
      FROM documents),
    per_src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_sub) AS BIGINT) AS n_tokens
      FROM pt GROUP BY source),
    tot AS (
      SELECT SUM(pow(CAST(n_docs AS DOUBLE), 0.7)) AS z,
             CAST(SUM(n_tokens) AS DOUBLE) AS all_tokens
      FROM per_src)
    SELECT p.source, p.n_docs, p.n_tokens,
           ROUND(pow(CAST(p.n_docs AS DOUBLE), 0.7) / t.z, 6) AS mix_weight,
           CAST(ROUND(pow(CAST(p.n_docs AS DOUBLE), 0.7) / t.z
                      * t.all_tokens) AS BIGINT) AS budget_tokens,
           ROUND((pow(CAST(p.n_docs AS DOUBLE), 0.7) / t.z * t.all_tokens)
                 / p.n_tokens, 4) AS epochs_implied
    FROM per_src p CROSS JOIN tot t
    ORDER BY p.source
    """,
)
def token_budget_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone mix-planning report: per source, its actual token
    cost (BPE-ish estimate), the temperature-0.7 mixture weight, the
    projected token budget at the corpus's own total, and the implied
    epoch count (budget / available tokens — >1 means that source
    repeats, the over-sampling signal reviewers check before a
    training run).

    Scale: tokenization is row-local codegen; ONE source rollup
    shuffle; the normalizer/total is a 1-row broadcast. Token counts
    are exact BIGINTs, the p^0.7 algebra matches
    training_mix_temperature's association order."""
    docs = load_table(spark, sf_dir, "documents")
    from se_data_pipeline_spark.queries.text import _BPE_SPLIT

    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_SPLIT), 0)
    n_sub = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.floor((F.length(t) + 3) / 4).cast("long"),
    )
    per_src = (
        docs.select("source", n_sub.alias("n_sub"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_sub").cast("long").alias("n_tokens"),
        )
    )
    tot = per_src.agg(
        F.sum(F.pow(F.col("n_docs").cast("double"), 0.7)).alias("z"),
        F.sum("n_tokens").cast("double").alias("all_tokens"),
    )
    wgt = F.pow(F.col("n_docs").cast("double"), 0.7) / F.col("z")
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(wgt, 6).alias("mix_weight"),
            F.round(wgt * F.col("all_tokens"))
            .cast("long")
            .alias("budget_tokens"),
            F.round(
                F.try_divide(wgt * F.col("all_tokens"), F.col("n_tokens")),
                4,
            ).alias("epochs_implied"),
        )
        .orderBy("source")
    )
