"""End-to-end LLM training-corpus build — the extension counterpart
of the reference's E1 ingest pipeline (`plans/ingest.py`): where E1
turns channels into selected audio segments, this turns a raw
document table into leakage-safe, quality-gated, deduplicated,
hash-sharded training splits.

Stages (every one an already-oracle-checked registry operator):
  1. cross-modal curation gate — text quality × semantic dedup
     (`corpus_joint_curation`);
  2. leakage-safe split assignment keyed on the near-dup CLUSTER
     (`leakage_safe_splits`) so near-identical docs can never
     straddle train/val/test;
  3. per-split hash-sharded parquet emission with a manifest
     (`sources/layout.write_training_shards`).

The composition is pure DataFrame laziness until the writes: curation
verdicts and split labels join on doc_id (one key-partitioned join),
and only survivors flow into the shard writer. At 100 TB each stage
keeps its own scale shape (bucketed pair generation, iterative CC
with localCheckpoint, one-file-per-shard emission) — composing them
adds joins, never new funnels.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from se_data_pipeline_spark.catalog import load_table
from se_data_pipeline_spark.sources.layout import write_training_shards


def build_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_shards: int = 4,
) -> DataFrame:
    """Run the full corpus build; returns the per-(split, shard)
    manifest with doc/token/byte counts."""
    from se_data_pipeline_spark.queries.curation import corpus_joint_curation
    from se_data_pipeline_spark.queries.text import leakage_safe_splits

    verdicts = corpus_joint_curation(spark, sf_dir).select(
        "doc_id", "selected"
    )
    splits = leakage_safe_splits(spark, sf_dir).select("doc_id", "split")
    docs = load_table(spark, sf_dir, "documents")

    survivors = (
        docs.join(verdicts, "doc_id")
        .filter(F.col("selected"))
        .join(splits, "doc_id")
        .drop("selected")
    )

    manifests = []
    for split in ("train", "val", "test"):
        part = survivors.filter(F.col("split") == split).drop("split")
        m = write_training_shards(
            part, os.path.join(out_dir, split), n_shards=n_shards
        ).withColumn("split", F.lit(split))
        manifests.append(m)
    out = manifests[0]
    for m in manifests[1:]:
        out = out.unionByName(m)
    return out.select(
        "split", "shard", "n_docs", "n_tokens", "n_bytes"
    ).orderBy("split", "shard")
