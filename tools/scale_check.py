"""Scale-linearity check: replicate the sf0.1 tables K times with
key-shifting (per-key cardinalities preserved — each replica gets its
own order/doc/user key range), then time representative queries at 1x
and Kx and report the runtime ratio.

A query whose plan holds up should scale ~linearly (ratio ~= K on a
fixed-core box, better when the 1x run underfills the cores); a
quadratic candidate-pair blowup or a driver-side bottleneck shows up
as ratio >> K. Writes the synthetic tables under
.scale_tmp/sfX{K}/ (gitignored) and reuses them when present.

Usage: python tools/scale_check.py [K] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from se_data_pipeline_spark.catalog import RELATIONAL_TABLES, load_table
from se_data_pipeline_spark.queries import all_queries
from se_data_pipeline_spark.session import get_spark

BASE = "/root/testdata/sf0.1"

# key columns to shift per replica so join fan-outs stay realistic
SHIFT_COLS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

DEFAULT_QUERIES = [
    "pricing_summary",
    "top_revenue_orders",
    "returned_item_ranking",
    "user_sessions",
    "events_rolling_24h",
    "dedup_exact_groups",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "doc_chunks",
    "token_bin_packing",
]


def build_scaled(spark, k: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in RELATIONAL_TABLES:
        dst = f"{out_dir}/{t}.parquet"
        if os.path.exists(dst):
            continue
        df = load_table(spark, BASE, t)
        shifts = SHIFT_COLS.get(t)
        if not shifts:
            df.write.mode("overwrite").parquet(dst)  # small dims as-is
            continue
        offs = {c: df.agg(F.max(c)).collect()[0][0] + 1 for c in shifts}
        reps = None
        for i in range(k):
            r = df
            for c, off in offs.items():
                r = r.withColumn(c, F.col(c) + F.lit(i * off))
            reps = r if reps is None else reps.unionByName(r)
        reps.write.mode("overwrite").parquet(dst)


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark("scale_check")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_tmp",
        f"sfX{k}",
    )
    build_scaled(spark, k, out_dir)

    qs = all_queries()
    qs["pricing_summary"](spark, BASE).collect()  # warm
    print(f"{'query':<28} {'1x':>7} {f'{k}x':>7} {'ratio':>6}")
    for name in names:
        ts = {}
        for label, sf in (("1x", BASE), (f"{k}x", out_dir)):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, sf).toPandas()
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            ts[label] = best
        ratio = ts[f"{k}x"] / ts["1x"]
        print(f"{name:<28} {ts['1x']:>7.2f} {ts[f'{k}x']:>7.2f} {ratio:>6.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
