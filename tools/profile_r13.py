"""r13 optimization loop: time queries with the bench's methodology
(fresh session, untimed warmup, toPandas materialization, min-of-N)
and optionally dump .explain("formatted") to plans/r13/.

Usage:
    python tools/profile_r13.py [--plan SUFFIX] [--n N] [sf_dir] query [query ...]

--plan before  -> writes plans/r13/<query>_before.txt
--plan after   -> writes plans/r13/<query>_after.txt
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from se_data_pipeline_spark.queries import all_queries
from se_data_pipeline_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    plan_suffix = None
    n_passes = 2
    while args and args[0].startswith("--"):
        if args[0] == "--plan":
            plan_suffix = args[1]
            args = args[2:]
        elif args[0] == "--n":
            n_passes = int(args[1])
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
    names = args
    spark = get_spark("profile_r13")
    qs = all_queries()

    # same untimed warmup as bench.py's _worker
    spark.range(2_000_000).selectExpr("sum(id % 97) AS s").toPandas()
    (
        spark.range(0, 200_000, 1, 8)
        .selectExpr("id % 1000 AS k")
        .groupBy("k")
        .count()
        .toPandas()
    )
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).toPandas()

    for name in names:
        if plan_suffix:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(HERE, "plans", "r13", f"{name}_{plan_suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path}", flush=True)
        samples = []
        rows = None
        for _ in range(n_passes):
            spark.sparkContext.setJobDescription(f"r13:{name}")
            t0 = time.perf_counter()
            pdf = qs[name](spark, sf_dir).toPandas()
            samples.append(round(time.perf_counter() - t0, 3))
            rows = len(pdf)
        if samples:  # --n 0 = plan-dump-only mode
            print(
                f"{name:40s} min={min(samples):8.3f}s  rows={rows}  "
                f"samples={samples}",
                flush=True,
            )


if __name__ == "__main__":
    main()
