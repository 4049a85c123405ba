"""Physical-plan audit across the whole query registry.

For every query in __spark_entry__.queries(), builds the plan at the
given sf_dir and reports the scale-relevant physical signals:

- exchanges: shuffle count (hash/range partitionings)
- bcast: broadcast joins (dimension strategy working)
- python: Arrow/pandas stages (should exist ONLY where vectorized
  math needs them)
- scans / pushed: parquet scans and whether any carries PushedFilters
- topk: TakeOrderedAndProject (true top-k instead of global sort)
- nlj: BroadcastNestedLoopJoin occurrences — expected ONLY for
  1-row broadcast crossJoins (scalar subquery / query-vector
  patterns); anything else is a red flag

Usage: python tools/plan_audit.py [sf_dir]
Exit code 1 if any plan contains a CartesianProduct (never intended).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from se_data_pipeline_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit")
    bad = []
    print(f"{'query':<36} exch bcast py scans pushed topk nlj")
    for name, fn in sorted(entrymod.queries().items()):
        try:
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:  # audit must not die on one query
            print(f"{name:<36} ERROR {type(exc).__name__}")
            bad.append(name)
            continue
        exch = plan.count("Exchange ")
        bcast = plan.count("BroadcastHashJoin")
        py = (
            plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
        )
        scans = plan.count("FileScan")
        pushed = "y" if "PushedFilters: [" in plan and not all(
            seg.startswith("]")
            for seg in plan.split("PushedFilters: [")[1:]
        ) else "-"
        topk = "y" if "TakeOrderedAndProject" in plan else "-"
        nlj = plan.count("BroadcastNestedLoopJoin")
        cart = "CartesianProduct" in plan
        if cart:
            bad.append(name)
        print(
            f"{name:<36} {exch:>4} {bcast:>5} {py:>2} {scans:>5} "
            f"{pushed:>6} {topk:>4} {nlj:>3}{'  CARTESIAN!' if cart else ''}"
        )
    if bad:
        print(f"FAILED: {bad}")
        return 1
    print("no cartesian products; audit complete")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
