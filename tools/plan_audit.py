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
- uw: unpartitioned Window nodes (whole input funnels through ONE
  task — the round-2 doc_rank_fusion scale-killer class). Hard fail.
- eager: Spark jobs executed DURING plan construction (a collect()
  in the query constructor). Hard fail: an eager query breaks the
  lazy-build contract and hides its data-sized subplan from every
  other column of this audit (the round-5 attribution_markov_removal
  blind spot).

Usage: python tools/plan_audit.py [sf_dir]
Exit code 1 if any plan contains a CartesianProduct, an unpartitioned
Window, or runs jobs at construction time (all are never intended).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from se_data_pipeline_spark.session import get_spark


def _top_level_groups(s: str) -> int:
    """Count top-level [...] groups in a plan-node label."""
    depth = groups = 0
    for ch in s:
        if ch == "[":
            if depth == 0:
                groups += 1
            depth += 1
        elif ch == "]":
            depth = max(0, depth - 1)
    return groups


def count_unpartitioned_windows(plan: str) -> int:
    """WindowExec prints `Window [exprs], [part], [order]` when both
    specs are set, and a 2-group form when one is empty:
    `Window [exprs], [order]` (unpartitioned — the bad case) or
    `Window [exprs], [part]` (partitioned, unordered — fine). The two
    are distinguished by ASC/DESC markers in the trailing group
    (verified against Spark 4.1). Also flags WindowGroupLimit with an
    empty partition list."""
    n = 0
    for line in plan.splitlines():
        label = line.lstrip(" :+-*(0123456789)")
        if label.startswith("Window ") and _top_level_groups(label) < 3:
            tail = label[label.rindex("["):]
            if " ASC " in tail or " DESC " in tail:
                n += 1
        if label.startswith("WindowGroupLimit []"):
            n += 1
    return n


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit")
    tracker = spark.sparkContext.statusTracker()
    bad = []
    print(f"{'query':<36} exch bcast py scans pushed topk nlj uw eager")
    for name, fn in sorted(entrymod.queries().items()):
        jobs_before = len(tracker.getJobIdsForGroup(None))
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
        eager = len(tracker.getJobIdsForGroup(None)) - jobs_before
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
        uw = count_unpartitioned_windows(plan)
        if cart or uw or eager:
            bad.append(name)
        print(
            f"{name:<36} {exch:>4} {bcast:>5} {py:>2} {scans:>5} "
            f"{pushed:>6} {topk:>4} {nlj:>3} {uw:>2} {eager:>5}"
            f"{'  CARTESIAN!' if cart else ''}"
            f"{'  UNPARTITIONED-WINDOW!' if uw else ''}"
            f"{'  EAGER-JOBS!' if eager else ''}"
        )
    if bad:
        print(f"FAILED: {bad}")
        return 1
    print("no cartesian products, no unpartitioned windows, "
          "no eager plan-build jobs; audit complete")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
