"""Duplicate-scan gate: flag queries whose EXECUTED plan reads the
same parquet scan (identical normalized FileScan line: same columns,
same pushed filters) more than once in the final adaptive plan —
i.e. the table is genuinely scanned and pre-aggregated multiple
times at runtime.

A reused exchange can never account for a PRINTED duplicate scan:
when AQE reuses an exchange, the reused subtree prints as a
`ReusedExchange [...]` LEAF and its FileScan does not print again
(verified on supplier_quality_rank post-fix: one lineitem scan line
+ one ReusedExchange line). r7's version skipped any query whose
plan contained a ReusedExchange anywhere, which could hide a
genuinely duplicated scan elsewhere in the same plan (ADVICE r7);
duplicates are now flagged unconditionally and adjudicated via
DUP_OK only.

Why this is its own gate and not a plan_audit column: plan_audit
inspects the STATIC plan, where duplicate subtrees are normal (AQE
inserts ReusedExchange only at runtime, per-query). This check
EXECUTES each query (sf0.001 by default — shape, not volume, is what
matters) and inspects the finalized adaptive plan, which is the only
place runtime reuse is visible.

The r7 find that motivated it: supplier_quality_rank's equi-join
pushed isnotnull(l_suppkey) into one of two structurally identical
stats subtrees, de-canonicalizing them, so AQE never reused the
exchange and the lineitem scan + partial aggregate ran twice. The fix
(filter both branches identically) is invisible to every static gate.

DUP_OK lists queries whose repeated scans are the documented
algorithm, not an accident (each names the docstring that adjudicates
it). Any other query with unreused duplicate scans fails.

Known blind spot: a localCheckpoint() lineage cut hides its upstream
subtree from the final plan string (the checkpoint prints as Scan
ExistingRDD) — but a checkpointed subtree executes exactly once by
construction, which is precisely the property this gate checks, so
the blind spot cannot hide a duplicate.

Usage: python tools/dup_scan_check.py [sf_dir] [query ...]
Exit 1 on unadjudicated duplicate scans.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from se_data_pipeline_spark.queries import all_queries
from se_data_pipeline_spark.session import get_spark

# Adjudicated multi-pass algorithms: the duplicate scan IS the
# documented exact form (see each query's docstring).
DUP_OK = {
    "value_outliers_by_type": (
        "exact median/MAD needs three grouped passes over the fact; "
        "the runnable one-grouped-pass 100 TB alternative is "
        "value_outliers_by_type_sketch (r8). The passes join "
        "broadcast stats, so there is no exchange to reuse"
    ),
    "value_outliers_by_type_sketch": (
        "the PRODUCTION plan is the single sketch pass; the extra "
        "scans are the exact accuracy-contract twins the docstring "
        "documents (supplier_distinct_parts_approx precedent) and "
        "production drops them"
    ),
}

_ID_RE = re.compile(r"#\d+L?")


def final_plan_section(plan: str) -> str:
    """An executed AdaptiveSparkPlan prints the FINAL plan followed by
    an '== Initial Plan ==' section; counting scans over the whole
    string double-counts everything. Keep only the final section."""
    return plan.split("== Initial Plan ==")[0]


def normalized_dup_scans(plan: str) -> dict[str, int]:
    """Exact-duplicate FileScan lines after expression-id erasure,
    counted over the FINAL plan section only."""
    scans = [
        _ID_RE.sub("#x", ln.strip())
        for ln in final_plan_section(plan).splitlines()
        if "FileScan parquet" in ln
    ]
    return {s: c for s, c in Counter(scans).items() if c >= 2}


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    qs = all_queries()
    names = args[1:] or sorted(qs)

    spark = get_spark("dup_scan_check")
    bad: list[str] = []
    for name in names:
        df = qs[name](spark, sf_dir)
        try:
            df.collect()  # finalize the adaptive plan
        except Exception as exc:  # noqa: BLE001 — report, keep going
            print(f"{name:<40} ERR {type(exc).__name__}")
            bad.append(name)
            continue
        plan = df._jdf.queryExecution().executedPlan().toString()
        dup = normalized_dup_scans(plan)
        if not dup:
            continue
        if name in DUP_OK:
            print(f"{name:<40} dup-ok: {DUP_OK[name][:60]}")
            continue
        bad.append(name)
        print(f"{name:<40} UNREUSED DUPLICATE SCANS:")
        for s, c in dup.items():
            print(f"    x{c} {s[:120]}")
    if bad:
        print(f"FAILED: {bad}")
        return 1
    print(
        f"{len(names)} queries: no unadjudicated duplicate scans "
        "in finalized plans"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
