"""Mechanical tripwire for non-spilling aggregation buffers.

`collect_list`/`collect_set` buffers in ObjectHashAggregate do NOT
spill, so an unbounded per-key history is a task-OOM at the 100 TB
target. The repo's policy (VERDICT r5 watch item, closed in r6):
every such site must EITHER be fed through one of the spill-safe cap
helpers (`_cap_per_key` / `_cap_bucket` / `_cap_order_lines` — a
row_number pre-filter riding the aggregate's own hash partitioning)
OR carry an explicit `# BOUNDED:` annotation stating why the buffer
is bounded by construction (fixed domain, per-dimension entries,
post-LIMIT input, playlist/VAD domain bounds).

This test enforces the policy textually: a new collect site without a
cap call or a BOUNDED annotation in its enclosing function fails the
suite with a pointer to the policy. Textual scope (the enclosing
`def`) is deliberate — helpers called from elsewhere annotate at the
collect site itself, keeping the reason next to the buffer it
justifies.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "se_data_pipeline_spark"

SCAN_DIRS = ["queries", "plans", "streaming"]

CAP_MARKERS = (
    "_cap_per_key(",
    "_cap_bucket(",
    "_cap_order_lines(",
    "# BOUNDED:",
)

COLLECT_RE = re.compile(r"F\.collect_(list|set)\(")
DEF_RE = re.compile(r"^(def |    def |@)")


def _enclosing_block(lines: list[str], idx: int) -> list[str]:
    """Lines from the enclosing top-level def/decorator to idx."""
    start = 0
    for j in range(idx, -1, -1):
        if lines[j].startswith("def ") or lines[j].startswith("@"):
            start = j
            break
    return lines[start : idx + 1]


def test_every_collect_buffer_is_capped_or_annotated():
    offenders = []
    for d in SCAN_DIRS:
        for path in sorted((PKG / d).glob("*.py")):
            lines = path.read_text().split("\n")
            for i, ln in enumerate(lines):
                if not COLLECT_RE.search(ln):
                    continue
                block = "\n".join(_enclosing_block(lines, i))
                if not any(m in block for m in CAP_MARKERS):
                    offenders.append(f"{path.relative_to(PKG.parent)}:{i + 1}")
    assert not offenders, (
        "collect_list/collect_set sites without a cap helper or a "
        "'# BOUNDED:' annotation in their enclosing function "
        "(aggregation buffers do not spill — cap the input via "
        "_cap_per_key/_cap_bucket/_cap_order_lines or annotate the "
        f"domain bound): {offenders}"
    )


def test_strict_cap_passes_under_cap_and_raises_above(spark):
    """strict=True _cap_per_key never truncates: under the cap every
    row passes through untouched; above it the job FAILS LOUDLY at
    execution time (the r7 policy for oracle-parity queries whose
    answers are totals — silent truncation would change them)."""
    import pytest
    from pyspark.sql import functions as F

    from se_data_pipeline_spark.queries.events import _cap_per_key

    df = spark.range(10).select(
        (F.col("id") % 2).alias("k"),
        F.col("id").alias("ord"),
        (F.col("id") * 1.5).alias("v"),
    )
    ok = _cap_per_key(df, ["k"], [], cap=5, strict=True, guard_col="v")
    got = sorted(r["v"] for r in ok.collect())
    assert got == sorted(i * 1.5 for i in range(10))  # nothing dropped

    tight = _cap_per_key(df, ["k"], [], cap=4, strict=True, guard_col="v")
    with pytest.raises(Exception, match="_cap_per_key\\(strict\\)"):
        tight.collect()


def test_strict_cap_rejects_bad_arguments(spark):
    """strict mode never truncates, so 'first N by ...' semantics do
    not exist: a non-empty order_cols is rejected rather than
    silently ignored; guard_col must be a consumed non-key column."""
    import pytest
    from pyspark.sql import functions as F

    from se_data_pipeline_spark.queries.events import _cap_per_key

    df = spark.range(4).select(
        (F.col("id") % 2).alias("k"), F.col("id").alias("v")
    )
    with pytest.raises(ValueError, match="order_cols"):
        _cap_per_key(df, ["k"], ["v"], strict=True, guard_col="v")
    with pytest.raises(ValueError, match="guard_col"):
        _cap_per_key(df, ["k"], [], strict=True)
    with pytest.raises(ValueError, match="guard_col"):
        _cap_per_key(df, ["k"], [], strict=True, guard_col="k")
