"""Unit tests for the plan-audit string parser: the unpartitioned-
window detector must flag `Window [exprs], [order]` (empty partition
spec) while passing `Window [exprs], [part], [order]` and the
partitioned-unordered `Window [exprs], [part]` form."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from plan_audit import count_unpartitioned_windows

UNPART = (
    "+- Window [row_number() windowspecdefinition(id#0L ASC NULLS FIRST, "
    "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) "
    "AS r#2], [id#0L ASC NULLS FIRST]"
)
PART = (
    "+- Window [row_number() windowspecdefinition(g#1L, id#0L ASC NULLS "
    "FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), "
    "currentrow$())) AS r#4], [g#1L], [id#0L ASC NULLS FIRST]"
)
PART_UNORDERED = (
    "+- Window [count(1) windowspecdefinition(simhash#6L, "
    "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
    "unboundedfollowing$())) AS n_same#8L], [simhash#6L]"
)


def test_flags_unpartitioned_ordered_window():
    assert count_unpartitioned_windows(UNPART) == 1


def test_passes_fully_specified_window():
    assert count_unpartitioned_windows(PART) == 0


def test_passes_partitioned_unordered_window():
    assert count_unpartitioned_windows(PART_UNORDERED) == 0


def test_mixed_plan_counts_only_bad_nodes():
    plan = "\n".join([PART, UNPART, PART_UNORDERED, UNPART])
    assert count_unpartitioned_windows(plan) == 2


def test_window_group_limit_empty_partition_flagged():
    assert count_unpartitioned_windows(
        "   +- WindowGroupLimit [], [x#1 DESC], rank, 3"
    ) == 1
