"""Driver-contract tests: the query registry is complete and every
query executes on the smoke-scale tables (sf0.001) with a stable,
non-empty schema.

The value-level correctness gate is tools/check_correctness.py (DuckDB
oracle at sf0.01); this suite is the fast structural guard that runs
on every change.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from se_data_pipeline_spark.queries import all_oracles, all_queries


def test_registry_nonempty_and_oracles_subset():
    qs, oracles = all_queries(), all_oracles()
    assert len(qs) >= 32
    assert set(oracles) <= set(qs)


# Genuinely non-SQL-expressible operators may register without an
# oracle (the driver then records a weaker rows-only check, and the
# judge sees which). The registry has had ZERO such entries since r6;
# this pin makes dropping an oracle a deliberate, reviewed act
# instead of a silent coverage regression.
ROWS_ONLY_OK: set[str] = set()


def test_every_query_has_an_oracle():
    missing = set(all_queries()) - set(all_oracles()) - ROWS_ONLY_OK
    assert not missing, (
        f"queries without a DuckDB oracle (add one, or adjudicate in "
        f"ROWS_ONLY_OK with a reason): {sorted(missing)}"
    )


def test_entry_module_reexports():
    assert set(entrymod.queries()) == set(all_queries())
    assert entrymod.oracle_sql() == all_oracles()


def test_entry_flagship_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) > 1


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_executes_smoke(spark, sf_dir, name):
    """Every registered query runs end-to-end at sf0.001 and returns
    a frame with named columns. Row counts may legitimately be 0 at
    smoke scale (e.g. anti-joins); values are the oracle gate's job."""
    df = all_queries()[name](spark, sf_dir)
    assert df.columns, f"{name}: no columns"
    assert all(c and not c.startswith("_") for c in df.columns), df.columns
    df.collect()  # must not raise
