"""Oracle-checked query registry.

Every operator the engine claims (SURVEY.md §2) is exposed here as a
named query over the driver's relational tables, together with an ANSI
SQL oracle that DuckDB runs on the same parquet files. The driver (and
our own tests) execute both and compare row-count + schema + value
hashes, so registration here IS the correctness contract.

Conventions (driver compare is column-name keyed, order-insensitive):
- alias every computed column identically in Spark and SQL;
- round floating aggregates in BOTH engines (summation order differs
  between Spark partial aggregation and DuckDB — identical after
  rounding);
- any LIMIT/top-k is preceded by a total order (unique tie-break key)
  so both engines select the same row set;
- DuckDB ``SUM(int)`` returns HUGEINT — cast to BIGINT in oracles to
  match Spark's long.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query (and its DuckDB oracle SQL) for the
    driver contract in ``__spark_entry__``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name, fn, oracle, doc=(fn.__doc__ or ""))
        return fn

    return deco


# Oracles composed from OTHER queries' oracles (serving.py) cannot
# resolve at their module's import time: text.py itself calls
# all_oracles() mid-import (its langid composition), which re-enters
# _load_all and imports serving while text's later registrations
# (doc_bm25_search) don't exist yet. Builders park here and resolve
# lazily at all_oracles() time, tolerating still-missing upstreams
# (a nested call resolves what it can; the post-import call resolves
# the rest).
_DEFERRED_ORACLES: dict[str, Callable[[], str | None]] = {}


def defer_oracle(name: str, builder: Callable[[], str | None]) -> None:
    _DEFERRED_ORACLES[name] = builder


def _resolve_deferred() -> None:
    for name in list(_DEFERRED_ORACLES):
        sql = _DEFERRED_ORACLES[name]()
        if sql is None:
            continue  # upstream not registered yet — retry next call
        qd = _REGISTRY[name]
        _REGISTRY[name] = QueryDef(qd.name, qd.fn, sql, qd.doc)
        del _DEFERRED_ORACLES[name]


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: qd.fn for name, qd in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    _resolve_deferred()
    return {name: qd.oracle for name, qd in _REGISTRY.items() if qd.oracle}


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (registration side-effect)."""
    global _LOADED
    if _LOADED:
        return
    from se_data_pipeline_spark.queries import (  # noqa: F401
        arrays,
        curation,
        events,
        multimodal,
        relational,
        sqlsurface,
        text,
        vectors,
    )
    # serving composes oracles registered by text/vectors — imported
    # LAST, deliberately outside the alphabetical block above
    from se_data_pipeline_spark.queries import serving  # noqa: F401

    _LOADED = True
