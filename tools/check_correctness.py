"""Local mirror of the driver's correctness gate.

Runs every query in ``__spark_entry__.queries()`` through Spark AND
its DuckDB oracle on the same parquet tables, then compares
row-count, column names, and order-insensitive values — going through
pandas on BOTH sides, exactly like the driver's canonicalization, so
it also catches:

- list/ndarray/dict cells (the driver's sort_values dies on them:
  "unhashable type: 'list'") — flagged even for rows-only queries;
- numeric dtype skew (e.g. DuckDB SUM(int) -> HUGEINT -> float64 vs
  Spark bigint -> int64), which hash-mismatches despite equal values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       python tools/check_correctness.py [sf_dir] --sample N [--seed S]

--sample N draws N queries uniformly without replacement from the
registry (seeded by --seed, default 0) — rotate the seed per round to
sweep the blind spot a fixed driver sample leaves (the driver gate
sampled the identical 50-query set in r4 and r5, so 168 of 254
registry queries were never driver-checked; see README "Correctness
gate" for the rotation recipe).

Set SPARK_GRAFT_PLAIN=1 to run with a PLAIN default SparkSession
(driver simulation: ANSI on, 200 shuffle partitions, no tuned confs)
instead of the tuned session factory — catches results that depend on
session tuning (e.g. float summation order across partition counts).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from se_data_pipeline_spark.catalog import RELATIONAL_TABLES
from se_data_pipeline_spark.session import get_spark


def unhashable_cols(pdf: pd.DataFrame) -> list[str]:
    """Columns whose cells would break pandas sort_values/factorize."""
    bad = []
    for c in pdf.columns:
        if pdf[c].dtype == object:
            head = pdf[c].head(50)
            if any(isinstance(v, (list, np.ndarray, dict, set)) for v in head):
                bad.append(c)
    return bad


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return repr(round(f, 9) + 0.0)
    if isinstance(v, np.integer):
        return repr(int(v))
    if isinstance(v, np.bool_):
        return repr(bool(v))
    return repr(v)


def canon(pdf: pd.DataFrame):
    """Driver-style canonical form: columns sorted by name, rows sorted,
    cells normalized. Returns (cols, matrix, dtype_kinds)."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    mat = sorted(
        tuple(norm_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    kinds = [pdf[c].dtype.kind for c in cols]
    return cols, mat, kinds


def main() -> int:
    args = sys.argv[1:]
    sample_n, seed = None, 0
    if "--sample" in args:
        i = args.index("--sample")
        sample_n = int(args[i + 1])
        del args[i : i + 2]
    if "--seed" in args:
        i = args.index("--seed")
        seed = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    if os.environ.get("SPARK_GRAFT_PLAIN"):
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("check_plain")
            .master("local[8]")
            .getOrCreate()
        )
    else:
        spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in RELATIONAL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        # explicit names win over --sample: validate against the FULL
        # registry (not a sampled subset — a valid name the seed
        # didn't pick must not report 'unknown') and run exactly them
        unknown = only - set(qs)
        if unknown:
            print(f"FAIL  unknown query names: {', '.join(sorted(unknown))}")
            return 1
        qs = {n: fn for n, fn in qs.items() if n in only}
    elif sample_n is not None:
        import random

        names = sorted(qs)
        picked = random.Random(seed).sample(names, min(sample_n, len(names)))
        qs = {n: qs[n] for n in picked}
        print(f"sampled {len(qs)} queries (seed={seed}): "
              f"{', '.join(sorted(qs))}\n")
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        bad = unhashable_cols(spdf)
        if bad:
            print(f"FAIL  {name}: unhashable (array/map) result columns "
                  f"{bad} — driver canonicalization would crash")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(spdf)} rows, "
                  f"{time.time()-t0:.1f}s) — no oracle")
            continue
        try:
            opdf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue

        s_cols, s_mat, s_kinds = canon(spdf)
        o_cols, o_mat, o_kinds = canon(opdf)
        status = []
        if len(spdf) != len(opdf):
            status.append(f"rowcount {len(spdf)} vs {len(opdf)}")
        if s_cols != o_cols:
            status.append(f"cols {s_cols} vs {o_cols}")
        elif s_kinds != o_kinds:
            status.append(
                "dtype kinds differ (hash would mismatch): "
                f"spark={list(zip(s_cols, s_kinds))} "
                f"oracle={list(zip(o_cols, o_kinds))}"
            )
        if not status and s_mat != o_mat:
            diff = next(
                (i, a, b)
                for i, (a, b) in enumerate(zip(s_mat, o_mat))
                if a != b
            )
            status.append(f"values differ at sorted row {diff[0]}: "
                          f"spark={diff[1]} oracle={diff[2]}")
        if status:
            print(f"FAIL  {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"ok    {name}: {len(spdf)} rows match "
                  f"({time.time()-t0:.1f}s)")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
