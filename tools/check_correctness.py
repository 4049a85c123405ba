"""Local mirror of the driver's correctness gate.

Runs every query in ``__spark_entry__.queries()`` through Spark AND
its DuckDB oracle on the same parquet tables, then compares
row-count, column names, and order-insensitive values (exact match
after the queries' own rounding).

Usage: python tools/check_correctness.py [sf_dir] [query ...]

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

import __spark_entry__ as entrymod
from se_data_pipeline_spark.catalog import RELATIONAL_TABLES
from se_data_pipeline_spark.session import get_spark


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and trim float repr noise
        return repr(round(v, 9) + 0.0)
    return repr(v)


def frame_signature(cols, rows):
    """Order-insensitive signature: sort columns by name, then rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], mat


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

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
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s) — no oracle")
            continue
        try:
            orel = con.sql(oracles[name])
            ocols = orel.columns
            orows = orel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue

        s_sig_cols, s_mat = frame_signature(scols, srows)
        o_sig_cols, o_mat = frame_signature(ocols, orows)
        status = []
        if len(srows) != len(orows):
            status.append(f"rowcount {len(srows)} vs {len(orows)}")
        if s_sig_cols != o_sig_cols:
            status.append(f"cols {s_sig_cols} vs {o_sig_cols}")
        if not status and s_mat != o_mat:
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(s_mat, o_mat)) if a != b
            )
            status.append(f"values differ at sorted row {diff[0]}: "
                          f"spark={diff[1]} oracle={diff[2]}")
        if status:
            print(f"FAIL  {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"ok    {name}: {len(srows)} rows match "
                  f"({time.time()-t0:.1f}s)")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
