"""Robustness sweep: EVERY registry query must run (and typically
return 0 rows) against a corpus of empty tables — no .first()-on-None
crashes, no reshape-of-empty numpy, no 1/0 scalar terms. Empty
partitions/tables are routine at 100 TB (a fresh partition, an
all-filtered scan); operators that crash on them page someone."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from se_data_pipeline_spark.catalog import RELATIONAL_SCHEMAS


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for name, ddl in RELATIONAL_SCHEMAS.items():
        spark.createDataFrame([], ddl).write.mode("overwrite").parquet(
            os.path.join(d, f"{name}.parquet")
        )
    return d


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, fn in sorted(entrymod.queries().items()):
        try:
            fn(spark, empty_sf_dir).collect()
        except Exception as exc:  # noqa: BLE001 — we report them all
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, "\n".join(failures)
