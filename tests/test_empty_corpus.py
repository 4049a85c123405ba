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


@pytest.fixture(scope="module")
def degenerate_sf_dir(spark, tmp_path_factory):
    """1-row tables with edge values: zero prices/values (ANSI
    division traps), an EMPTY document and a 1-token document (no
    n-grams, no subwords), a single embedding (smaller than the PQ
    codebook)."""
    import datetime as _dt

    d = str(tmp_path_factory.mktemp("degen_sf"))
    dt = _dt.datetime
    rows = {
        "region": [(0, "R")],
        "nation": [(0, "N", 0)],
        "customer": [(1, "c", 0, 0.0, "SEG")],
        "supplier": [(1, "s", 0, 0.0)],
        "part": [(1, "p", "B", "T", 1, 0.0)],
        "orders": [(1, 1, "O", 0.0, dt(2020, 1, 1), "P")],
        "lineitem": [
            (1, 1, 1, 1, 0.0, 0.0, 0.0, 0.0, "N", "O", dt(2020, 1, 2))
        ],
        "events": [(1, dt(2020, 1, 1), 1, "view", 0.0, "{}")],
        "documents": [(0, "", "en", "src0", 0), (1, "a", "en", "src0", 1)],
        "embeddings": [(0, [0.0] * 64, 0)],
    }
    for name, ddl in RELATIONAL_SCHEMAS.items():
        spark.createDataFrame(rows[name], ddl).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"{name}.parquet"))
    return d


def test_every_query_survives_degenerate_rows(spark, degenerate_sf_dir):
    """Zero sums, empty strings, single tokens, sub-codebook vector
    counts: with ANSI mode on, an unguarded division or array index
    here is a production crash, not a NaN."""
    failures = []
    for name, fn in sorted(entrymod.queries().items()):
        try:
            fn(spark, degenerate_sf_dir).collect()
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, "\n".join(failures)


@pytest.fixture(scope="module")
def null_sf_dir(spark, tmp_path_factory):
    """Tables carrying NULLs in every nullable column: NULL document
    text, NULL embedding, NULL event value/type, NULL prices — the
    shapes real lakes contain that synthetic fixtures usually don't."""
    import datetime as _dt

    d = str(tmp_path_factory.mktemp("null_sf"))
    dt = _dt.datetime
    rows = {
        "region": [(0, "R"), (1, None)],
        "nation": [(0, "N", 0), (1, None, None)],
        "customer": [(1, "c", 0, 1.0, "SEG"), (2, None, None, None, None)],
        "supplier": [(1, "s", 0, 1.0), (2, None, None, None)],
        "part": [
            (1, "p", "B", "T", 1, 1.0),
            (2, None, None, None, None, None),
        ],
        "orders": [
            (1, 1, "O", 1.0, dt(2020, 1, 1), "P"),
            (2, 2, None, None, None, None),
        ],
        "lineitem": [
            (1, 1, 1, 1, 1.0, 1.0, 0.1, 0.1, "N", "O", dt(2020, 1, 2)),
            (2, 2, 2, 1, None, None, None, None, None, None, None),
        ],
        "events": [
            (1, dt(2020, 1, 1), 1, "view", 1.0, "{}"),
            (2, dt(2020, 1, 2), 2, None, None, None),
        ],
        "documents": [
            (0, "a b c d e f", "en", "src0", 11),
            (1, None, None, None, None),
        ],
        "embeddings": [(i, [0.1] * 64, 0) for i in range(16)]
        + [(99, None, None)],
    }
    for name, ddl in RELATIONAL_SCHEMAS.items():
        spark.createDataFrame(rows[name], ddl).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"{name}.parquet"))
    return d


def test_every_query_survives_nulls(spark, null_sf_dir):
    """NULL text/embedding/payload must flow as no-signature /
    no-score / NULL-stats rows through every Python kernel — never an
    AttributeError on None inside an executor."""
    failures = []
    for name, fn in sorted(entrymod.queries().items()):
        try:
            fn(spark, null_sf_dir).collect()
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, "\n".join(failures)


@pytest.fixture(scope="module")
def unicode_sf_dir(spark, tmp_path_factory):
    """Non-ASCII corpus: multibyte text (exercises every scalar
    non-ASCII fallback end-to-end) and non-numeric JSON field values
    (ANSI try_cast / try_variant_get paths)."""
    import datetime as _dt

    d = str(tmp_path_factory.mktemp("uni_sf"))
    dt = _dt.datetime
    uni = "héllo wörld ü ß 中文 🙂 a b c d e f g h i j"
    rows = {
        "region": [(0, "Région")],
        "nation": [(0, "Ñation", 0)],
        "customer": [(1, "çustömer", 0, 1.0, "SEG")],
        "supplier": [(1, "süpplier", 0, 1.0)],
        "part": [(1, "pärt", "B", "T", 1, 1.0)],
        "orders": [(1, 1, "O", 1.0, dt(2020, 1, 1), "P")],
        "lineitem": [
            (1, 1, 1, 1, 1.0, 1.0, 0.1, 0.1, "N", "O", dt(2020, 1, 2))
        ],
        "events": [(1, dt(2020, 1, 1), 1, "view", 1.0, '{"k": "vä"}')],
        "documents": [
            (0, uni, "de", "src0", len(uni)),
            (1, uni + " zz", "de", "src1", len(uni) + 3),
        ],
        "embeddings": [(i, [0.1] * 64, 0) for i in range(16)],
    }
    for name, ddl in RELATIONAL_SCHEMAS.items():
        spark.createDataFrame(rows[name], ddl).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"{name}.parquet"))
    return d


def test_every_query_survives_unicode_and_bad_json(spark, unicode_sf_dir):
    failures = []
    for name, fn in sorted(entrymod.queries().items()):
        try:
            fn(spark, unicode_sf_dir).collect()
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, "\n".join(failures)
