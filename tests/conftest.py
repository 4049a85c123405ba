"""Shared pytest fixtures: one SparkSession per test session.

Small local session (4 threads, 4 shuffle partitions) — unit tests
verify semantics on tiny frames; the scale knobs live in
session.get_spark and are exercised by bench.py / the driver.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from se_data_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
