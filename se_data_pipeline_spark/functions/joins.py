"""Skew-mitigation join/aggregation helpers.

AQE's skew-join splitting handles most hot keys at runtime
(session.py enables it); these explicit forms are for the cases AQE
can't fix — a hot key inside a single aggregation group, or a
broadcast-ineligible dimension join against a pathologically skewed
fact key. The salt widens one hot key into `salt` sub-keys so the
work spreads across tasks, then a second cheap step removes the salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, salt: int) -> DataFrame:
    """Append a uniform random salt in [0, salt). Nondeterministic by
    design (load balancing) — never use the salt as data."""
    return df.withColumn(SALT_COL, (F.rand(seed=42) * salt).cast("int"))


def salted_count(df: DataFrame, key: str | Column, salt: int = 16) -> DataFrame:
    """Two-phase skew-safe count: groupBy(key, salt) partial counts
    (each hot key spreads over `salt` tasks), then re-aggregate by
    key. Same result as groupBy(key).count() with bounded per-task
    fan-in — the explicit form of map-side partial aggregation for
    extreme single-key skew."""
    return (
        with_salt(df, salt)
        .groupBy(key, SALT_COL)
        .agg(F.count(F.lit(1)).alias("partial_n"))
        .groupBy(key)
        .agg(F.sum("partial_n").alias("n"))
    )


def salted_join(
    skewed: DataFrame, dim: DataFrame, key: str, salt: int = 16
) -> DataFrame:
    """Skew-safe equi-join: salt the skewed fact side, replicate the
    dimension side `salt`× (explode a salt array), join on
    (key, salt). Result equals skewed.join(dim, key); per-task input
    for the hottest key shrinks by `salt`. Use when the dimension is
    too large to broadcast but small enough to replicate `salt`×."""
    salted_fact = with_salt(skewed, salt)
    replicated_dim = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_fact.join(replicated_dim, [key, SALT_COL]).drop(SALT_COL)
