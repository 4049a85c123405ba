"""Join helpers beyond Spark's built-in strategies: skew mitigation
and an as-of (temporal) join.

AQE's skew-join splitting handles most hot keys at runtime
(session.py enables it); the explicit salted forms are for the cases
AQE can't fix — a hot key inside a single aggregation group, or a
broadcast-ineligible dimension join against a pathologically skewed
fact key. The salt widens one hot key into `salt` sub-keys so the
work spreads across tasks, then a second cheap step removes the salt.

`asof_join` fills a gap in Spark's operator set (no built-in ASOF):
it is built as a composition of union + window, not a range-condition
theta join, so it stays linear at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

SALT_COL = "__salt"
_ASOF_ORD = "__asof_ord"
_ASOF_SIDE = "__asof_side"
_ASOF_PAYLOAD = "__asof_payload"


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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join: every left row gains the columns of the single
    right row that is, per `on` key, the latest with
    right_ts <= left_ts (backward) or the earliest with
    right_ts >= left_ts (forward); both inclusive. Left rows with no
    qualifying right row get nulls (LEFT ASOF semantics). Carried
    columns are renamed `<col><suffix>`.

    NOT implemented as a range-condition join: that rescans the right
    side per left row (quadratic per key) and can't broadcast when
    both sides are big. Instead: tag each side, union, and run one
    running `last(ignoreNulls)` window ordered by the time axis — a
    single exchange + sort on `on`, linear in |L|+|R|, the plan shape
    that survives 100 TB. All carried columns travel in ONE struct so
    the matched row is carried atomically (no cross-row mixing when a
    right column is null). Skew: a hot key serializes its sort;
    pre-split with time-bucketed keys and carry across boundaries if
    one key dominates.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    payload_t = T.StructType(
        [T.StructField(c, rtypes[c]) for c in right_cols]
    )

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias(_ASOF_ORD),
        F.lit(1).alias(_ASOF_SIDE),
        F.lit(None).cast(payload_t).alias(_ASOF_PAYLOAD),
    )
    rhs = right.select(
        *[
            F.lit(None).cast(ltypes[c]).alias(c)
            for c in left.columns
            if c not in keys
        ],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(_ASOF_ORD),
        F.lit(0).alias(_ASOF_SIDE),
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias(
            _ASOF_PAYLOAD
        ),
    )

    ord_col = (
        F.col(_ASOF_ORD).asc()
        if direction == "backward"
        else F.col(_ASOF_ORD).desc()
    )
    # At equal timestamps the right row sorts first (side 0 < 1), so
    # the boundary match is inclusive in both directions.
    w = (
        W.partitionBy(*keys)
        .orderBy(ord_col, F.col(_ASOF_SIDE).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = F.last(F.col(_ASOF_PAYLOAD), ignorenulls=True).over(w)
    return (
        lhs.unionByName(rhs)
        .withColumn(_ASOF_PAYLOAD, carried)
        .filter(F.col(_ASOF_SIDE) == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[
                F.col(f"{_ASOF_PAYLOAD}.{c}").alias(c + suffix)
                for c in right_cols
            ],
        )
    )
