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
_BLOOM_WORDS = "__bloom_words"


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


def _bloom_positions(key: Column, n_bits: int, k: int) -> list[Column]:
    """k bit positions for `key` via Kirsch–Mitzenmacher double
    hashing over one xxhash64 value: pos_i = (h1 + i*h2) mod n_bits.
    h1 uses the low bits, h2 disjoint high bits (so the two strides
    are independent for n_bits ≤ 2^17); every product stays below
    k * n_bits, so the arithmetic can never trip ANSI overflow."""
    h = F.xxhash64(key)
    h1 = F.pmod(h, F.lit(n_bits))
    # +1 keeps the stride non-zero (h2 == 0 would pin all k probes
    # to the same bit and inflate the false-positive rate).
    h2 = F.pmod(F.shiftrightunsigned(h, 17), F.lit(n_bits - 1)) + F.lit(1)
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(k)]


def bloom_build(build: DataFrame, key: str | Column, n_bits: int = 1 << 17,
                k: int = 3) -> list[int]:
    """Aggregate the build side's join keys into a bloom bitset,
    returned as n_bits/64 longs (16 KiB at the default 2^17 bits —
    a broadcast-sized summary of arbitrarily many keys).

    This is the explicit form of the runtime filter Catalyst injects
    for big joins (InjectRuntimeFilters): at 100 TB, shipping a KB-
    scale bitset to every probe-side task and filtering BEFORE the
    shuffle beats shuffling rows that the join will drop anyway. The
    build job is one explode (k rows/key) + one ≤ n_bits/64-row
    bit_or aggregation; the collect here materializes the bitset,
    not data. False positives only reduce pruning efficiency — the
    caller re-joins exactly, so results stay exact.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    pos = F.explode(
        F.array(*_bloom_positions(key_col, n_bits, k))
    ).alias("pos")
    rows = (
        build.select(pos)
        .select(
            F.expr("CAST(pos DIV 64 AS INT)").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    words = [0] * (n_bits // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def bloom_prune(probe: DataFrame, key: str | Column, words: list[int],
                n_bits: int = 1 << 17, k: int = 3) -> DataFrame:
    """Keep only probe rows whose key might be in the bloom bitset
    (all k probed bits set). The bitset rides in a broadcast 1-row
    frame — not a plan literal, so explain() output stays readable —
    and the membership test is pure Catalyst (element_at + getbit),
    map-side, before any shuffle the caller adds."""
    key_col = F.col(key) if isinstance(key, str) else key
    spark = probe.sparkSession
    # Arrow-backed pandas local relation: the python-list relation
    # paid a multi-second RDD round-trip for the 2^11-word bitset
    # (measured r12; same values either way)
    import pandas as pd

    wdf = spark.createDataFrame(
        pd.DataFrame({_BLOOM_WORDS: [words]}),
        f"{_BLOOM_WORDS}: array<bigint>",
    )
    word_of = F.col(_BLOOM_WORDS)
    cond = None
    for p in _bloom_positions(key_col, n_bits, k):
        word = F.element_at(word_of, (F.shiftright(p, 6) + 1).cast("int"))
        bit = F.getbit(word, p.bitwiseAND(F.lit(63))) == 1
        cond = bit if cond is None else (cond & bit)
    return (
        probe.crossJoin(F.broadcast(wdf))
        .filter(cond)
        .drop(_BLOOM_WORDS)
    )


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


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_ts: Column,
    start_ts: Column,
    end_ts: Column,
    band: Column,
) -> DataFrame:
    """Point-in-interval equi-ish join that stays linear at scale:
    match every point row to every interval row (same `on` key) with
    start_ts <= point_ts < end_ts (half-open; a point inside k
    overlapping intervals emits k rows).

    A naive range-condition join degenerates to per-key quadratic
    scans (and can never shuffle-partition on the range). Instead
    both sides are bucketed onto a time grid of `band` (epoch-unit
    width): points land in ONE bucket, intervals replicate into the
    ceil(len/band)+1 buckets they overlap, and the join becomes a
    plain equi-join on (key, bucket) + an exact residual filter.
    Replication is bounded by interval_length/band + 1 — pick `band`
    near the TYPICAL interval length so most intervals copy ~2×.
    All three *_ts args must be in the same epoch unit as `band`
    (pass integer columns, e.g. unix_micros casts).
    """
    keys = [on] if isinstance(on, str) else list(on)
    pts = points.withColumn("__band", F.floor(point_ts / band))
    ivs = intervals.withColumn(
        "__band",
        F.explode(
            F.sequence(F.floor(start_ts / band), F.floor(end_ts / band))
        ),
    )
    return (
        pts.join(ivs, keys + ["__band"])
        .filter((point_ts >= start_ts) & (point_ts < end_ts))
        .drop("__band")
    )
