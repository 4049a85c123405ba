"""Numeric helpers for Python/numpy kernels whose outputs are
compared against SQL ROUND().

Python's round() and numpy's np.round use banker's rounding (half to
even); SQL ROUND — both Spark's F.round and DuckDB's round() — rounds
half AWAY from zero. A kernel that rounds with round() silently
diverges from its oracle the first time a value lands on an exact
half at the target precision (e.g. mean over a power-of-two count:
11893/128 = 92.9140625 → banker's 92.914062, SQL 92.914063). Every
mapInPandas kernel must round with these helpers instead.
"""

from __future__ import annotations

import numpy as np

_POW10 = {d: float(10**d) for d in range(0, 13)}


def round_half_up(x, decimals: int = 6):
    """SQL-compatible ROUND (half away from zero) for scalars or
    numpy arrays: sign(x) * floor(|x| * 10^d + 0.5) / 10^d —
    identical to the scaled std::round both engines apply for the
    value ranges our kernels produce (|x·10^d| well under 2^52, so
    the +0.5 is exact)."""
    p = _POW10[decimals]
    return np.sign(x) * np.floor(np.abs(np.multiply(x, p)) + 0.5) / p


def zorder_key_n(scaled: list, bits: int = 16):
    """Morton (Z-order) interleave of N non-negative integer Columns,
    as a pure Catalyst expression (unrolled shiftleft/bitwise-OR
    folds — no UDF): bit j of column i lands at position j * N + i.

    Sorting/range-partitioning a write by this key clusters ALL the
    dimensions at once, so later scans filtering on any subset of the
    columns skip most files via row-group min/max stats — the
    multi-dimensional layout trick behind Z-ordered table formats,
    available here with plain parquet. Total key width is
    N * bits <= 63. `sources.layout.write_zordered` wires this into
    a min-max-scaled sorted parquet write."""
    from functools import reduce

    from pyspark.sql import functions as F

    n = len(scaled)
    parts = []
    for i, c in enumerate(scaled):
        for j in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(c, j).bitwiseAND(F.lit(1)), j * n + i
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_key(a, b, bits: int = 16):
    """Two-column Morton interleave: bit i of `a` at position 2i, bit
    i of `b` at 2i+1 — the N=2 case of zorder_key_n."""
    return zorder_key_n([a, b], bits)
