"""Vector kernels for embedding-similarity search.

Dot products / norms / cosine over array<float> columns as Catalyst
HOFs (zip_with + aggregate), computed in double precision so results
are engine-portable. For very high dimensions or large batch scoring
a vectorized pandas_udf (numpy matmul over Arrow batches) is the
faster path; at 64 dims the expression form stays JVM-side and avoids
the Python boundary entirely.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def array_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (double precision)."""
    return array_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def unit(a: Column) -> Column:
    """L2-normalized copy of the vector (double precision). Cosine of
    unit vectors is a plain dot product — normalize once per row
    BEFORE any pairwise join instead of recomputing norms per pair."""
    n = norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def pairwise_dot_udf():
    """Vectorized pandas_udf for pairwise dot products: stacks each
    Arrow batch into one (n, d) matrix and runs a single numpy einsum.
    For hot pairwise-scoring joins this is 50-100× the interpreted
    HOF expression (measured: embedding_near_dup_pairs at sf0.1 went
    288 s → ~4 s); keep the expression form (`dot`) for one-off
    scoring where the Python boundary isn't worth it."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _dot(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.asarray(a.tolist(), dtype=np.float64)
        mb = np.asarray(b.tolist(), dtype=np.float64)
        return pd.Series(np.einsum("ij,ij->i", ma, mb))

    return _dot


def sign_bucket(a: Column, dims: list[int]) -> Column:
    """Random-hyperplane-style LSH bucket id from the signs of fixed
    coordinates: bucket = Σ 2ᵏ·[a[dims[k]] > 0]. With axis-aligned
    planes this is deterministic and reproducible in plain SQL, while
    keeping the real LSH plumbing (bucket key → co-partitioned
    search)."""
    bucket = F.lit(0)
    for k, d in enumerate(dims):
        bucket = bucket + F.when(F.element_at(a, d + 1) > 0, F.lit(1 << k)).otherwise(
            F.lit(0)
        )
    return bucket


def pack_sign_bits(a: Column, dims: int = 64) -> Column:
    """Binary-quantization code: packs the sign bit of each of the
    first `dims` (≤ 64) coordinates into ONE BIGINT — bit k set iff
    a[k] > 0. Pure Catalyst fold (aggregate over sequence), so code
    construction stays JVM-side and whole-stage-codegen'd. At scale,
    materialize this column once next to the vectors: Hamming
    distance between two codes is then `bit_count(c1 ^ c2)` over
    8-byte values — the cheapest possible first-stage ANN filter
    (see queries/vectors.py embedding_binary_quant_rerank)."""
    if not 1 <= dims <= 64:
        raise ValueError(f"dims must be in [1, 64], got {dims}")
    # bit 63 of a signed long is the sign bit: 1<<63 doesn't fit a
    # long literal, but -(1<<63) has exactly that bit pattern.
    powers = F.array(
        *[
            F.lit((1 << k) if k < 63 else -(1 << 63)).cast("long")
            for k in range(dims)
        ]
    )
    bits = F.zip_with(
        F.slice(a, 1, dims),
        powers,
        lambda x, p: F.when(x > 0, p).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x)
    )


def hamming_codes(c1: Column, c2: Column) -> Column:
    """Hamming distance between two packed sign-bit codes:
    bit_count(xor) — one CPU instruction per 64 dims."""
    return F.bit_count(c1.bitwiseXOR(c2))
