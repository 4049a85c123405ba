"""Text-analysis kernels for training-data curation: tokenization,
quality scoring, language-ID heuristic, fingerprinting, shingling.

All pure Catalyst expressions (split / transform / filter / aggregate
/ md5) — no Python in the hot path, so the operators run inside
whole-stage codegen and scale linearly with input bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic whitespace tokenizer. The corpus is single-space
# separated; for messier corpora swap the delimiter for a regex —
# split() takes one.
TOKEN_SEP = " "


def tokens(text: Column) -> Column:
    return F.split(text, TOKEN_SEP)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_ratio(text: Column) -> Column:
    """Lexical diversity: |distinct tokens| / |tokens| — low values
    flag boilerplate/spam in web-scale corpora."""
    t = tokens(text)
    return F.size(F.array_distinct(t)) / F.size(t)


def mean_token_length(text: Column) -> Column:
    t = tokens(text)
    total = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return total / F.size(t)


def stopword_ratio(text: Column, stopwords: list[str]) -> Column:
    t = tokens(text)
    n_stop = F.size(F.filter(t, lambda x: x.isin(*stopwords)))
    return n_stop / F.size(t)


# Marker-token language tables for the n-gram/stopword language-ID
# heuristic. Real corpora would carry per-language character n-gram
# profiles; the mechanism (score per language = marker hit-rate,
# argmax wins) is identical.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "y", "que"],
}


def lang_marker_score(text: Column, markers: list[str]) -> Column:
    """Fraction of tokens that are markers of a given language."""
    t = tokens(text)
    return F.size(F.filter(t, lambda x: x.isin(*markers))) / F.size(t)


ROLLING_HASH_MOD = 1_000_003
ROLLING_HASH_BASE = 31


def rolling_hash(text: Column) -> Column:
    """Polynomial rolling hash over characters:
    h = fold(chars, 0, (acc, c) -> (acc*31 + ascii(c)) mod 1000003).

    Kept modular at every step so it is ANSI-overflow-safe and
    reproducible in any engine (the DuckDB oracle computes the same
    fold with list_reduce). Used for cheap document fingerprinting;
    md5 is the collision-resistant alternative."""
    return F.aggregate(
        F.split(text, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLLING_HASH_BASE + F.ascii(c)) % ROLLING_HASH_MOD,
    )


def token_hashes(text: Column) -> Column:
    """Rolling hash of each token: transform(tokens, t -> char-fold).
    Nested HOF — runs entirely JVM-side, one pass over the text."""
    return F.transform(
        tokens(text),
        lambda t: F.aggregate(
            F.split(t, ""),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * ROLLING_HASH_BASE + F.ascii(c)) % ROLLING_HASH_MOD,
        ),
    )


# ---------------------------------------------------------------- numpy
# Vectorized rolling-hash kernels. The per-character fold
# h = (h*31 + ord(c)) % p is a linear recurrence, so a whole document
# folds in O(L) numpy ops via prefix sums: with Q[j] = Σ_{i<j} b[i]·
# 31^{-i} (mod p), the hash of chars [s, e) is 31^{e-1}·(Q[e]-Q[s])
# (mod p). Token/shingle hashes then become two gathers — no Python
# per-char loop. Bit-identical to `rolling_hash` (pinned by tests);
# ASCII-only fast path (byte positions == char positions), callers
# fall back to the scalar fold for non-ASCII rows.

_B_INV = pow(ROLLING_HASH_BASE, ROLLING_HASH_MOD - 2, ROLLING_HASH_MOD)
_POW_CACHE: dict[str, np.ndarray] = {}


def _pows(upto: int) -> tuple[np.ndarray, np.ndarray]:
    """(31^j mod p, 31^-j mod p) for j in [0, upto]; cached, grown
    geometrically so repeated batches don't re-exponentiate."""
    cur = _POW_CACHE.get("w")
    if cur is None or len(cur) <= upto:
        n = max(upto + 1, 2 * len(cur) if cur is not None else 4096)
        w = np.empty(n, dtype=np.int64)
        wi = np.empty(n, dtype=np.int64)
        w[0] = wi[0] = 1
        for j in range(1, n):
            w[j] = (w[j - 1] * ROLLING_HASH_BASE) % ROLLING_HASH_MOD
            wi[j] = (wi[j - 1] * _B_INV) % ROLLING_HASH_MOD
        _POW_CACHE["w"], _POW_CACHE["wi"] = w, wi
    return _POW_CACHE["w"], _POW_CACHE["wi"]


def _span_hashes(b: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Rolling hashes of char spans [starts[i], ends[i]) of ASCII
    byte-array b — vectorized equivalent of the per-char fold."""
    w, wi = _pows(len(b))
    # Q[j] = Σ_{i<j} b[i]·31^-i mod p; terms < 2^27, cumsum of 10k
    # terms < 2^41 fits int64, then reduce mod p once.
    q = np.zeros(len(b) + 1, dtype=np.int64)
    np.cumsum(b.astype(np.int64) * wi[: len(b)] % ROLLING_HASH_MOD, out=q[1:])
    q %= ROLLING_HASH_MOD
    diff = (q[ends] - q[starts]) % ROLLING_HASH_MOD
    out = (w[np.maximum(ends, 1) - 1] * diff) % ROLLING_HASH_MOD
    return np.where(ends > starts, out, 0)


def _token_bounds(b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start/end char offsets of single-space-separated tokens."""
    sp = np.flatnonzero(b == ord(" "))
    starts = np.concatenate(([0], sp + 1))
    ends = np.concatenate((sp, [len(b)]))
    return starts, ends


def token_hashes_np(text: str) -> np.ndarray | None:
    """Vectorized `token_hashes` for one document; None if the text
    needs the scalar non-ASCII fallback."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) and b.max() >= 128:
        return None
    starts, ends = _token_bounds(b)
    return _span_hashes(b, starts, ends)


def shingle_hashes_np(text: str, k: int = 5) -> np.ndarray | None:
    """Rolling hashes of all k-token shingles (NOT string-distinct —
    duplicate shingles yield duplicate hashes, which is harmless for
    MinHash since min over a multiset equals min over its set). With
    single-space separation a k-token shingle is exactly the char
    span [token_start[i], token_end[i+k-1]), so every shingle hash is
    one span-hash gather. None → scalar fallback (non-ASCII)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) and b.max() >= 128:
        return None
    starts, ends = _token_bounds(b)
    if len(starts) < k:
        return np.empty(0, dtype=np.int64)
    return _span_hashes(b, starts[: len(starts) - k + 1], ends[k - 1 :])


SIMHASH_BITS = 16

# Okapi BM25 parameters + the fixture search terms — here (not in
# queries/text.py) so retrieval queries in OTHER modules (the hybrid
# fusion in queries/vectors.py) can build their oracles at import
# time without a queries.text circular import.
BM25_K1 = 1.2
BM25_B = 0.75
SEARCH_TERMS = ("the", "of", "and")


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash fingerprint: per-token rolling hashes, then for each bit
    position sum +1/-1 over tokens by whether that hash bit is set; the
    sign of each sum becomes the fingerprint bit. Near-identical
    documents land on equal (or Hamming-close) fingerprints.

    The bit loop is unrolled Python-side into `bits` array aggregates —
    still one row-local expression tree, no UDF, no shuffle. Token
    hashes stay < 2^20 (mod 1000003) so 16 fingerprint bits are all
    informative."""
    hs = token_hashes(text)

    def bit_vote(k: int):
        # separate factory so the merge lambda stays 2-ary (PySpark
        # derives the HOF arity from the lambda signature)
        return lambda acc, h: acc + F.when(
            F.shiftright(h, k).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for k in range(bits):
        bit_sum = F.aggregate(hs, F.lit(0), bit_vote(k))
        out = out + F.when(bit_sum > 0, F.lit(1 << k)).otherwise(0)
    return out


def simhash_udf(bits: int = SIMHASH_BITS):
    """Arrow-batched simhash: identical semantics to `simhash` (same
    integer rolling hash, same bit votes — pinned by unit test), but
    the per-token fold runs in Python/numpy per batch instead of 16
    interpreted Catalyst aggregate passes per row. Measured 10×+
    faster at sf0.1 (35 s → ~3 s); use the expression form when the
    query must stay UDF-free."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import LongType

    ks = np.arange(bits)

    def one(text: str) -> int | None:
        if text is None:  # NULL text -> NULL fingerprint (SQL parity)
            return None
        arr = token_hashes_np(text)
        if arr is None:  # non-ASCII: scalar fold, same math
            hs = []
            for tok in text.split(TOKEN_SEP):
                h = 0
                for ch in tok:
                    h = (h * ROLLING_HASH_BASE + ord(ch)) % ROLLING_HASH_MOD
                hs.append(h)
            arr = np.asarray(hs, dtype=np.int64)
        votes = (2 * ((arr[:, None] >> ks) & 1) - 1).sum(axis=0)
        return int(((votes > 0).astype(np.int64) << ks).sum())

    @pandas_udf(LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        return pd.Series([one(t) for t in texts], dtype="Int64")

    return _simhash


def word_shingles_udf(k: int = 5):
    """Arrow-batched distinct k-token shingling — same output set as
    `word_shingles` (pinned by unit test) but ~100× cheaper in
    practice: the Catalyst HOF form is interpreted (no codegen for
    lambda expressions) AND gets duplicated into derived null/size
    Filter conditions, so each row pays the transform several times;
    a Python UDF result is materialized once as an attribute and
    reused by every consumer."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    def one(text: str) -> list[str]:
        if text is None:  # NULL text -> no shingles
            return []
        toks = text.split(TOKEN_SEP)
        if len(toks) < k:
            return []
        return list(
            dict.fromkeys(
                TOKEN_SEP.join(toks[i : i + k]) for i in range(len(toks) - k + 1)
            )
        )

    @pandas_udf(ArrayType(StringType()))
    def _shingles(texts: pd.Series) -> pd.Series:
        return pd.Series([one(t) for t in texts])

    return _shingles


def shingle_hash_udf(k: int = 5):
    """Distinct k-token shingles → their rolling hashes, in one
    Arrow-batched pass (for MinHash, which never needs the shingle
    strings). Exact same integer math as `rolling_hash` over
    `word_shingles` output — Python ints, mod at every step."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    def hash_one(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * ROLLING_HASH_BASE + ord(ch)) % ROLLING_HASH_MOD
        return h

    def one(text: str) -> list[int]:
        if text is None:  # NULL text -> no shingles
            return []
        toks = text.split(TOKEN_SEP)
        if len(toks) < k:
            return []
        distinct = dict.fromkeys(
            TOKEN_SEP.join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        )
        return [hash_one(s) for s in distinct]

    @pandas_udf(ArrayType(LongType()))
    def _hashes(texts: pd.Series) -> pd.Series:
        return pd.Series([one(t) for t in texts])

    return _hashes


def word_shingles(text: Column, k: int = 5) -> Column:
    """Distinct k-token shingles (word n-grams) of a document —
    the unit for Jaccard/MinHash near-dup detection. Built with
    transform(sequence(...)) over the token array; returns
    array<string>, empty if the document has fewer than k tokens."""
    t = tokens(text)
    n = F.size(t)
    return F.when(n >= k, F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.array_join(F.slice(t, i + 1, k), " "),
        )
    )).otherwise(F.array().cast("array<string>"))


def positional_windows_udf(k: int = 5):
    """All k-token windows of a document in POSITIONAL order — unlike
    `word_shingles_udf` the windows are NOT deduplicated, because the
    consumer (exact-passage dedup, Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better") merges window hits
    back into maximal duplicated token spans, and that needs every
    occurrence with its offset. Arrow-batched for the same
    interpreted-HOF-cost reason documented on `word_shingles_udf`;
    the window's position is recovered downstream with `posexplode`,
    so the UDF returns a plain array<string>."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    def one(text: str) -> list[str]:
        if text is None:  # NULL text -> no windows
            return []
        toks = text.split(TOKEN_SEP)
        if len(toks) < k:
            return []
        return [TOKEN_SEP.join(toks[i : i + k]) for i in range(len(toks) - k + 1)]

    @pandas_udf(ArrayType(StringType()))
    def _windows(texts: pd.Series) -> pd.Series:
        return pd.Series([one(t) for t in texts])

    return _windows


def token_hash_dims_udf(n_dims: int):
    """Arrow-batched per-token feature-hash dims: the rolling hash of
    each NON-EMPTY token mod n_dims, in order — vectorized via the
    prefix-sum span-hash kernel (same integer math as the Catalyst
    HOF form, pinned by the doc_hashed_embeddings oracle), with the
    scalar fold as the non-ASCII fallback. Same motivation as
    `simhash_udf`: the nested per-char aggregate is interpreted
    per row per token in Catalyst; one numpy pass per Arrow batch is
    ~3-10× cheaper on real corpora."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    def one(text: str) -> list[int]:
        if text is None:
            return []
        toks = [t for t in text.split(TOKEN_SEP) if t]
        if not toks:
            return []
        arr = token_hashes_np(TOKEN_SEP.join(toks))
        if arr is None:  # non-ASCII: scalar fold, same math
            hs = []
            for tok in toks:
                h = 0
                for ch in tok:
                    h = (h * ROLLING_HASH_BASE + ord(ch)) % ROLLING_HASH_MOD
                hs.append(h)
            arr = np.asarray(hs, dtype=np.int64)
        return (arr % n_dims).astype("int32").tolist()

    @pandas_udf(ArrayType(IntegerType()))
    def _dims(texts: pd.Series) -> pd.Series:
        return pd.Series([one(t) for t in texts])

    return _dims


def winnow_fingerprints_py(text, k: int = 4, w: int = 5) -> list[int]:
    """Pure scalar winnowing kernel (module-level so tests can check
    the winnowing guarantee directly): SEQUENTIAL k-token k-grams
    hashed to the first 48 bits of md5, minimum per sliding w-window,
    deduplicated in first-occurrence order. Guarantee: every w-window
    of the k-gram hash sequence contributes its minimum, so any
    shared substring of >= w + k - 1 tokens yields a shared
    fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD 2003)."""
    import hashlib

    if not text:
        return []
    toks = [t for t in text.split(" ") if t != ""]
    if len(toks) < k:
        return []
    hs = [
        int(
            hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[
                :12
            ],
            16,
        )
        for i in range(len(toks) - k + 1)
    ]
    if len(hs) < w:
        return [min(hs)]
    seen: dict[int, None] = {}
    for j in range(len(hs) - w + 1):
        seen.setdefault(min(hs[j : j + w]), None)
    return list(seen)


def winnow_fingerprints_udf(k: int = 4, w: int = 5):
    """Winnowing fingerprints in one Arrow pass: SEQUENTIAL k-token
    k-grams (order and duplicates preserved — word_shingles_udf's
    distinct-set output would change which hash each window minimizes
    over), each hashed to the first 48 bits of md5 (portable: any
    engine hashing the same string gets the same integer), then the
    minimum per sliding w-window, deduplicated. Doing hash+windows in
    the same kernel also keeps Catalyst from inlining the hash
    transform into every window slice (no CSE inside HOF lambdas).
    Scalar kernel: winnow_fingerprints_py (property-tested)."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    @pandas_udf(ArrayType(LongType()))
    def _fp(texts: pd.Series) -> pd.Series:
        return pd.Series([winnow_fingerprints_py(t, k, w) for t in texts])

    return _fp
