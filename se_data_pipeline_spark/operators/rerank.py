"""Pluggable model-rerank stage over ANN candidates (r8 VERDICT
optional #8, second half): the retrieval funnel's last hop —
index → candidate cut → exact rerank → MODEL rerank — with the model
behind the same executor-singleton, Arrow-batched interface as the
audio classifier (operators/classify.py, D3; the reference's
module-level model global audio_ac.py:35-40 generalized).

The fake backend is a DETERMINISTIC stand-in whose arithmetic is
reproducible in plain SQL (numpy cosine x an id-hash modulation), so
the whole four-stage pipeline stays oracle-checkable end-to-end; the
real backend (a sentence-transformers CrossEncoder) is import-guarded
exactly like the other never-executed-here adapters in the README
honesty table.
"""

from __future__ import annotations

from typing import Iterator, Protocol

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


class RerankBackend(Protocol):
    def score_batch(
        self, query: np.ndarray, vecs: np.ndarray, ids: np.ndarray
    ) -> np.ndarray:
        """Relevance score per (query, candidate) pair; higher wins."""
        ...


class FakeCrossEncoder:
    """Deterministic fake cross-encoder: cosine(query, candidate) in
    float64 modulated by an id-keyed hash factor in [0.9, 1.0) —
    score = cos * (0.9 + 0.1 * ((id * 2654435761) % 97) / 97). The
    modulation factor is exact integer/rational arithmetic; the
    cosine is accumulated with STRICTLY SEQUENTIAL left-to-right
    float64 adds (np.cumsum, never BLAS dot / np.linalg.norm, whose
    pairwise/unrolled accumulation orders differ) so it is
    bit-identical to the engine's F.aggregate fold and to a
    sequential SQL list_sum — the same summation-order discipline as
    queries/vectors._arr_cos, closing the boundary-rounding flake
    class the DSIR caveat documents. Zero-norm (unsearchable)
    vectors score 0.0 instead of dividing by zero."""

    def score_batch(
        self, query: np.ndarray, vecs: np.ndarray, ids: np.ndarray
    ) -> np.ndarray:
        q = np.asarray(query, dtype=np.float64)
        v = np.asarray(vecs, dtype=np.float64)
        dot = np.cumsum(v * q, axis=1)[:, -1]
        nv = np.sqrt(np.cumsum(v * v, axis=1)[:, -1])
        nq = float(np.sqrt(np.cumsum(q * q)[-1]))
        denom = nv * nq
        cos = np.divide(
            dot, denom, out=np.zeros(len(v)), where=denom > 0
        )
        mod = 0.9 + 0.1 * (
            (ids.astype(np.int64) * 2654435761) % 97
        ) / 97.0
        return cos * mod


class SentenceCrossEncoder:  # pragma: no cover - real backend
    """Real cross-encoder via sentence-transformers; never executed in
    this container (no torch) — import-guarded like HfAstClassifier."""

    def __init__(self, model_name: str = "cross-encoder/ms-marco-MiniLM-L-6-v2"):
        try:
            from sentence_transformers import CrossEncoder
        except ImportError as exc:
            raise NotImplementedError(
                "sentence-transformers is not installed in this "
                "environment; use FakeCrossEncoder for offline runs"
            ) from exc
        self._model = CrossEncoder(model_name)

    def score_batch(self, query, vecs, ids):
        raise NotImplementedError(
            "a CrossEncoder scores TEXT pairs; wire the candidate "
            "documents' text column through rerank_candidates' "
            "vec_col for a real deployment"
        )


# one backend instance per (executor, backend-class) — the classify.py
# singleton pattern; model load cost is paid once per executor, not
# per Arrow batch.
_RERANK_SINGLETON: dict[str, object] = {}


def rerank_candidates(
    cand: DataFrame,
    backend_factory=FakeCrossEncoder,
    vec_col: str = "v",
    query_col: str = "q",
    id_col: str = "vec_id",
) -> DataFrame:
    """Append `model_score` to a candidate frame by scoring
    (query, candidate-vector) pairs through the backend in Arrow
    batches. Input must carry the query vector as a column (the usual
    1-row broadcast crossJoin); the vector columns are consumed by
    the scorer and dropped from the output. Candidate frames are
    top-k-bounded by construction (the stage runs AFTER the index
    cut), so this never sees more than the rerank budget per query —
    at 100 TB the model cost is O(candidates), not O(corpus)."""
    passthrough = [
        c for c in cand.columns if c not in (vec_col, query_col)
    ]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in cand.schema.fields
        if f.name in passthrough
    ) + ", model_score double"
    key = f"{backend_factory.__module__}.{backend_factory.__qualname__}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = _RERANK_SINGLETON.get(key)
        if backend is None:
            backend = _RERANK_SINGLETON.setdefault(
                key, backend_factory()
            )
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.copy()
            # an Arrow batch may interleave candidates of SEVERAL
            # queries (multi-query candidate frames); group rows by
            # their own query vector so no row is ever scored against
            # another row's query
            qkey = pdf[query_col].map(
                lambda a: np.asarray(a, dtype=np.float64).tobytes()
            )
            scores = np.empty(len(pdf), dtype=np.float64)
            for idx in pdf.groupby(qkey.values, sort=False).indices.values():
                q = np.asarray(
                    pdf[query_col].iloc[idx[0]], dtype=np.float64
                )
                vecs = np.asarray(
                    pdf[vec_col].iloc[idx].tolist(), dtype=np.float64
                )
                ids = pdf[id_col].iloc[idx].to_numpy()
                scores[idx] = backend.score_batch(q, vecs, ids)
            pdf["model_score"] = scores
            yield pdf[passthrough + ["model_score"]]

    return cand.mapInPandas(run, out_schema)
