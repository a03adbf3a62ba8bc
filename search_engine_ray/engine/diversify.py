"""MMR result diversification (Carbonell & Goldstein, SIGIR 1998 —
public): greedy re-ranking of a bounded candidate pool balancing
relevance against redundancy,

    MMR(c) = lam * rel(c) - (1 - lam) * max_{s in S} sim(c, s),

computed ENTIRELY in integers so the selection is hash-exact against a
SQL oracle: relevance is min-max-normalized to integer micros (floor
division), pairwise cosine similarity enters as integer micros (the
same FLOOR(x*1e6 + 0.5) convention the emb_near_dup gate pins against
DuckDB's list_cosine_similarity), lam is per-mille, and every argmax
breaks ties by ascending doc id.

Scale shape: diversification is a POST-RETRIEVAL step over a
candidate-sized pool (tens of rows) — retrieval and the embedding fetch
are distributed (BM25 pipeline + a vec_id-pruned parquet read); the
greedy loop itself is O(k * pool) driver work on an already-bounded
result, the standard reranker seam."""

from __future__ import annotations

import numpy as np


def _micros(x: np.ndarray) -> np.ndarray:
    return np.floor(np.asarray(x, dtype=np.float64) * 1_000_000 + 0.5).astype(
        np.int64
    )


def minmax_norm_micros(rel_micros: np.ndarray) -> np.ndarray:
    """(rel - min) * 1e6 // (max - min) — integer micros in [0, 1e6];
    a constant pool maps to all-1e6 (every candidate maximally relevant)."""
    rel = np.asarray(rel_micros, dtype=np.int64)
    lo, hi = int(rel.min()), int(rel.max())
    if hi == lo:
        return np.full(len(rel), 1_000_000, dtype=np.int64)
    return (rel - lo) * 1_000_000 // (hi - lo)


def cosine_sim_micros(emb: np.ndarray) -> np.ndarray:
    """Pairwise cosine as integer micros (the exact dataops.similarity
    normalize+matmul kernel the emb_near_dup gate pins vs DuckDB)."""
    from ..dataops.similarity import _normalize

    m = _normalize(np.asarray(emb, dtype=np.float64))
    return _micros(m @ m.T)


def mmr_rerank(
    doc_ids: np.ndarray,
    rel_micros: np.ndarray,
    emb: np.ndarray,
    k: int = 10,
    lam_milli: int = 700,
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy MMR over the pool: returns (selected doc_ids, integer MMR
    objective per pick), both length min(k, pool).  Step 1 maximizes
    lam * rel_norm alone (no diversity term yet); step i>1 subtracts
    (1000 - lam) * max-similarity-to-selected.  Ties -> doc id asc."""
    docs = np.asarray(doc_ids, dtype=np.int64)
    if not 0 <= lam_milli <= 1000:
        raise ValueError("lam_milli must be in [0, 1000]")
    if len(docs) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    rel_norm = minmax_norm_micros(rel_micros)
    sim = cosine_sim_micros(emb)
    n = len(docs)
    selected: list[int] = []
    picked_docs = np.empty(min(k, n), dtype=np.int64)
    picked_obj = np.empty(min(k, n), dtype=np.int64)
    remaining = np.ones(n, dtype=bool)
    for i in range(len(picked_docs)):
        obj = lam_milli * rel_norm
        if selected:
            obj = obj - (1000 - lam_milli) * sim[:, selected].max(axis=1)
        # argmax among remaining, ties by ascending doc id
        cand = np.flatnonzero(remaining)
        order = np.lexsort((docs[cand], -obj[cand]))
        pick = int(cand[order[0]])
        selected.append(pick)
        remaining[pick] = False
        picked_docs[i] = docs[pick]
        picked_obj[i] = obj[pick]
    return picked_docs, picked_obj
