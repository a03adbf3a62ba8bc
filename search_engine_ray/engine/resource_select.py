"""CORI resource selection — rank shards for a query WITHOUT touching
postings.

Callan, Lu & Croft, "Searching Distributed Collections with Inference
Networks" (SIGIR 1995): in a federated deployment the broker first ranks
the shards (collections) from per-shard summary statistics only, then
forwards the query to the top shards.  The belief a shard ``i`` grants a
query term ``t`` is

    T = df_i(t) / (df_i(t) + K_DF + K_CW * cw_i / avg_cw)
    I = ln((C + 0.5) / cf(t)) / ln(C + 1.0)
    p(t | C_i) = B + (1 - B) * T * I

with ``df_i(t)`` the term's document frequency inside shard ``i``,
``cw_i`` the shard's token count, ``avg_cw`` the mean token count over
the ``C`` shards, and ``cf(t)`` the number of shards containing ``t``.
The shard score is the mean belief over the query terms.  A term absent
from every shard has ``T = 0`` everywhere, so it contributes the default
belief ``B`` to every shard (rank-neutral but kept so the score scale
matches the published formula).

Scale shape: everything reads the shard's terms manifest
(``IndexReader.df`` — the preloaded df dict, no postings decode) and the
stats manifest (``sum_dl``), so selection costs O(|query| x n_shards)
bytes regardless of corpus size — exactly the property that makes CORI
the standard broker step in front of ``pipelines.federated_bm25_f64``.
The reference engine (single index, ``Program.cs``) has no federation
layer; this module extends the repo's federated wing (query-time
federation, segment Blooms, term-sharded readers) with the missing
selection stage.
"""

from __future__ import annotations

import numpy as np

__all__ = ["cori_shard_scores", "select_shards"]

#: CORI defaults from the paper (and every INQUERY deployment since).
DEFAULT_B = 0.4
K_DF = 50.0
K_CW = 150.0


def cori_shard_scores(
    readers,
    terms: list[str],
    b: float = DEFAULT_B,
) -> np.ndarray:
    """Per-shard CORI score (mean belief over ``terms``), float64.

    ``readers``: one ``IndexReader``-compatible object per shard — only
    ``.df(term)`` and ``.stats["sum_dl"]`` are touched.  Expression
    order mirrors the DuckDB oracle term-for-term so micros agree.
    """
    if not readers:
        raise ValueError("cori_shard_scores needs at least one shard reader")
    if not terms:
        raise ValueError("cori_shard_scores needs at least one query term")
    c = len(readers)
    cw = np.asarray([float(r.stats["sum_dl"]) for r in readers], dtype=np.float64)
    avg_cw = float(cw.sum() / c)
    if avg_cw <= 0.0:
        # every shard empty: all beliefs collapse to the default
        return np.full(c, b, dtype=np.float64)
    # df matrix: terms x shards, from the preloaded df dicts (no postings)
    df = np.zeros((len(terms), c), dtype=np.float64)
    for j, r in enumerate(readers):
        for i, t in enumerate(terms):
            df[i, j] = float(r.df(t) or 0)
    cf = (df > 0.0).sum(axis=1).astype(np.float64)  # shards containing t
    scores = np.zeros(c, dtype=np.float64)
    log_norm = np.log(c + 1.0)
    for i in range(len(terms)):
        if cf[i] == 0.0:
            scores += b  # absent everywhere: default belief, rank-neutral
            continue
        t_part = df[i] / (df[i] + K_DF + K_CW * (cw / avg_cw))
        i_part = np.log((c + 0.5) / cf[i]) / log_norm
        scores += b + (1.0 - b) * (t_part * i_part)
    return scores / float(len(terms))


def select_shards(
    readers,
    terms: list[str],
    top: int,
    b: float = DEFAULT_B,
) -> tuple[np.ndarray, np.ndarray]:
    """(shard_ids ranked desc-score asc-id, scores in that order) for the
    ``top`` best shards — the broker step: run the query only on these
    (e.g. via ``pipelines.federated_bm25_f64`` over the selected
    readers).  Ties break toward the lower shard id, matching the
    engine-wide deterministic tie rule (K1)."""
    scores = cori_shard_scores(readers, terms, b=b)
    ids = np.arange(len(scores), dtype=np.int64)
    order = np.lexsort((ids, -scores))[: max(0, int(top))]
    return ids[order], scores[order]
