"""Learning-to-rank feature extraction — per-(query, document) feature
vectors for ranker training.

The classic LTR training-data job (LETOR / MSLR datasets; Liu, "Learning
to Rank for Information Retrieval", 2009): for each query, every
candidate document (a document matching at least one query term) is
emitted with a feature vector — lexical match counts, document length,
and the scores of the hand-tuned rankers (BM25, TF-IDF) that the learned
model is meant to improve on.  This module produces exactly that table
from an index, reusing the engine's float64 scorer twins
(``pipelines.bm25_scores_f64`` / ``tfidf_scores_f64`` — the same
functions the driver-green ``bm25_top10`` / ``tfidf_top10`` gates
verify) so every score column is bit-identical to the verified rankers,
including the reference's integer-division idf quirk in TF-IDF.

Scale shape: feature extraction is per-term posting traversal plus a
vectorized gather — the identical access pattern as scoring, so the
corpus-scale path is the one scoring already has: doc-range shards
(``engine/sharded_search.py``) each emit their candidates' features
independently and the results concatenate without a shuffle (features
are per-document; no cross-shard state beyond the global n/avgdl/df
the federation layer already recomputes).  The ``top`` cap bounds the
per-query output the way production LTR pipelines do (features for the
top-k of a base ranker, not the full candidate set).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["ltr_feature_table"]


def ltr_feature_table(
    reader,
    keywords: list[tuple[str, int]],
    top: int = 100,
    k1: float = 1.2,
    b: float = 0.75,
    k3: float = 100.0,
) -> pa.Table:
    """Feature table for the query's candidates, ranked by BM25.

    Columns (ints except the ordinal): ``doc`` (docID ordinal),
    ``n_matched`` (query terms present), ``sum_tf`` (total matched-term
    occurrences), ``dl`` (document length), ``bm25_micros`` /
    ``tfidf_micros`` (floor-rounded micros of the f64 twin scores).
    Rows are the top ``top`` candidates by (bm25 desc, doc asc) — the
    engine-wide K1 tie rule."""
    from ..pipelines import bm25_scores_f64, tfidf_scores_f64

    n = reader.n_docs
    bm_ids, bm_scores = bm25_scores_f64(reader, keywords, k1=k1, b=b, k3=k3)
    bm = np.zeros(n, dtype=np.float64)
    bm[bm_ids] = bm_scores
    ti_ids, ti_scores = tfidf_scores_f64(reader, keywords)
    ti = np.zeros(n, dtype=np.float64)
    ti[ti_ids] = ti_scores

    n_matched = np.zeros(n, dtype=np.int64)
    sum_tf = np.zeros(n, dtype=np.int64)
    dl = np.zeros(n, dtype=np.int64)
    for term, _qtf in keywords:
        tp = reader.postings(term)
        if tp is None:
            continue
        ids, tfs, dls = tp.arrays()
        n_matched[ids] += 1
        sum_tf[ids] += tfs.astype(np.int64)
        dl[ids] = dls.astype(np.int64)

    cand = bm_ids  # already (score desc, doc asc) from the twin
    sel = cand[: max(0, int(top))]
    micros = lambda x: np.floor(x * 1_000_000 + 0.5).astype(np.int64)  # noqa: E731
    return pa.table(
        {
            "doc": pa.array(sel.astype(np.int64)),
            "n_matched": pa.array(n_matched[sel]),
            "sum_tf": pa.array(sum_tf[sel]),
            "dl": pa.array(dl[sel]),
            "bm25_micros": pa.array(micros(bm[sel])),
            "tfidf_micros": pa.array(micros(ti[sel])),
        }
    )
