"""Index diagnostics — the engine's PrintStats
(/root/reference/src/Indexing/WriteableIndex.cs:102-152): term-length and
posting-length histograms plus the candidate-stopword report
(df > threshold and len(term) <= 4).  Computed from the terms table /
posting metadata only — no posting payload is decoded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import os


def index_stats(index_dir: str, stopword_df_threshold: int = 100_000) -> dict:
    from .terms_io import read_terms_table

    terms = read_terms_table(index_dir)
    term_strs = terms["term"].to_pylist()
    dfs = np.asarray(terms["df"], dtype=np.int64)
    term_lens = np.asarray([len(t) for t in term_strs], dtype=np.int64)

    tl_vals, tl_counts = np.unique(term_lens, return_counts=True)
    pl_vals, pl_counts = np.unique(dfs, return_counts=True)

    cand_mask = (dfs > stopword_df_threshold) & (term_lens <= 4)
    cand_idx = np.flatnonzero(cand_mask)
    cand = sorted(
        ((int(dfs[i]), term_strs[i]) for i in cand_idx), key=lambda p: -p[0]
    )

    return {
        "n_terms": len(term_strs),
        "term_length_hist": {int(v): int(c) for v, c in zip(tl_vals, tl_counts)},
        "posting_length_hist": {int(v): int(c) for v, c in zip(pl_vals, pl_counts)},
        "candidate_stopwords": cand,
    }


def term_length_hist_table(index_dir: str) -> pa.Table:
    stats = index_stats(index_dir)
    hist = sorted(stats["term_length_hist"].items())
    return pa.table(
        {
            "term_len": pa.array([k for k, _ in hist], pa.int64()),
            "n_terms": pa.array([v for _, v in hist], pa.int64()),
        }
    )
