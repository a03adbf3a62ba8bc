"""Pseudo-relevance-feedback query expansion (RM3-lite).

Beyond-reference surface: the reference engine scores exactly the typed
query (/root/reference/src/Query/..Scorer.cs); web search quality needs
feedback expansion — run the query, mine the top-k docs for their most
informative terms, re-run with the expanded term set.

Scale shape
-----------
The feedback set is k docs (k ~ 5-20), so the doc-major pass an inverted
index cannot serve is a FILTERED read of the corpus table: per batch a
vectorized isin against the broadcast feedback-id set (tiny), tokenize
only matching rows, emit (term, tf) partials — one map_batches, no
shuffle, and only feedback-vocabulary-sized rows (bounded by the k docs'
total length) leave the tasks.  Term selection weights are
``tf_sum * ln(N / df)`` with corpus-wide df from the dictionary — the
same exact-float formulation the DuckDB oracle reproduces.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..config import IndexOptions


def feedback_terms(
    docs_ds,
    feedback_ids,
    options: IndexOptions,
    df_of,
    n_docs: int,
    exclude: set[str],
    fb_terms: int = 10,
    id_column: str = "doc_id",
    text_column: str = "text",
) -> list[tuple[str, float]]:
    """Top ``fb_terms`` feedback terms from the docs whose ``id_column``
    is in ``feedback_ids`` — ranked by tf_sum * ln(N/df) (desc, ties ->
    term asc), excluding ``exclude`` (the original query) and terms
    absent from the dictionary.

    ``df_of``: mapping term -> corpus df (the index dictionary).
    ``feedback_ids`` are compared as strings (doc names ARE strings in
    this engine; integer id columns cast losslessly).
    Returns [(term, weight)] in rank order."""
    import pyarrow.compute as pc

    from ..text.vectorized import tokenize_batch

    fb = pa.array(sorted({str(i) for i in feedback_ids}), pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch[id_column], pa.string())
        hit = np.asarray(pc.is_in(ids, value_set=fb))
        if not hit.any():
            return pa.table(
                {"term": pa.array([], pa.string()), "tf": pa.array([], pa.int64())}
            )
        tb = tokenize_batch(batch[text_column].combine_chunks().filter(pa.array(hit)), options)
        counts = np.bincount(tb.term_codes, minlength=len(tb.terms)).astype(np.int64)
        return pa.table(
            {
                "term": pa.array(tb.terms.tolist(), pa.string()),
                "tf": pa.array(counts),
            }
        )

    agg = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .sum("tf")
        .to_pandas()  # feedback-vocabulary-sized: bounded by the k docs' length
    )
    tf_col = "sum(tf)" if "sum(tf)" in agg.columns else "tf"
    cands = []
    for term, tf_sum in zip(agg["term"], agg[tf_col]):
        if term in exclude:
            continue
        df = df_of.get(term) if hasattr(df_of, "get") else df_of(term)
        if not df:
            continue
        w = float(tf_sum) * math.log(n_docs / df)
        cands.append((term, w))
    cands.sort(key=lambda x: (-x[1], x[0]))
    return cands[:fb_terms]
