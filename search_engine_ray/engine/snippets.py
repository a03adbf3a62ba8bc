"""Snippet (best-passage) extraction for search results.

Beyond-reference surface (the reference emits bare TREC run lines): for
each document, find the ``window``-token passage with the most query-term
hits — the highlighted preview a search UI shows.  The window semantics
are defined over KEPT-token ordinals (the same normalized stream the
positional sidecar indexes): the best window is the one with the maximum
hit count over windows starting at each hit position, ties -> earliest
start.  Starting-at-a-hit is lossless for count maximization: any
maximal window can be left-shifted to start at its first hit without
losing hits.

Scale shape: a stateless ``map_batches`` stage over (doc_id, text) rows
— query terms are a broadcast-small set; per batch, ONE vectorized
tokenize pass, hit marking by sorted-vocab searchsorted, and per-hit
window counts by two searchsorted probes over the batch-wide hit
position array.  No shuffle, no per-row Python loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..config import IndexOptions
from ..text.tokenizer import normalize_query_word
from ..text.vectorized import tokenize_batch


def snippet_batch(
    batch: pa.Table,
    query_terms: list[str],
    options: IndexOptions,
    window: int = 8,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> pa.Table:
    """-> (doc_id, best_start, n_hits, snippet) for docs with >= 1 hit.
    ``best_start`` is a 0-based kept-token ordinal; ``snippet`` joins the
    window's kept tokens with single spaces."""
    tb = tokenize_batch(batch[text_column], options)
    ids = np.asarray(batch[id_column], dtype=np.int64)
    empty = pa.table(
        {
            id_column: pa.array([], pa.int64()),
            "best_start": pa.array([], pa.int64()),
            "n_hits": pa.array([], pa.int64()),
            "snippet": pa.array([], pa.string()),
        }
    )
    if len(tb.term_codes) == 0 or not query_terms:
        return empty
    qset = np.unique(np.asarray(sorted(set(query_terms)), dtype=object))
    pos_in_q = np.searchsorted(qset, tb.terms)
    pos_c = np.minimum(pos_in_q, len(qset) - 1)
    term_is_hit = qset[pos_c] == tb.terms
    tok_is_hit = term_is_hit[tb.term_codes]
    if not tok_is_hit.any():
        return empty

    # kept-token ordinal per token within its doc
    doc_idx = tb.doc_idx.astype(np.int64)
    lens = tb.doc_lens.astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    flat = np.arange(len(doc_idx), dtype=np.int64)
    ordinal = flat - starts[doc_idx]

    # composite keys of hit positions (doc << 42 is plenty at batch scale:
    # ordinals are bounded by the longest doc in the batch)
    shift = np.int64(max(int(lens.max()), 1))
    hit_keys = doc_idx[tok_is_hit] * shift + ordinal[tok_is_hit]  # sorted
    hit_doc = doc_idx[tok_is_hit]
    # count of hits in [p, p+window) within the same doc
    doc_base = hit_doc * shift
    hi = np.minimum(hit_keys + window, doc_base + shift)
    counts = np.searchsorted(hit_keys, hi, side="left") - np.arange(len(hit_keys))

    # best per doc: max count, ties -> smallest start (hit_keys ascending,
    # so a stable argmax over reversed order picks the earliest max)
    uniq_docs, first_idx = np.unique(hit_doc, return_index=True)
    best_start = np.empty(len(uniq_docs), dtype=np.int64)
    best_n = np.empty(len(uniq_docs), dtype=np.int64)
    bounds = np.append(first_idx, len(hit_doc))
    for i in range(len(uniq_docs)):  # loop over DOCS WITH HITS in batch
        seg = counts[bounds[i] : bounds[i + 1]]
        j = int(np.argmax(seg))  # first occurrence of the max
        best_n[i] = seg[j]
        best_start[i] = hit_keys[bounds[i] + j] - uniq_docs[i] * shift

    # snippet text: kept tokens joined by spaces
    snippets = []
    for i, d in enumerate(uniq_docs):
        s = int(best_start[i])
        toks = tb.terms[tb.term_codes[starts[d] + s : starts[d] + min(s + window, lens[d])]]
        snippets.append(" ".join(toks.tolist()))

    return pa.table(
        {
            id_column: pa.array(ids[uniq_docs]),
            "best_start": pa.array(best_start),
            "n_hits": pa.array(best_n),
            "snippet": pa.array(snippets, pa.string()),
        }
    )


def snippets(
    ds: ray.data.Dataset,
    query_words: list[str],
    options: IndexOptions,
    window: int = 8,
    **kw,
) -> ray.data.Dataset:
    """Dataset-level snippet extraction; query words are normalized like
    the query path first (stopwords dropped silently, J1 semantics)."""
    terms = [
        normalize_query_word(
            w,
            case_folding=options.case_folding,
            remove_stopwords=options.remove_stopwords,
            stemming=options.stemming,
        )
        for w in query_words
    ]
    terms = [t for t in terms if t]
    return ds.map_batches(
        snippet_batch,
        fn_kwargs=dict(query_terms=terms, options=options, window=window, **kw),
        batch_format="pyarrow",
    )
