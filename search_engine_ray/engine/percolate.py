"""Standing-query percolation — the reverse of search: a fixed set of
stored queries, a stream of documents, and the question "which stored
queries match THIS doc" (Elasticsearch's percolate, the alerting /
routing primitive of a crawl pipeline).

Shape: the stored-query set is by definition the broadcast-small side
(alert rules, saved searches), so it ships once via ``ray.put`` as a
term->queries inverted map, and every batch resolves matches with pure
vectorized work — tokenize with the ENGINE tokenizer (same delimiter /
tag / stopword / casefold rules as indexing, so percolation agrees with
what search would return), distinct (doc, term) pairs, ragged expansion
through the inverted map, and one per-batch count fold.  NO shuffle of
any kind: the output streams out of the same map_batches.

Queries are conjunctive (AND of terms) — the reference engine's
query-side semantics for boolean AND; a doc matches when its distinct
matched-term count equals the query's term count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import IndexOptions
from ..text.vectorized import tokenize_batch


def percolate(
    ds: ray.data.Dataset,
    queries: list[tuple[int, list[str]]],
    options: IndexOptions,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """(doc_id, query_id) for every stored conjunctive query matching each
    doc.  ``queries``: (query_id, [terms...]) — terms are matched against
    the ENGINE-normalized token stream, so pass them already normalized
    (lowercase, unstemmed unless ``options.stemming``)."""
    if not queries:
        raise ValueError("queries must be non-empty")
    qids: list[int] = []
    qterms: list[str] = []
    for qid, terms in queries:
        if not terms:
            raise ValueError(f"query {qid} has no terms")
        for t in dict.fromkeys(terms):  # distinct, order kept
            qids.append(int(qid))
            qterms.append(t)
    # inverted map: sorted distinct terms; per term, the queries holding it
    term_arr = np.asarray(qterms, dtype=object)
    qid_arr = np.asarray(qids, dtype=np.int64)
    uniq_terms, inv = np.unique(term_arr, return_inverse=True)
    order = np.argsort(inv, kind="stable")
    counts = np.bincount(inv, minlength=len(uniq_terms))
    offsets = np.concatenate(([0], np.cumsum(counts)))
    # per-query distinct term counts (the AND arity), with query ids
    # remapped to DENSE ordinals — a sparse or negative user id must not
    # size the dense array (qid 10^9 would allocate 8 GB) or wrap through
    # numpy indexing; the output maps ordinals back to the user's ids
    uq, qid_ord = np.unique(qid_arr, return_inverse=True)
    qlen_dense = np.bincount(qid_ord, minlength=len(uq)).astype(np.int64)
    post_qids = qid_ord[order]  # ordinals grouped by term (replaces raw ids)
    ref = ray.put(
        (
            pa.array(uniq_terms.tolist(), pa.string()),
            post_qids,
            offsets,
            qlen_dense,
            uq,
        )
    )

    def match(batch: pa.Table) -> pa.Table:
        terms_pa, postings, offs, qlens, qid_map = ray.get(ref)
        tb = tokenize_batch(batch[text_column], options)
        ids = np.asarray(batch[id_column], dtype=np.int64)
        empty = pa.table(
            {
                id_column: pa.array([], pa.int64()),
                "query_id": pa.array([], pa.int64()),
            }
        )
        if len(tb.term_codes) == 0:
            return empty
        # distinct (doc, term_code) pairs
        pair = np.unique(
            tb.doc_idx.astype(np.int64) * np.int64(len(tb.terms)) + tb.term_codes
        )
        d = (pair // len(tb.terms)).astype(np.int64)
        code = (pair % len(tb.terms)).astype(np.int64)
        # map batch terms -> stored-query term ordinals (null = not stored)
        hit_ord = pc.index_in(pa.array(tb.terms.tolist(), pa.string()), value_set=terms_pa)
        hit_ord = np.asarray(pc.fill_null(hit_ord, -1), dtype=np.int64)
        tq = hit_ord[code]
        keep = tq >= 0
        if not keep.any():
            return empty
        d, tq = d[keep], tq[keep]
        # ragged expansion through the inverted map: each (doc, term) fans
        # out to that term's queries
        fan = (offs[tq + 1] - offs[tq]).astype(np.int64)
        doc_rep = np.repeat(d, fan)
        total = int(fan.sum())
        cum = np.cumsum(fan) - fan
        pos = np.arange(total) - np.repeat(cum, fan) + np.repeat(offs[tq], fan)
        q_rep = postings[pos]
        # count distinct matched terms per (doc, query): pairs are distinct
        # by construction, so a plain unique-count suffices
        key = doc_rep * np.int64(len(qlens)) + q_rep
        ukey, ucount = np.unique(key, return_counts=True)
        kd = (ukey // len(qlens)).astype(np.int64)
        kq = (ukey % len(qlens)).astype(np.int64)
        full = ucount == qlens[kq]
        return pa.table(
            {
                id_column: pa.array(ids[kd[full]]),
                "query_id": pa.array(qid_map[kq[full]]),
            }
        )

    return ds.map_batches(match, batch_format="pyarrow")
