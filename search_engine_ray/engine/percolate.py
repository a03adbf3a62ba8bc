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


def percolate_phrases(
    ds: ray.data.Dataset,
    phrases: list[tuple[int, list[str]]],
    options: IndexOptions,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """Phrase percolation: which stored EXACT PHRASES occur in each doc —
    the alerting rule class conjunctive percolation can't express ("data
    breach" must not fire on "breach of data").  A phrase matches when
    its terms occur CONSECUTIVELY in the doc's kept-token stream (the
    phrase_search semantics: same tokenizer, same stopword drops).

    Shape: the phrase set is broadcast-small (alert rules) and ships once
    via ``ray.put`` as (term vocabulary, per-phrase ordinal sequences);
    each batch tokenizes once, maps tokens to stored-term ordinals (one
    ``index_in``), and tests every phrase with a chain of shifted
    vectorized equality ANDs — O(tokens x total phrase terms), NO
    shuffle, results stream out of the map_batches.

    Returns (doc_id, query_id) rows, one per (doc, matching phrase)."""
    if not phrases:
        raise ValueError("phrases must be non-empty")
    vocab: dict[str, int] = {}
    seqs: list[tuple[int, np.ndarray]] = []
    for qid, terms in phrases:
        if not terms:
            raise ValueError(f"phrase {qid} has no terms")
        seq = np.asarray([vocab.setdefault(t, len(vocab)) for t in terms], dtype=np.int64)
        seqs.append((int(qid), seq))
    vocab_pa = pa.array(list(vocab), pa.string())
    ref = ray.put((vocab_pa, seqs))

    def match(batch: pa.Table) -> pa.Table:
        vocab_terms, phrase_seqs = ray.get(ref)
        tb = tokenize_batch(batch[text_column], options)
        ids = np.asarray(batch[id_column], dtype=np.int64)
        empty = pa.table(
            {
                id_column: pa.array([], pa.int64()),
                "query_id": pa.array([], pa.int64()),
            }
        )
        n = len(tb.term_codes)
        if n == 0:
            return empty
        # batch term code -> stored-vocab ordinal (-1 = not in any phrase)
        ord_of_code = np.asarray(
            pc.fill_null(
                pc.index_in(pa.array(tb.terms.tolist(), pa.string()), value_set=vocab_terms),
                -1,
            ),
            dtype=np.int64,
        )
        tok = ord_of_code[tb.term_codes]
        doc = tb.doc_idx.astype(np.int64)
        out_d, out_q = [], []
        for qid, seq in phrase_seqs:
            L = len(seq)
            if L > n:
                continue
            m = n - L + 1
            hit = tok[:m] == seq[0]
            for j in range(1, L):
                hit &= tok[j : m + j] == seq[j]
            if L > 1:
                hit &= doc[:m] == doc[L - 1 :]  # window inside one doc
            if hit.any():
                docs = np.unique(doc[:m][hit])
                out_d.append(docs)
                out_q.append(np.full(len(docs), qid, dtype=np.int64))
        if not out_d:
            return empty
        d = np.concatenate(out_d)
        q = np.concatenate(out_q)
        order = np.lexsort((q, d))
        return pa.table(
            {
                id_column: pa.array(ids[d[order]]),
                "query_id": pa.array(q[order]),
            }
        )

    return ds.map_batches(match, batch_format="pyarrow")
