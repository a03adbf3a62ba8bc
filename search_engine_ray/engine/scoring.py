"""Query-time scoring: vectorized TAAT scorers + block-max WAND DAAT.

Scorer formulas transcribe the reference exactly (see oracle/scorers.py for
the file:line map of every quirk — integer-division TF-IDF idf, negative
BM25 idf, unused ln(1+tf), float32 per-(term,doc) casts and float32
accumulation).  TAAT accumulates into a dense float32 array (docIDs are
dense by construction) with per-term contributions added in QUERY ORDER —
the same float32 operation order as the oracle's dict accumulation, so
scores are bit-identical, not just close.

WAND (A5/J4 done properly, SURVEY.md §2.5): document-at-a-time traversal
with a bounded top-k heap; per-term upper bounds come from the
idf-independent block metadata (ub_tfn/lb_tfn/ub_logtf) times the query
factor; negative-idf terms get their bound clamped to 0 (a valid, looser
bound) so pivot prefix-sums stay monotone.  Block skipping decodes a block
only when its doc range is reached AND its block-level bound survives the
threshold.  When a pivot document is evaluated, contributions are summed
in query order (bit-identical to TAAT) — WAND only prunes documents that
cannot enter the top-k, so the returned top-k set, scores, and tie-broken
ranking (ascending docID on equal scores) match exhaustive TAAT exactly
(property-tested in tests/test_query.py).
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from ..config import BM25Params
from ..oracle.scorers import _getk1
from .index_reader import IndexReader, TermPostings

F32 = np.float32
# Safety margin added to float64 upper bounds before pruning against the
# float32 threshold (loosens pruning; never affects correctness).
_EPS = 1e-3
# Max docs per vectorized WAND evaluation window (scratch stays in cache;
# large enough to amortize per-window numpy overhead across blocks).
_WINDOW_CAP = 8192


# --------------------------------------------------------------------------
# TAAT (exhaustive) — the conformance baseline and the BM25-ADPT path
# --------------------------------------------------------------------------

def _topk_from_dense(scores: np.ndarray, touched: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    cand = np.flatnonzero(touched)
    if len(cand) == 0:
        return cand, scores[cand]
    s = scores[cand]
    order = np.lexsort((cand, -s.astype(np.float64)))[:k]
    return cand[order], s[order]


def taat_bm25(
    reader: IndexReader, keywords: list[tuple[str, int]], params: BM25Params, k: int = 1000,
    exclude: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    n = reader.n_docs
    avgdl = reader.avgdl
    scores = np.zeros(n, dtype=np.float32)
    touched = np.zeros(n, dtype=bool)
    for term, qtf in keywords:
        tp = reader.postings(term)
        if tp is None:
            continue
        ids, tfs, dls = tp.arrays()
        idf = math.log((n - tp.df + 0.5) / (tp.df + 0.5))
        qterm = ((params.k3 + 1) * qtf) / (params.k3 + qtf)
        doc_term = 1 - params.b + params.b * (dls / avgdl)
        contrib = (idf * (tfs * (params.k1 + 1)) / (tfs + params.k1 * doc_term) * qterm).astype(np.float32)
        scores[ids] = scores[ids] + contrib
        touched[ids] = True
    if exclude is not None:
        touched &= ~exclude
    return _topk_from_dense(scores, touched, k)


def taat_tfidf(
    reader: IndexReader, keywords: list[tuple[str, int]], k: int = 1000,
    exclude: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    n = reader.n_docs
    scores = np.zeros(n, dtype=np.float32)
    touched = np.zeros(n, dtype=bool)
    for term, _qtf in keywords:
        tp = reader.postings(term)
        if tp is None:
            continue
        ids, tfs, _dls = tp.arrays()
        idf = math.log(n // tp.df)  # reference integer-division quirk
        contrib = (np.log1p(tfs) * idf).astype(np.float32)
        scores[ids] = scores[ids] + contrib
        touched[ids] = True
    if exclude is not None:
        touched &= ~exclude
    return _topk_from_dense(scores, touched, k)


def adpt_cd_counts(cds: np.ndarray) -> np.ndarray:
    """counts[i] = #postings with cd >= (i+2) - 0.5, for t = 2..101.

    Mergeable across doc-range shards by plain addition — the basis of the
    sharded BM25-ADPT two-phase protocol."""
    cds_sorted = np.sort(np.asarray(cds, dtype=np.float64))
    thresholds = np.arange(2, 102, dtype=np.float64) - 0.5
    return (len(cds_sorted) - np.searchsorted(cds_sorted, thresholds, side="left")).astype(np.int64)


def adpt_term_params(n_docs: int, df: int, counts: np.ndarray) -> tuple[np.float32, np.float32]:
    """(k1, IGs[1]) for one term from its GLOBAL cd counts — the IG curve
    with the truncation quirk and the k1 grid search (BM25ADPT.cs:44-168;
    float semantics identical to the oracle, which is tested against it)."""

    def getdft(t: int) -> float:
        # The C# getdft returns float (float32): N/df/counts round through
        # float32 before the double-precision log math below.  Identical for
        # values < 2^24; matters for web-scale corpora (ADVICE r1).  Note
        # C# Math.Log(x, 2) = ln(x)/ln(2) can still differ from math.log2 by
        # 1 ulp — the bit-exactness claim is scoped to inputs where the two
        # agree (all tested corpora; divergence probability ~1e-16/term).
        if t == 0:
            return float(F32(n_docs))
        if t == 1:
            return float(F32(df))
        return float(F32(counts[t - 2]))

    def ig(t: int) -> np.float32:
        return F32(
            -math.log2((df + 0.5) / (n_docs + 1))
            + math.log2((getdft(t + 1) + 0.5) / (getdft(t) + 1))
        )

    igs = np.zeros(100, dtype=np.float32)
    igs[0] = ig(0)
    for i in range(1, 100):
        igs[i] = ig(i)
        if igs[i - 1] > igs[i]:
            trunc = np.zeros(i + 1, dtype=np.float32)
            trunc[:i] = igs[:i]
            igs = trunc
            break
    return _getk1(igs), igs[1]


def adpt_contrib(cds: np.ndarray, qtf: int, k1: np.float32, ig1: np.float32) -> np.ndarray:
    """Per-posting float32 contributions qtf * ck * IGs[1] (BM25ADPT.cs:79-95)."""
    with np.errstate(all="ignore"):
        ck = (cds * F32(float(k1) + 1)) / (F32(k1) + cds)
        return (F32(qtf) * ck * ig1).astype(np.float32)


def taat_bm25_adpt(
    reader: IndexReader, keywords: list[tuple[str, int]], params: BM25Params, k: int = 1000,
    exclude: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    n = reader.n_docs
    avgdl = reader.avgdl
    b = params.b
    scores = np.zeros(n, dtype=np.float32)
    touched = np.zeros(n, dtype=bool)
    for term, qtf in keywords:
        tp = reader.postings(term)
        if tp is None:
            continue
        ids, tfs, dls = tp.arrays()
        cds = (tfs / (1 - b + b * dls / avgdl)).astype(np.float32)
        k1, ig1 = adpt_term_params(n, tp.df, adpt_cd_counts(cds))
        contrib = adpt_contrib(cds, qtf, k1, ig1)
        scores[ids] = scores[ids] + contrib
        touched[ids] = True
    if exclude is not None:
        touched &= ~exclude
    return _topk_from_dense(scores, touched, k)


# --------------------------------------------------------------------------
# Block-max WAND DAAT
# --------------------------------------------------------------------------

class _Cursor:
    __slots__ = ("tp", "qpos", "idf", "qterm", "blocks", "bi", "pos", "ids",
                 "tfs", "dls", "ub", "params", "avgdl", "kind", "cur")

    def __init__(self, tp: TermPostings, qpos: int, idf: float, qterm: float,
                 params: BM25Params, avgdl: float, kind: str):
        self.tp = tp
        self.qpos = qpos
        self.idf = idf
        self.qterm = qterm
        self.params = params
        self.avgdl = avgdl
        self.kind = kind
        self.blocks = tp.blocks
        self.bi = 0
        self.pos = 0
        self.ids = self.tfs = self.dls = None
        # term-level upper bound (clamped >= 0 so pivot prefix sums are monotone)
        self.ub = max(0.0, max(self._block_bound(b) for b in self.blocks)) + _EPS
        self._load_block()

    def _block_bound(self, blk) -> float:
        # stored tfn = tf/(tf + k1*norm); BM25 contribution = idf*(k1+1)*tfn*qterm.
        # For negative idf the *least* tfn gives the largest (least negative)
        # contribution, hence lb_tfn.
        if self.kind == "tfidf":
            return self.idf * blk.ub_logtf
        tfn = blk.ub_tfn if self.idf > 0 else blk.lb_tfn
        return self.idf * (self.params.k1 + 1) * tfn * self.qterm

    def _load_block(self):
        if self.bi < len(self.blocks):
            self.ids, self.tfs, self.dls = self.blocks[self.bi].decode()
            self.pos = 0
            self.cur = int(self.ids[0])
        else:
            self.ids = None
            self.cur = -1  # exhausted sentinel handled by caller

    @property
    def exhausted(self) -> bool:
        return self.ids is None

    def advance_to(self, target: int) -> None:
        """Move to the first posting with doc >= target (block-skipping)."""
        while self.bi < len(self.blocks) and self.blocks[self.bi].last_doc < target:
            self.bi += 1
            self.ids = None
        if self.bi >= len(self.blocks):
            self.ids = None
            return
        if self.ids is None:
            self._load_block()
        pos = int(np.searchsorted(self.ids, target, side="left"))
        if pos >= len(self.ids):
            self.bi += 1
            self._load_block()
        else:
            self.pos = pos
            self.cur = int(self.ids[pos])

    def advance(self) -> None:
        self.pos += 1
        if self.pos >= len(self.ids):
            self.bi += 1
            self._load_block()
        else:
            self.cur = int(self.ids[self.pos])

    def current_block_bound(self) -> float:
        return max(0.0, self._block_bound(self.blocks[self.bi])) + _EPS

    def current_block_last(self) -> int:
        return self.blocks[self.bi].last_doc

    def gather_range(self, w_end: int) -> tuple[np.ndarray, np.ndarray]:
        """Consume all postings with doc < w_end (possibly spanning blocks);
        returns (doc_ids, float32 contributions) and leaves the cursor on
        the first posting >= w_end."""
        ids_parts: list[np.ndarray] = []
        contrib_parts: list[np.ndarray] = []
        while not self.exhausted and self.cur < w_end:
            hi = int(np.searchsorted(self.ids, w_end, side="left"))
            ids_parts.append(self.ids[self.pos : hi])
            contrib_parts.append(self.slice_contrib(self.pos, hi))
            if hi >= len(self.ids):
                self.bi += 1
                self._load_block()
            else:
                self.pos = hi
                self.cur = int(self.ids[hi])
                break
        if not ids_parts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        if len(ids_parts) == 1:
            return ids_parts[0], contrib_parts[0]
        return np.concatenate(ids_parts), np.concatenate(contrib_parts)

    def slice_contrib(self, lo: int, hi: int) -> np.ndarray:
        """Vectorized float32 contributions for postings [lo, hi) of the
        current block — identical expression/casts to the TAAT scorers."""
        tfs = self.tfs[lo:hi]
        if self.kind == "tfidf":
            return (np.log1p(tfs) * self.idf).astype(np.float32)
        dls = self.dls[lo:hi]
        doc_term = 1 - self.params.b + self.params.b * (dls / self.avgdl)
        return (
            self.idf * (tfs * (self.params.k1 + 1)) / (tfs + self.params.k1 * doc_term) * self.qterm
        ).astype(np.float32)


def _build_cursors(
    reader: IndexReader, keywords: list[tuple[str, int]], params: BM25Params, kind: str
) -> list[_Cursor]:
    """Shared by wand_topk/maxscore_topk: one cursor per present term, with
    the SAME idf expressions as the TAAT scorers (incl. the tfidf integer-
    division quirk) so every DAAT path stays bit-identical to TAAT."""
    n = reader.n_docs
    cursors: list[_Cursor] = []
    qpos = 0
    for term, qtf in keywords:
        tp = reader.postings(term)
        if tp is None or not tp.blocks:
            continue
        if kind == "tfidf":
            idf = math.log(n // tp.df)
            qterm = 1.0
        else:
            idf = math.log((n - tp.df + 0.5) / (tp.df + 0.5))
            qterm = ((params.k3 + 1) * qtf) / (params.k3 + qtf)
        cursors.append(_Cursor(tp, qpos, idf, qterm, params, reader.avgdl, kind))
        qpos += 1
    return cursors


def _ranked_from_heap(heap: list[tuple[float, int]]) -> tuple[np.ndarray, np.ndarray]:
    """(score desc, docID asc) — the shared DAAT tie-break epilogue."""
    ranked = sorted(heap, key=lambda p: (-p[0], -p[1]))
    ids = np.asarray([-d for _s, d in ranked], dtype=np.int64)
    scores = np.asarray([s for s, _d in ranked], dtype=np.float32)
    return ids, scores


def wand_topk(
    reader: IndexReader,
    keywords: list[tuple[str, int]],
    params: BM25Params,
    k: int = 1000,
    kind: str = "bm25",
    exclude: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """``exclude``: boolean mask of tombstoned doc ordinals.  Dead docs
    are dropped at window evaluation (never enter the heap); block-max
    bounds computed over all postings remain VALID upper bounds for the
    live docs (removing docs can only lower a block's max), so pruning
    stays conservative-correct — results are bit-identical to TAAT with
    the same mask (tested)."""
    cursors = _build_cursors(reader, keywords, params, kind)

    heap: list[tuple[float, int]] = []  # (score, -doc) min-heap; weakest first

    def threshold() -> float:
        return heap[0][0] if len(heap) == k else -math.inf

    live = [c for c in cursors if not c.exhausted]
    while live:
        live.sort(key=lambda c: c.cur)
        # pivot: smallest prefix of sorted cursors whose ub sum beats threshold
        th = threshold()
        acc = 0.0
        pivot = -1
        for i, c in enumerate(live):
            acc += c.ub
            if acc > th:
                pivot = i
                break
        if pivot < 0:
            break  # no document can enter the top-k
        pivot_doc = live[pivot].cur

        if live[0].cur == pivot_doc:
            # Involved set = every cursor at pivot_doc INCLUDING ties beyond
            # the pivot index (their contributions count toward any doc in
            # the window, so the bound must include them).
            p2 = pivot
            while p2 + 1 < len(live) and live[p2 + 1].cur == pivot_doc:
                p2 += 1
            # block-max refinement: re-check with current block bounds
            block_acc = 0.0
            for c in live[: p2 + 1]:
                block_acc += c.current_block_bound()
            if block_acc <= th:
                # Skip to the next block boundary among involved cursors,
                # capped at the next cursor's current doc — past that point
                # cursors outside the checked prefix could contribute.
                d_next = min(c.current_block_last() for c in live[: p2 + 1]) + 1
                if p2 + 1 < len(live):
                    d_next = min(d_next, live[p2 + 1].cur)
                target = max(d_next, pivot_doc + 1)
                for c in live[: p2 + 1]:
                    if c.cur < target:
                        c.advance_to(target)
            else:
                # Evaluate a whole WINDOW vectorized.  All cursors with
                # cur == pivot_doc form the involved set (sorted order means
                # the prefix up to and including every tie).  Every document
                # in [pivot_doc, w_end) is fully covered by the involved
                # cursors' CURRENT blocks: w_end stops at the earliest
                # current-block end and at the next cursor's doc.
                involved = [c for c in live if c.cur == pivot_doc]
                # window may span multiple blocks (capped so the scratch
                # array stays cache-resident); it always stops before the
                # next non-involved cursor's doc so coverage stays complete
                w_end = pivot_doc + _WINDOW_CAP
                if len(involved) < len(live):
                    w_end = min(w_end, live[len(involved)].cur)
                width = w_end - pivot_doc
                scratch = np.zeros(width, dtype=np.float32)
                touched = np.zeros(width, dtype=bool)
                # term-outer accumulation in QUERY ORDER — the same float32
                # operation order as TAAT, so scores stay bit-identical
                for c in sorted(involved, key=lambda c: c.qpos):
                    ids, contrib = c.gather_range(w_end)
                    rel = ids - pivot_doc
                    scratch[rel] = scratch[rel] + contrib
                    touched[rel] = True
                cand = np.flatnonzero(touched)
                if exclude is not None and len(cand):
                    live_keep = ~exclude[pivot_doc + cand]
                    cand = cand[live_keep]
                cand_scores = scratch[cand]
                # bulk pre-filter against the window-entry threshold
                # (threshold only rises, so this is conservative-correct)
                if len(heap) == k:
                    keep = cand_scores > th
                    cand, cand_scores = cand[keep], cand_scores[keep]
                for rel, score in zip(cand.tolist(), cand_scores.tolist()):
                    if len(heap) < k:
                        heapq.heappush(heap, (score, -(pivot_doc + rel)))
                    elif score > heap[0][0]:
                        heapq.heapreplace(heap, (score, -(pivot_doc + rel)))
                # involved cursors were advanced past the window by gather_range
        else:
            # advance cursors before the pivot up to pivot_doc
            for c in live[:pivot]:
                if c.cur < pivot_doc:
                    c.advance_to(pivot_doc)
        live = [c for c in live if not c.exhausted]

    return _ranked_from_heap(heap)


def conjunctive_bm25(
    reader: IndexReader,
    keywords: list[tuple[str, int]],
    params: BM25Params,
    k: int = 1000,
) -> tuple[np.ndarray, np.ndarray]:
    """Ranked AND retrieval: BM25 top-k over docs containing ALL query terms.

    The candidate set comes from the block-skipping boolean AND
    (engine/boolean.py — rarest-term-first, tombstone-aware), then each
    term's contribution is gathered BLOCK-GRANULARLY: only posting blocks
    that actually contain a matched doc are decoded, so a head term costs
    O(matched blocks), not O(postings).  Scores are accumulated float32 in
    query order — bit-identical to the exhaustive TAAT score of the same
    docs (tested).  Any query term absent from the index yields an empty
    result (conjunctive semantics, unlike J1's silent drop)."""
    from .boolean import boolean_and

    docs = boolean_and(reader, [t for t, _ in keywords])
    if len(docs) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    n = reader.n_docs
    avgdl = reader.avgdl
    scores = np.zeros(len(docs), dtype=np.float32)
    for term, qtf in keywords:
        tp = reader.postings(term)
        idf = math.log((n - tp.df + 0.5) / (tp.df + 0.5))
        qterm = ((params.k3 + 1) * qtf) / (params.k3 + qtf)
        for blk in tp.blocks:
            lo = int(np.searchsorted(docs, blk.first_doc))
            hi = int(np.searchsorted(docs, blk.last_doc, side="right"))
            if lo == hi:
                continue  # no matched doc in this block: never decoded
            bids, btfs, bdls = blk.decode()
            sub = docs[lo:hi]
            pos = np.searchsorted(bids, sub)
            tfs = btfs[pos]
            dls = bdls[pos]
            doc_term = 1 - params.b + params.b * (dls / avgdl)
            contrib = (
                idf * (tfs * (params.k1 + 1)) / (tfs + params.k1 * doc_term) * qterm
            ).astype(np.float32)
            scores[lo:hi] = scores[lo:hi] + contrib
    order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
    return docs[order], scores[order]


# --------------------------------------------------------------------------
# MaxScore DAAT (Turtle & Flood 1995 term-upper-bound partitioning over the
# same block-skipping cursors as WAND; pruning uses TERM-level bounds only —
# the per-block bound refinement is WAND's, not replicated here)
# --------------------------------------------------------------------------

def maxscore_topk(
    reader: IndexReader,
    keywords: list[tuple[str, int]],
    params: BM25Params,
    k: int = 1000,
    kind: str = "bm25",
    exclude: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """MaxScore top-k, bit-identical to TAAT/WAND (tested).

    Live terms are sorted by ascending term upper bound and split into a
    NON-ESSENTIAL prefix (cumulative ub <= heap threshold) and an ESSENTIAL
    suffix.  Only essential cursors enumerate documents (vectorized windows,
    like WAND's dense path); non-essential cursors are probed per surviving
    candidate in descending-ub order with early abandon on the remaining-ub
    bound.  Docs matched only by non-essential terms are skipped outright:
    per-term ubs carry +_EPS, so such a doc's true score is STRICTLY below
    the threshold and can never tie into the top-k.

    A global ascending ``frontier`` keeps enumeration strictly doc-ordered
    across partition changes (a probed-but-not-consumed non-essential posting
    below the frontier must never re-surface when its term turns essential —
    that would double-insert the doc), which also makes heap tie behavior
    (first k in doc order among equal scores) identical to TAAT's
    ascending-docID tie-break.

    Exact scoring: a candidate's score is re-folded in float32 over its
    matching terms in QUERY order (the same add order as the TAAT dense
    accumulator), so scores are bit-identical, not just rank-identical.

    ``exclude`` composes exactly as in :func:`wand_topk`: bounds computed
    over all postings remain valid for the live docs, and dead docs are
    dropped before they can enter the heap.
    """
    n = reader.n_docs
    cursors: list[_Cursor] = []
    qpos = 0
    for term, qtf in keywords:
        tp = reader.postings(term)
        if tp is None or not tp.blocks:
            continue
        if kind == "tfidf":
            idf = math.log(n // tp.df)
            qterm = 1.0
        else:
            idf = math.log((n - tp.df + 0.5) / (tp.df + 0.5))
            qterm = ((params.k3 + 1) * qtf) / (params.k3 + qtf)
        cursors.append(_Cursor(tp, qpos, idf, qterm, params, reader.avgdl, kind))
        qpos += 1

    heap: list[tuple[float, int]] = []  # (score, -doc) min-heap; weakest first

    def threshold() -> float:
        return heap[0][0] if len(heap) == k else -math.inf

    frontier = 0
    live = [c for c in cursors if not c.exhausted]
    while live:
        # enforce the global frontier: postings below it were either scored
        # exactly or proven strictly below the threshold in a prior window
        for c in live:
            if c.cur < frontier:
                c.advance_to(frontier)
        live = [c for c in live if not c.exhausted]
        if not live:
            break
        live.sort(key=lambda c: c.ub)
        th = threshold()
        acc = 0.0
        split = 0
        while split < len(live) and acc + live[split].ub <= th:
            acc += live[split].ub
            split += 1
        if split == len(live):
            break  # all terms together cannot beat the threshold
        ness_desc = live[:split][::-1]  # probe order: descending ub
        ess = live[split:]
        ne_total = acc

        w_start = min(c.cur for c in ess)
        w_end = w_start + _WINDOW_CAP
        width = w_end - w_start
        scratch = np.zeros(width, dtype=np.float32)
        touched = np.zeros(width, dtype=bool)
        # keep per-term window postings for the exact per-candidate re-fold
        parts: list[tuple[int, np.ndarray, np.ndarray]] = []
        for c in sorted(ess, key=lambda c: c.qpos):
            ids, contrib = c.gather_range(w_end)
            rel = ids - w_start
            scratch[rel] = scratch[rel] + contrib
            touched[rel] = True
            parts.append((c.qpos, ids, contrib))
        cand = np.flatnonzero(touched)
        if exclude is not None and len(cand):
            cand = cand[~exclude[w_start + cand]]
        cand_scores = scratch[cand]
        if len(heap) == k:
            # conservative bulk pre-filter; +_EPS covers the float32 add-
            # reordering slack when a non-essential contribution interleaves
            # into the query-order fold
            keep = cand_scores.astype(np.float64) + ne_total + _EPS > th
            cand, cand_scores = cand[keep], cand_scores[keep]

        for rel, ess_score in zip(cand.tolist(), cand_scores.tolist()):
            doc = w_start + rel
            th_now = threshold()
            partial = float(ess_score)
            remaining = ne_total
            hits: list[tuple[int, float]] = []
            abandoned = False
            for c in ness_desc:
                if partial + remaining + _EPS <= th_now:
                    abandoned = True
                    break
                remaining -= c.ub
                if c.exhausted:
                    continue
                if c.cur < doc:
                    c.advance_to(doc)  # candidates ascend, so this is monotone
                if not c.exhausted and c.cur == doc:
                    cv = float(c.slice_contrib(c.pos, c.pos + 1)[0])
                    partial += cv
                    hits.append((c.qpos, cv))
            if abandoned:
                continue
            if hits:
                # exact score: fold ALL matching contributions in query order
                # (float64 intermediate of two float32 values rounds to the
                # same float32 as a native float32 add)
                for qp, ids, contrib in parts:
                    pos = int(np.searchsorted(ids, doc))
                    if pos < len(ids) and ids[pos] == doc:
                        hits.append((qp, float(contrib[pos])))
                hits.sort()
                s = np.float32(0.0)
                for _qp, cv in hits:
                    s = np.float32(s + cv)
                score = float(s)
            else:
                score = float(ess_score)
            if len(heap) < k:
                heapq.heappush(heap, (score, -doc))
            elif score > heap[0][0]:
                heapq.heapreplace(heap, (score, -doc))

        frontier = w_end
        live = [c for c in live if not c.exhausted]

    return _ranked_from_heap(heap)
