"""Oracle scorers — faithful transcriptions of the reference's three scorers.

- TF-IDF  (/root/reference/src/Query/TfIdfScorer.cs:24-54): idf uses the
  reference's INTEGER division ``ln(N // df)`` (TfIdfScorer.cs:29 divides two
  C# ints before Math.Log); per-term contribution ``ln(1+tf) * idf`` is cast
  to float32 and accumulated in float32, like the C# Dictionary<int,float>.
- BM25    (BM25Scorer.cs:32-73): idf = ln((N-df+0.5)/(df+0.5)) (may go
  negative); the computed ``ln(1+tf)`` at BM25Scorer.cs:46 is UNUSED by the
  final formula — we reproduce the formula actually applied:
  ``idf * (tf*(k1+1))/(tf + k1*(1-b+b*dl/avgdl)) * ((k3+1)*qtf)/(k3+qtf)``,
  cast float32 per (term,doc), accumulated in float32.
- BM25-ADPT (BM25ADPT.cs:25-168): information-gain curve per term with the
  truncation quirk (the truncated IG array's last slot stays 0.0,
  BM25ADPT.cs:59-68), per-term k1 grid search over j = 0.2, 0.3, ... with
  IEEE double accumulation drift (``j += 0.1``, BM25ADPT.cs:148), and the
  final score ``qtf * ck * IGs[1]`` — the computed idf at BM25ADPT.cs:48 is
  unused.  Float32 where the C# uses float (incl. inf/nan from IGs[1]==0).

All scorers process query terms in query order (GetPostingLists preserves
input order and silently drops absent terms, ReadableIndex.cs:29-42).
Ties in the final ranking are broken by ascending docID — the one
deliberate determinism fix over the reference's dict-enumeration tie order
(SURVEY.md §2.6 K1).
"""

from __future__ import annotations

import math

import numpy as np

from ..config import BM25Params
from .indexer import OracleIndex

F32 = np.float32


def _topk(results: dict[int, np.float32], index: OracleIndex, k: int) -> list[tuple[str, float]]:
    ranked = sorted(results.items(), key=lambda p: (-float(p[1]), p[0]))[:k]
    return [(index.doc_names[d], float(s)) for d, s in ranked]


def score_tfidf(index: OracleIndex, keywords: list[tuple[str, int]], k: int = 1000) -> list[tuple[str, float]]:
    n = index.n_docs
    results: dict[int, np.float32] = {}
    for term, _qtf in keywords:
        entry = index.postings.get(term)
        if entry is None:
            continue
        doc_ids, tfs = entry
        idf = math.log(n // len(doc_ids))  # reference int division quirk
        for d, tf in zip(doc_ids, tfs):
            contrib = F32(math.log(1 + tf) * idf)
            results[d] = results.get(d, F32(0)) + contrib
    return _topk(results, index, k)


def score_bm25(
    index: OracleIndex,
    keywords: list[tuple[str, int]],
    params: BM25Params | None = None,
    k: int = 1000,
) -> list[tuple[str, float]]:
    p = params or BM25Params()
    n = index.n_docs
    avgdl = index.avgdl
    results: dict[int, np.float32] = {}
    for term, qtf in keywords:
        entry = index.postings.get(term)
        if entry is None:
            continue
        doc_ids, tfs = entry
        df = len(doc_ids)
        idf = math.log((n - df + 0.5) / (df + 0.5))
        qterm = ((p.k3 + 1) * qtf) / (p.k3 + qtf)
        for d, tf in zip(doc_ids, tfs):
            doc_term = 1 - p.b + p.b * (index.doc_lens[d] / avgdl)
            main = (tf * (p.k1 + 1)) / (tf + p.k1 * doc_term)
            contrib = F32(idf * main * qterm)
            results[d] = results.get(d, F32(0)) + contrib
    return _topk(results, index, k)


def _cd(tf: int, dl: int, avgdl: float, b: float) -> np.float32:
    return F32(tf / (1 - b + b * dl / avgdl))


def score_bm25_adpt(
    index: OracleIndex,
    keywords: list[tuple[str, int]],
    params: BM25Params | None = None,
    k: int = 1000,
) -> list[tuple[str, float]]:
    p = params or BM25Params()
    n = index.n_docs
    avgdl = index.avgdl
    results: dict[int, np.float32] = {}

    for term, qtf in keywords:
        entry = index.postings.get(term)
        if entry is None:
            continue
        doc_ids, tfs = entry
        df = len(doc_ids)
        cds = [_cd(tf, index.doc_lens[d], avgdl, p.b) for d, tf in zip(doc_ids, tfs)]

        def getdft(t: int) -> float:
            # BM25ADPT.cs:107-129 — C# getdft returns float (float32), so
            # N/df/counts round through float32 before the double log math
            # (identical below 2^24; see engine.scoring.adpt_term_params).
            if t == 0:
                return float(F32(n))
            if t == 1:
                return float(F32(df))
            return float(F32(sum(1 for c in cds if c >= t - 0.5)))

        def ig(t: int) -> np.float32:
            # BM25ADPT.cs:136-140
            return F32(
                -math.log2((df + 0.5) / (n + 1))
                + math.log2((getdft(t + 1) + 0.5) / (getdft(t) + 1))
            )

        igs = np.zeros(100, dtype=np.float32)
        igs[0] = ig(0)
        for i in range(1, 100):
            igs[i] = ig(i)
            if igs[i - 1] > igs[i]:
                # Truncation quirk: slot i is left at default 0.0
                # (BM25ADPT.cs:61-67 copies only j < i into the new array).
                trunc = np.zeros(i + 1, dtype=np.float32)
                trunc[:i] = igs[:i]
                igs = trunc
                break

        k1 = _getk1(igs)
        ig1 = igs[1]
        for d, c in zip(doc_ids, cds):
            with np.errstate(all="ignore"):
                ck = F32(F32(c * F32(k1 + 1)) / F32(k1 + c))
                contrib = F32(qtf * ck * ig1)
            results[d] = results.get(d, F32(0)) + contrib
    return _topk(results, index, k)


def _getk1(igs: np.ndarray) -> np.float32:
    # BM25ADPT.cs:141-168 — grid search with IEEE double drift on j += 0.1.
    k1_best = 0.2
    sq_best = float("inf")
    j = 0.2
    while j <= 2.5:
        sq = 0.0
        for t in range(len(igs)):
            with np.errstate(all="ignore"):
                ratio = float(F32(igs[t]) / F32(igs[1]))  # float division (C# float)
            sq += (ratio - ((j + 1) * t) / (j + t)) ** 2
        if sq < sq_best:
            sq_best = sq
            k1_best = j
        j += 0.1
    return F32(k1_best)
