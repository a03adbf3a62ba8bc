"""Boolean retrieval — the reference declares (but never shipped) a
BooleanScorer (/root/reference/src/Program.cs:135-143, class absent).  This
is that operator done properly: document-at-a-time posting-list
intersection / union over the compressed block index, vectorized with
numpy sorted-set ops, with block skipping for AND (blocks whose doc range
cannot intersect the current candidate set are never decoded).
"""

from __future__ import annotations

import numpy as np

from .index_reader import IndexReader


def _drop_deleted(reader: IndexReader, ids: "np.ndarray") -> "np.ndarray":
    """Tombstoned docs never appear in results (engine/maintenance.py) —
    applied to every boolean surface, same contract as score_topic."""
    mask = reader.deleted_mask()
    if mask is None or len(ids) == 0:
        return ids
    return ids[~mask[ids]]


def boolean_and(reader: IndexReader, terms: list[str]) -> np.ndarray:
    """docIDs (ascending) containing ALL terms; empty if any term is absent."""
    tps = []
    for t in terms:
        tp = reader.postings(t)
        if tp is None:
            return np.empty(0, dtype=np.int64)
        tps.append(tp)
    # rarest first: every later intersection only shrinks the candidate set
    tps.sort(key=lambda tp: tp.df)
    current: np.ndarray | None = None
    for tp in tps:
        if current is None:
            current = tp.arrays()[0]
            continue
        if len(current) == 0:
            break
        lo, hi = int(current[0]), int(current[-1])
        parts = []
        for blk in tp.blocks:
            if blk.last_doc < lo or blk.first_doc > hi:
                continue  # block skipping: never decoded
            parts.append(blk.decode()[0])
        ids = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
        current = current[np.isin(current, ids, assume_unique=True)]
    if current is None:
        return np.empty(0, dtype=np.int64)
    return _drop_deleted(reader, current)


def boolean_or(reader: IndexReader, terms: list[str]) -> np.ndarray:
    """docIDs (ascending) containing ANY term; absent terms dropped (J1)."""
    parts = []
    for t in terms:
        tp = reader.postings(t)
        if tp is not None:
            parts.append(tp.arrays()[0])
    if not parts:
        return np.empty(0, dtype=np.int64)
    return _drop_deleted(reader, np.unique(np.concatenate(parts)))


def boolean_and_not(
    reader: IndexReader, must: list[str], must_not: list[str]
) -> np.ndarray:
    """docIDs (ascending) containing ALL of ``must`` and NONE of
    ``must_not``.  The positive side uses the block-skipping intersection;
    the negative side decodes only blocks overlapping the candidate range
    (absent must_not terms exclude nothing — J1 silent-drop semantics)."""
    current = boolean_and(reader, must)
    for t in must_not:
        if len(current) == 0:
            break
        tp = reader.postings(t)
        if tp is None:
            continue
        lo, hi = int(current[0]), int(current[-1])
        parts = [
            blk.decode()[0]
            for blk in tp.blocks
            if not (blk.last_doc < lo or blk.first_doc > hi)
        ]
        if parts:
            ids = np.concatenate(parts)
            current = current[~np.isin(current, ids, assume_unique=True)]
    return current  # boolean_and already dropped tombstoned docs
