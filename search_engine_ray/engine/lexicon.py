"""Dictionary (lexicon) queries: prefix and wildcard term matching, and
prefix-expanded disjunctive retrieval.

Beyond-reference surface: the reference's FastDictionary
(/root/reference/src/Indexing/FastDictionary.cs) supports only exact-term
lookup (ReadableIndex.cs:29-42, J1); a web-scale engine also needs
``te*``-style dictionary scans (trailing-wildcard / prefix queries) and
query expansion over the matched vocabulary.

Scale shape
-----------
``terms.parquet`` is written SORTED by term (engine/build.py terms phase),
so a prefix probe is a range predicate that Parquet row-group min/max
statistics prune to the touched groups only — the dictionary is never
fully scanned for a prefix.  A general wildcard with a leading ``*`` has
no sortable prefix; ``match_terms`` does one vectorized regex pass over
the (term, df) table — at 100 TB the dictionary is a few GB, read as a
streamed column scan, still never the corpus.  Expansion-based retrieval
caps the number of expanded terms (``max_expand``, highest-df first) so a
hot prefix cannot turn one query into an unbounded union of posting
lists.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from .terms_io import read_terms_table, terms_dataset


def _prefix_upper(prefix: str) -> str | None:
    """Smallest string greater than every string with this prefix
    (increment the last non-0x10FFFF char, dropping the tail)."""
    for i in range(len(prefix) - 1, -1, -1):
        c = ord(prefix[i])
        if c < 0x10FFFF:
            return prefix[:i] + chr(c + 1)
    return None


def prefix_terms(index_dir: str, prefix: str, limit: int | None = None) -> pa.Table:
    """All dictionary terms starting with ``prefix`` -> (term, df), term
    ascending.  Row-group-pruned range read over the sorted terms table."""
    if prefix == "":
        raise ValueError("empty prefix would scan the whole dictionary; use match_terms")
    dset = terms_dataset(index_dir)
    filt = pc.field("term") >= prefix
    upper = _prefix_upper(prefix)
    if upper is not None:
        filt = filt & (pc.field("term") < upper)
    tbl = dset.to_table(filter=filt)
    tbl = tbl.sort_by("term")
    if limit is not None:
        tbl = tbl.slice(0, limit)
    return tbl


def match_terms(index_dir: str, pattern: str, limit: int | None = None) -> pa.Table:
    """Dictionary terms matching an fnmatch-style wildcard (``*``/``?``)
    -> (term, df), term ascending.  One vectorized regex pass; a pattern
    with a literal prefix is range-pruned first."""
    # peel the literal prefix (everything before the first metachar) so the
    # common "abc*" / "abc?de*" shapes still prune by row-group stats
    meta = min(
        [i for i, ch in enumerate(pattern) if ch in "*?"] or [len(pattern)]
    )
    literal = pattern[:meta]
    if literal == pattern:  # no wildcard: exact lookup
        tbl = prefix_terms(index_dir, literal)
        return tbl.filter(pc.equal(tbl["term"], literal))
    if literal:
        tbl = prefix_terms(index_dir, literal)
    else:
        tbl = read_terms_table(index_dir)
    # hand-rolled translation: fnmatch.translate emits atomic groups RE2
    # rejects; match_substring_regex SEARCHES, so anchor both ends
    regex = "^" + "".join(
        ".*" if ch == "*" else "." if ch == "?" else re.escape(ch) for ch in pattern
    ) + "$"
    tbl = tbl.filter(pc.match_substring_regex(tbl["term"], regex))
    tbl = tbl.sort_by("term")
    if limit is not None:
        tbl = tbl.slice(0, limit)
    return tbl


def expand_prefix_query(
    index_dir: str, prefix: str, max_expand: int = 64
) -> list[tuple[str, int]]:
    """Prefix -> list of (term, qtf=1) keywords for disjunctive scoring.

    When more than ``max_expand`` terms match, the highest-df terms win
    (ties -> term ascending) — the bounded-expansion rule that keeps a hot
    prefix from unioning an unbounded set of posting lists."""
    tbl = prefix_terms(index_dir, prefix)
    terms = tbl["term"].to_pylist()
    if len(terms) > max_expand:
        dfs = tbl["df"].to_pylist()
        order = sorted(range(len(terms)), key=lambda i: (-dfs[i], terms[i]))[:max_expand]
        terms = [terms[i] for i in sorted(order)]
    return [(t, 1) for t in terms]


def suggest_terms(index_dir: str, prefix: str, k: int = 5) -> pa.Table:
    """Query auto-completion: the k highest-df dictionary terms starting
    with ``prefix`` (ties -> term ascending) -> (term, df).  Same
    row-group-pruned range read as prefix_terms; ranking happens on the
    prefix-matched slice only."""
    tbl = prefix_terms(index_dir, prefix)
    terms = tbl["term"].to_pylist()
    dfs = tbl["df"].to_pylist()
    order = sorted(range(len(terms)), key=lambda i: (-dfs[i], terms[i]))[:k]
    return pa.table(
        {
            "term": pa.array([terms[i] for i in order], pa.string()),
            "df": pa.array([dfs[i] for i in order], pa.int64()),
        }
    )


def levenshtein_dists(terms, query: str) -> "np.ndarray":
    """Character-level Levenshtein distance from ``query`` to every
    candidate term, vectorized over candidates (Wagner-Fischer with the
    DP matrix batched across all terms as numpy rows).

    Distances are over Unicode code points (terms encoded utf-32), the
    same definition DuckDB's ``levenshtein()`` uses — that equivalence is
    what lets the driver oracle check this kernel exactly.  Cost is
    O(len(query) x max_term_len) vectorized steps over n candidates;
    callers bound max_term_len by length-pruning first (|len(t) -
    len(q)| <= max_dist implies dist > max_dist otherwise)."""
    import numpy as np

    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    tl = terms.to_pylist() if not isinstance(terms, list) else terms
    n = len(tl)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    q = np.frombuffer(query.encode("utf-32-le"), dtype=np.uint32)
    m = len(q)
    lens = np.fromiter((len(t) for t in tl), dtype=np.int64, count=n)
    L = int(lens.max()) if n else 0
    mat = np.zeros((n, max(L, 1)), dtype=np.uint32)
    for i, t in enumerate(tl):
        if t:
            mat[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
    prev = np.broadcast_to(np.arange(L + 1, dtype=np.int64), (n, L + 1)).copy()
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        if L:
            sub = prev[:, :-1] + (mat[:, :L] != q[i - 1])
            best = np.minimum(sub, prev[:, 1:] + 1)
            # insertions propagate left-to-right: cur[j] = min(best[j-1], cur[j-1]+1)
            for j in range(1, L + 1):
                cur[:, j] = np.minimum(best[:, j - 1], cur[:, j - 1] + 1)
        prev = cur
    return prev[np.arange(n), lens]


def fuzzy_terms(index_dir: str, query: str, max_dist: int = 1) -> pa.Table:
    """Dictionary terms within Levenshtein distance ``max_dist`` of
    ``query`` -> (term, df, dist), term ascending.

    Scale shape: one streamed (term, df) column scan, length-pruned to
    |len(t) - len(q)| <= max_dist BEFORE the DP kernel (a cheap
    vectorized utf8_length filter), so the O(m x L) kernel only ever sees
    near-length candidates.  For dictionaries too large for one driver
    scan, ``fuzzy_terms_ds`` runs the identical prune+kernel per batch as
    a stateless map_batches — each batch is independent, no shuffle."""
    tbl = read_terms_table(index_dir, columns=["term", "df"])
    return _fuzzy_filter(tbl, query, max_dist).sort_by("term")


def _fuzzy_filter(tbl: pa.Table, query: str, max_dist: int) -> pa.Table:
    import numpy as np

    m = len(query)
    tl = pc.utf8_length(tbl["term"])
    keep = pc.and_(pc.greater_equal(tl, m - max_dist), pc.less_equal(tl, m + max_dist))
    tbl = tbl.filter(keep)
    dists = levenshtein_dists(tbl["term"], query)
    ok = dists <= max_dist
    tbl = tbl.filter(pa.array(ok))
    return tbl.append_column("dist", pa.array(dists[ok].astype(np.int64)))


def fuzzy_terms_ds(terms_ds, query: str, max_dist: int = 1):
    """Distributed variant of ``fuzzy_terms`` over a Dataset of (term,
    df) — the path for dictionaries that outgrow one driver scan.  The
    length prune + DP kernel run per batch (stateless, no shuffle); only
    matches (a handful of rows) leave each task."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        return _fuzzy_filter(batch, query, max_dist)

    return terms_ds.map_batches(batch_fn, batch_format="pyarrow")


def spell_correct(index_dir: str, query: str, max_dist: int = 2, k: int = 3) -> pa.Table:
    """Did-you-mean: the ``k`` best corrections for ``query`` among
    dictionary terms within ``max_dist`` — ranked by (dist asc, df desc,
    term asc), the standard closest-then-most-frequent rule."""
    tbl = fuzzy_terms(index_dir, query, max_dist)
    terms = tbl["term"].to_pylist()
    dfs = tbl["df"].to_pylist()
    dists = tbl["dist"].to_pylist()
    order = sorted(range(len(terms)), key=lambda i: (dists[i], -dfs[i], terms[i]))[:k]
    return pa.table(
        {
            "term": pa.array([terms[i] for i in order], pa.string()),
            "df": pa.array([int(dfs[i]) for i in order], pa.int64()),
            "dist": pa.array([int(dists[i]) for i in order], pa.int64()),
        }
    )
