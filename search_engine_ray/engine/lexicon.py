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
    dset = pads.dataset(os.path.join(index_dir, "terms.parquet"))
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
        tbl = pads.dataset(os.path.join(index_dir, "terms.parquet")).to_table()
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
