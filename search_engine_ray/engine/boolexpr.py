"""Boolean query language over the inverted index.

Grammar (classic IR syntax, precedence NOT > AND > OR, parentheses,
implicit AND between adjacent atoms — the web-search convention)::

    expr   := orexpr
    orexpr := andexpr ( OR andexpr )*
    andexpr:= nearex ( AND? nearex )*
    nearex := unary ( NEAR/k unary )?
    unary  := NOT unary | '(' expr ')' | "PHRASE WORDS" | PREFIX* | TERM

Operators are the uppercase keywords AND / OR / NOT; everything else is
a term (optionally passed through a caller-supplied normalizer so the
CLI can apply the index's casefold/stem pipeline).  Semantics follow the
engine's J1 silent-drop rule: an absent term is the empty set (it
empties a conjunction, vanishes from a disjunction, and a NOT over it
excludes nothing).  NOT complements against the live universe (all
docIDs minus tombstones), so top-level and nested negation are both
legal.

Evaluation is set algebra over sorted docID arrays with the existing
block-skipping fast paths where the shape allows: a conjunction whose
children are all plain terms (plus optional NOT term children) routes
through engine.boolean.boolean_and / boolean_and_not — rarest-first
intersection that never decodes skipped blocks; everything else reduces
with numpy intersect/union/setdiff on candidate-sized arrays.

No counterpart in the reference (its query pipeline is ranked-only);
the SQL oracle is EXISTS-per-term boolean algebra over the token CTE
(`boolean_expr` gate).
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np

from .boolean import _drop_deleted, boolean_and, boolean_and_not
from .index_reader import IndexReader

_TOKEN_RE = re.compile(r'"[^"]*"|\(|\)|[^\s()"]+')
_NEAR_RE = re.compile(r"NEAR/[0-9]+")


class BooleanParseError(ValueError):
    pass


def parse_boolean_query(query: str, normalize: Callable[[str], str] | None = None):
    """-> AST of ('term', t) | ('and', [children]) | ('or', [children]) |
    ('not', child).  Raises BooleanParseError on dangling operators or
    unbalanced parentheses."""
    if query.count('"') % 2:
        raise BooleanParseError("unbalanced phrase quote")
    toks = _TOKEN_RE.findall(query)
    pos = 0

    def peek() -> str | None:
        return toks[pos] if pos < len(toks) else None

    def take() -> str:
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_or():
        parts = [parse_and()]
        while peek() == "OR":
            take()
            parts.append(parse_and())
        return parts[0] if len(parts) == 1 else ("or", parts)

    def parse_and():
        parts = [parse_near()]
        while True:
            t = peek()
            if t == "AND":
                take()
                parts.append(parse_near())
            elif t is not None and t not in ("OR", ")"):
                parts.append(parse_near())  # implicit AND on adjacency
            else:
                break
        return parts[0] if len(parts) == 1 else ("and", parts)

    def parse_near():
        nonlocal pos
        lstart = pos
        left = parse_unary()
        t = peek()
        if t is not None and _NEAR_RE.fullmatch(t):
            # RAW operand tokens (when the operand was a bare term):
            # proximity_search applies the sidecar's own normalization,
            # exactly like phrase nodes — normalizing here would
            # double-apply it
            raw_l = toks[lstart] if pos == lstart + 1 else None
            k = int(take().split("/", 1)[1])
            rstart = pos
            right = parse_unary()
            raw_r = toks[rstart] if pos == rstart + 1 else None
            if left[0] != "term" or right[0] != "term":
                raise BooleanParseError("NEAR/k joins exactly two terms")
            return ("near", k, raw_l or left[1], raw_r or right[1])
        return left

    def parse_unary():
        t = peek()
        if t is None:
            raise BooleanParseError("unexpected end of query")
        if t == "NOT":
            take()
            return ("not", parse_unary())
        if t == "(":
            take()
            node = parse_or()
            if peek() != ")":
                raise BooleanParseError("missing closing parenthesis")
            take()
            return node
        if t in (")", "AND", "OR"):
            raise BooleanParseError(f"unexpected {t!r}")
        if t.startswith('"'):
            words = take()[1:-1].split()
            if not words:
                raise BooleanParseError("empty phrase")
            # raw words: positions.phrase_search applies the sidecar's own
            # normalization — normalizing here would double-apply it
            return ("phrase", tuple(words))
        if t.endswith("*") and len(t) > 1 and "*" not in t[:-1]:
            # trailing-star prefix wildcard: expanded over the INDEX
            # vocabulary at eval time (lexicon bounded expansion), so the
            # prefix casefolds but is never stemmed
            return ("prefix", take()[:-1].lower())
        term = take()
        return ("term", normalize(term) if normalize else term)

    node = parse_or()
    if pos != len(toks):
        raise BooleanParseError(f"trailing input at {toks[pos]!r}")
    return node


def _phrase_ids_to_ordinals(
    reader: IndexReader, ids: np.ndarray, positions_dir: str
) -> np.ndarray:
    """Positional sidecars built over an INTEGER name column carry the
    caller's ids (positions.py keys the sidecar by documents.doc_id),
    while the reader's set algebra runs in build-ordinal docID space —
    off by an arbitrary mapping whenever the id column isn't 0..n-1
    (caught by the hostile-text net's 1-based ids).  The sidecar records
    which space it used (positions_stats.json ``id_space``); caller ids
    translate through the reader's name table, ordinals pass through.
    Pre-``id_space`` sidecars fall back to a resolve-all heuristic."""
    if len(ids) == 0:
        return ids
    import json as _json
    import os as _os

    try:
        with open(_os.path.join(positions_dir, "positions_stats.json")) as fh:
            id_space = _json.load(fh).get("id_space")
    except OSError:
        id_space = None
    if id_space == "ordinal":
        return ids
    names = {str(n): i for i, n in enumerate(reader.doc_names)}
    ordinals = np.asarray(
        [names.get(str(i), -1) for i in ids.tolist()], dtype=np.int64
    )
    if (ordinals >= 0).all():
        return np.sort(ordinals)
    if id_space == "caller":
        raise ValueError(
            "positions sidecar doc ids do not resolve as index doc names — "
            "the sidecar was built over a different corpus than the index"
        )
    return ids  # legacy sidecar, ids didn't resolve: assume ordinals


def _universe(reader: IndexReader) -> np.ndarray:
    ids = np.arange(len(reader.doc_names), dtype=np.int64)
    return _drop_deleted(reader, ids)


def _eval(reader: IndexReader, node, positions_dir: str | None) -> np.ndarray:
    kind = node[0]
    if kind == "term":
        tp = reader.postings(node[1])
        if tp is None:
            return np.empty(0, dtype=np.int64)
        return _drop_deleted(reader, tp.arrays()[0])
    if kind == "phrase":
        if positions_dir is None:
            raise ValueError(
                "quoted phrase in boolean query requires positions_dir "
                "(the positional sidecar built over the same corpus)"
            )
        from .positions import phrase_search

        t = phrase_search(positions_dir, list(node[1]))
        ids = _phrase_ids_to_ordinals(
            reader, np.asarray(t["doc_id"], dtype=np.int64), positions_dir
        )
        return _drop_deleted(reader, ids)
    if kind == "prefix":
        from .lexicon import expand_prefix_query

        terms = [t for t, _ in expand_prefix_query(reader.index_dir, node[1])]
        parts = [
            _drop_deleted(reader, tp.arrays()[0])
            for tp in (reader.postings(t) for t in terms)
            if tp is not None
        ]
        if not parts:
            return np.empty(0, dtype=np.int64)
        out = parts[0]
        for p in parts[1:]:
            out = np.union1d(out, p)
        return out
    if kind == "near":
        if positions_dir is None:
            raise ValueError(
                "NEAR/k in boolean query requires positions_dir "
                "(the positional sidecar built over the same corpus)"
            )
        from .positions import proximity_search

        t = proximity_search(positions_dir, node[2], node[3], node[1])
        ids = _phrase_ids_to_ordinals(
            reader, np.asarray(t["doc_id"], dtype=np.int64), positions_dir
        )
        return _drop_deleted(reader, ids)
    if kind == "not":
        return np.setdiff1d(
            _universe(reader),
            _eval(reader, node[1], positions_dir),
            assume_unique=True,
        )
    if kind == "or":
        parts = [_eval(reader, c, positions_dir) for c in node[1]]
        out = parts[0]
        for p in parts[1:]:
            out = np.union1d(out, p)
        return out
    # conjunction: route all-term shapes through the block-skipping paths
    children = node[1]
    pos_terms = [c[1] for c in children if c[0] == "term"]
    neg_terms = [
        c[1][1] for c in children if c[0] == "not" and c[1][0] == "term"
    ]
    rest = [
        c
        for c in children
        if not (c[0] == "term" or (c[0] == "not" and c[1][0] == "term"))
    ]
    if pos_terms:
        current = (
            boolean_and_not(reader, pos_terms, neg_terms)
            if neg_terms
            else boolean_and(reader, pos_terms)
        )
    else:
        current = _universe(reader)
        for t in neg_terms:
            current = np.setdiff1d(
                current,
                _eval(reader, ("term", t), positions_dir),
                assume_unique=True,
            )
    for c in rest:
        if len(current) == 0:
            break
        current = np.intersect1d(
            current, _eval(reader, c, positions_dir), assume_unique=True
        )
    return current


def boolean_query(
    reader: IndexReader,
    query: str,
    normalize: Callable[[str], str] | None = None,
    positions_dir: str | None = None,
) -> np.ndarray:
    """docIDs (ascending) matching the boolean expression.  Quoted
    phrases ("exact phrase") need ``positions_dir`` — a positional
    sidecar whose docID space matches the index (always true for the
    standard pairing: same corpus, same name column)."""
    return _eval(reader, parse_boolean_query(query, normalize), positions_dir)
