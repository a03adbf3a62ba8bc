"""Boolean query language (engine/boolexpr): parser precedence, the J1
silent-drop semantics, NOT-complement against the live universe, and
set-evaluation parity with a brute-force membership reference."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.config import BuildConfig, IndexOptions
from search_engine_ray.engine.boolexpr import (
    BooleanParseError,
    boolean_query,
    parse_boolean_query,
)
from search_engine_ray.engine.build import build_index
from search_engine_ray.engine.index_reader import IndexReader

DOCS = [
    "spark hash join",
    "spark scan table",
    "hash join scan",
    "spark join",
    "table row value",
    "spark hash scan",
    "join",
    "spark",
]


def test_parser_precedence_and_shapes():
    assert parse_boolean_query("a") == ("term", "a")
    assert parse_boolean_query("a b") == ("and", [("term", "a"), ("term", "b")])
    assert parse_boolean_query("a AND b OR c") == (
        "or",
        [("and", [("term", "a"), ("term", "b")]), ("term", "c")],
    )
    assert parse_boolean_query("a OR b AND c") == (
        "or",
        [("term", "a"), ("and", [("term", "b"), ("term", "c")])],
    )
    assert parse_boolean_query("NOT a AND b") == (
        "and",
        [("not", ("term", "a")), ("term", "b")],
    )
    assert parse_boolean_query("a AND (b OR c)") == (
        "and",
        [("term", "a"), ("or", [("term", "b"), ("term", "c")])],
    )
    assert parse_boolean_query("NOT NOT a") == ("not", ("not", ("term", "a")))
    assert parse_boolean_query("A b", normalize=str.lower) == (
        "and",
        [("term", "a"), ("term", "b")],
    )


@pytest.mark.parametrize("bad", ["", "AND a", "a AND", "(a OR b", "a )", "NOT"])
def test_parser_errors(bad):
    with pytest.raises(BooleanParseError):
        parse_boolean_query(bad)


@pytest.fixture(scope="module")
def reader(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("bx")
    src = str(d / "c.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(DOCS)), pa.int64()),
                "text": pa.array(DOCS),
            }
        ),
        src,
    )
    idx = str(d / "idx")
    build_index(
        src, idx,
        BuildConfig(options=IndexOptions(True, True, False)),
        source_column="text", name_column="doc_id",
    )
    return IndexReader(idx, preload=True)


def _brute(expr_fn) -> list[int]:
    return sorted(i for i, s in enumerate(DOCS) if expr_fn(set(s.split())))


@pytest.mark.parametrize(
    "query,expr",
    [
        ("spark", lambda s: "spark" in s),
        ("spark AND hash", lambda s: "spark" in s and "hash" in s),
        ("spark hash", lambda s: "spark" in s and "hash" in s),
        ("spark OR hash", lambda s: "spark" in s or "hash" in s),
        (
            "spark AND (hash OR join) AND NOT scan",
            lambda s: "spark" in s
            and ("hash" in s or "join" in s)
            and "scan" not in s,
        ),
        ("NOT spark", lambda s: "spark" not in s),
        ("NOT (spark OR join)", lambda s: not ("spark" in s or "join" in s)),
        ("NOT spark AND NOT join", lambda s: "spark" not in s and "join" not in s),
        ("table AND NOT row", lambda s: "table" in s and "row" not in s),
        (
            "(spark OR table) (join OR value)",
            lambda s: ("spark" in s or "table" in s)
            and ("join" in s or "value" in s),
        ),
    ],
)
def test_evaluation_matches_brute_force(reader, query, expr):
    ids = boolean_query(reader, query)
    got = sorted(int(reader.doc_names[d]) for d in ids)
    assert got == _brute(expr)


def test_silent_drop_semantics(reader):
    # absent term: empties AND, vanishes from OR, NOT over it drops nothing
    assert len(boolean_query(reader, "spark AND zzz_missing")) == 0
    got = sorted(
        int(reader.doc_names[d])
        for d in boolean_query(reader, "spark OR zzz_missing")
    )
    assert got == _brute(lambda s: "spark" in s)
    got = sorted(
        int(reader.doc_names[d])
        for d in boolean_query(reader, "spark AND NOT zzz_missing")
    )
    assert got == _brute(lambda s: "spark" in s)


def test_normalizer_applies_to_terms_not_keywords(reader):
    got = sorted(
        int(reader.doc_names[d])
        for d in boolean_query(reader, "SPARK AND HASH", normalize=str.lower)
    )
    assert got == _brute(lambda s: "spark" in s and "hash" in s)


def test_phrase_parse_shapes():
    assert parse_boolean_query('"sort table"') == ("phrase", ("sort", "table"))
    assert parse_boolean_query('"a b" AND c') == (
        "and",
        [("phrase", ("a", "b")), ("term", "c")],
    )
    assert parse_boolean_query('NOT "a b"') == ("not", ("phrase", ("a", "b")))
    # normalizer applies to terms only — phrase words stay raw for the
    # sidecar's own normalization
    assert parse_boolean_query('"A B" AND C', normalize=str.lower) == (
        "and",
        [("phrase", ("A", "B")), ("term", "c")],
    )
    with pytest.raises(BooleanParseError):
        parse_boolean_query('"unbalanced')
    with pytest.raises(BooleanParseError):
        parse_boolean_query('""')


@pytest.fixture(scope="module")
def positions_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("bxpos")
    src = str(d / "c.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(DOCS)), pa.int64()),
                "text": pa.array(DOCS),
            }
        ),
        src,
    )
    from search_engine_ray.engine.positions import build_position_index

    pdir = str(d / "pos")
    build_position_index(
        src, pdir, IndexOptions(True, True, False),
        source_column="text", name_column="doc_id",
    )
    return pdir


@pytest.mark.parametrize(
    "query,expr",
    [
        ('"hash join"', lambda s: "hash join" in s),
        ('"spark hash" OR "hash join"', lambda s: "spark hash" in s or "hash join" in s),
        ('"hash join" AND NOT scan', lambda s: "hash join" in s and "scan" not in s),
        ('spark AND NOT "hash join"', lambda s: "spark" in s and "hash join" not in s),
        ('"zzz boom"', lambda s: False),
    ],
)
def test_phrase_evaluation(reader, positions_dir, query, expr):
    ids = boolean_query(reader, query, positions_dir=positions_dir)
    got = sorted(int(reader.doc_names[d]) for d in ids)
    assert got == sorted(i for i, s in enumerate(DOCS) if expr(s))


def test_phrase_without_positions_dir_fails_loud(reader):
    with pytest.raises(ValueError, match="positions_dir"):
        boolean_query(reader, '"hash join"')


def test_near_parse_shapes():
    assert parse_boolean_query("a NEAR/3 b") == ("near", 3, "a", "b")
    assert parse_boolean_query("a NEAR/3 b AND c") == (
        "and",
        [("near", 3, "a", "b"), ("term", "c")],
    )
    assert parse_boolean_query("x OR a NEAR/10 b") == (
        "or",
        [("term", "x"), ("near", 10, "a", "b")],
    )
    # raw operands survive a term normalizer (sidecar normalizes itself)
    assert parse_boolean_query("A NEAR/2 B", normalize=str.lower) == (
        "near", 2, "A", "B",
    )
    with pytest.raises(BooleanParseError):
        parse_boolean_query('"a b" NEAR/2 c')
    with pytest.raises(BooleanParseError):
        parse_boolean_query("a NEAR/2")


def _near_brute(a, b, k):
    out = []
    for i, s in enumerate(DOCS):
        toks = s.split()
        pa_ = [p for p, t in enumerate(toks) if t == a]
        pb = [p for p, t in enumerate(toks) if t == b]
        if any(abs(x - y) <= k for x in pa_ for y in pb):
            out.append(i)
    return out


@pytest.mark.parametrize("a,b,k", [("spark", "join", 1), ("spark", "join", 2),
                                   ("hash", "scan", 1), ("spark", "zzz", 3)])
def test_near_evaluation(reader, positions_dir, a, b, k):
    ids = boolean_query(reader, f"{a} NEAR/{k} {b}", positions_dir=positions_dir)
    got = sorted(int(reader.doc_names[d]) for d in ids)
    assert got == _near_brute(a, b, k)


def test_near_composes_with_not(reader, positions_dir):
    ids = boolean_query(
        reader, "spark NEAR/2 join AND NOT scan", positions_dir=positions_dir
    )
    got = sorted(int(reader.doc_names[d]) for d in ids)
    want = [i for i in _near_brute("spark", "join", 2) if "scan" not in DOCS[i]]
    assert got == want


def test_near_without_positions_dir_fails_loud(reader):
    with pytest.raises(ValueError, match="positions_dir"):
        boolean_query(reader, "spark NEAR/2 join")


def test_cli_filter_expr(reader, capsys, tmp_path_factory):
    import json as _json

    from search_engine_ray.cli import main
    from search_engine_ray.pipelines import bm25_scores_f64

    idx = reader.index_dir
    rc = main(["query", idx, "spark hash join",
               "--filter-expr", "(table OR join) AND NOT scan", "--k", "10"])
    assert rc == 0
    rows = [
        _json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    ids, scores = bm25_scores_f64(reader, [("spark", 1), ("hash", 1), ("join", 1)])
    allowed = {
        i for i, s in enumerate(DOCS)
        if ("table" in s.split() or "join" in s.split()) and "scan" not in s.split()
    }
    kept = [(int(reader.doc_names[d]), float(s))
            for d, s in zip(ids, scores) if int(reader.doc_names[d]) in allowed]
    assert [(int(r["doc"]), r["score"]) for r in rows] == [
        (d, pytest.approx(s)) for d, s in kept[:10]
    ]
    # parse errors fail loud
    assert main(["query", idx, "spark", "--filter-expr", "(oops"]) == 2


def test_prefix_parse_shapes():
    assert parse_boolean_query("spar*") == ("prefix", "spar")
    assert parse_boolean_query("SPAR* AND x", normalize=str.lower) == (
        "and",
        [("prefix", "spar"), ("term", "x")],
    )
    # a lone '*' or an inner star is a plain term, not a wildcard
    assert parse_boolean_query("a*b")[0] == "term"


@pytest.mark.parametrize(
    "query,expr",
    [
        ("s*", lambda s: any(w.startswith("s") for w in s.split())),
        ("ta* AND NOT scan",
         lambda s: any(w.startswith("ta") for w in s.split())
         and "scan" not in s.split()),
        ("zzz* OR join", lambda s: "join" in s.split()),
        ("NOT s*", lambda s: not any(w.startswith("s") for w in s.split())),
    ],
)
def test_prefix_evaluation(reader, query, expr):
    ids = boolean_query(reader, query)
    got = sorted(int(reader.doc_names[d]) for d in ids)
    assert got == sorted(i for i, s in enumerate(DOCS) if expr(s))


# ---- property: random expressions, engine == brute-force set algebra ----

from hypothesis import given, settings
from hypothesis import strategies as st

_VOCAB = ["spark", "hash", "join", "scan", "table", "row", "value", "zzz"]


def _expr_strategy():
    leaf = st.sampled_from(_VOCAB).map(lambda t: ("term", t))
    return st.recursive(
        leaf,
        lambda kids: st.one_of(
            st.tuples(st.just("not"), kids).map(lambda t: ("not", t[1])),
            st.lists(kids, min_size=2, max_size=3).map(lambda c: ("and", c)),
            st.lists(kids, min_size=2, max_size=3).map(lambda c: ("or", c)),
        ),
        max_leaves=8,
    )


def _render(node) -> str:
    kind = node[0]
    if kind == "term":
        return node[1]
    if kind == "not":
        return f"NOT ({_render(node[1])})"
    op = " AND " if kind == "and" else " OR "
    return "(" + op.join(f"({_render(c)})" for c in node[1]) + ")"


def _brute_eval(node, toks: set) -> bool:
    kind = node[0]
    if kind == "term":
        return node[1] in toks
    if kind == "not":
        return not _brute_eval(node[1], toks)
    if kind == "and":
        return all(_brute_eval(c, toks) for c in node[1])
    return any(_brute_eval(c, toks) for c in node[1])


@settings(max_examples=60, deadline=None)
@given(_expr_strategy())
def test_random_expressions_match_brute_force(reader, node):
    ids = boolean_query(reader, _render(node))
    got = sorted(int(reader.doc_names[d]) for d in ids)
    want = sorted(
        i for i, s in enumerate(DOCS) if _brute_eval(node, set(s.split()))
    )
    assert got == want
