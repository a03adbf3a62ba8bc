"""BM25F fielded ranking (engine/fielded.py + pipelines fielded builds)."""

import math
import os
import re

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.config import IndexOptions
from search_engine_ray.engine.fielded import (
    bm25f_scores_f64,
    derive_ws_fields,
)
from search_engine_ray.text.ws import WS_RE

OPT = IndexOptions(case_folding=True, remove_stopwords=True, stemming=False)

HOSTILE = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",  # >8 tokens
    "one two three",  # <8 tokens -> empty body
    "",  # empty doc
    "   \t \v \f  ",  # whitespace-only
    "a\vb\fc\rd\ne\tf g h i j k",  # exotic whitespace separators
    "exactly eight tokens here pad pad pad pad",  # == 8 -> empty body
    "x " * 40,  # repeated token
]


def test_derive_ws_fields_matches_duckdb(tmp_path):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(HOSTILE)), pa.int64()),
            "text": pa.array(HOSTILE),
        }
    )
    path = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, path)
    title, body = derive_ws_fields(tbl["text"], 8)
    ora = duckdb.connect().execute(
        f"""
        WITH ws AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '{WS_RE}'), x -> x <> '') AS w
          FROM read_parquet('{path}'))
        -- COALESCE: array_to_string([]) is NULL in DuckDB where the engine
        -- yields '' — identical after tokenization (both emit zero tokens),
        -- which is why the bm25f oracle needs no coalesce
        SELECT COALESCE(array_to_string(w[1:8], ' '), '') AS title,
               COALESCE(array_to_string(w[9:], ' '), '') AS body
        FROM ws ORDER BY doc_id
        """
    ).fetchall()
    assert title.to_pylist() == [r[0] for r in ora]
    assert body.to_pylist() == [r[1] for r in ora]


def test_derive_ws_fields_validates():
    with pytest.raises(ValueError):
        derive_ws_fields(pa.array(["a"]), 0)


def _brute_bm25f(
    texts: list[str], terms: list[str], n_title=8, wt=2.0, wb=1.0, bt=0.5, bb=0.75, k1=1.2
):
    """Plain-python BM25F over the same derived fields/tokenization
    (no stopwords in the synthetic vocab, lowercase already)."""
    fields = []
    for t in texts:
        ws = [x for x in re.split(r"[\t\n\x0b\x0c\r ]+", t) if x]
        fields.append((ws[:n_title], ws[n_title:]))
    n = len(texts)
    avg_t = sum(len(f[0]) for f in fields) / n
    avg_b = sum(len(f[1]) for f in fields) / n
    scores = [0.0] * n
    touched = [False] * n
    for term in terms:
        wtf = [0.0] * n
        for d, (ti, bo) in enumerate(fields):
            if ti.count(term):
                wtf[d] += wt * ti.count(term) / (1 - bt + bt * (len(ti) / avg_t))
            if bo.count(term):
                wtf[d] += wb * bo.count(term) / (1 - bb + bb * (len(bo) / avg_b))
        df = sum(1 for w in wtf if w > 0)
        if not df:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5))
        for d, w in enumerate(wtf):
            if w > 0:
                scores[d] += idf * w / (k1 + w)
                touched[d] = True
    return {d: s for d, s in enumerate(scores) if touched[d]}


@pytest.fixture(scope="module")
def fielded_dir(tmp_path_factory, ray_session):
    """A synthetic corpus laid out like an sf_dir (documents.parquet)."""
    rng = np.random.default_rng(11)
    vocab = ["spark", "hash", "join", "table", "sort", "scan", "merge", "plan"]
    texts = []
    for d in range(60):
        n_tok = int(rng.integers(2, 30))
        texts.append(" ".join(rng.choice(vocab, size=n_tok).tolist()))
    texts[5] = "one two"  # short doc: empty body
    sf_dir = str(tmp_path_factory.mktemp("fieldsf"))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        ),
        os.path.join(sf_dir, "documents.parquet"),
    )
    return sf_dir, texts


def test_bm25f_matches_brute_force(fielded_dir):
    from search_engine_ray.pipelines import documents_fielded_readers

    sf_dir, texts = fielded_dir
    frs = documents_fielded_readers(sf_dir, OPT)
    # both field indexes carry EVERY doc (empty-body docs included) and
    # share the docID space
    rt, rb = frs[0][0], frs[1][0]
    assert rt.n_docs == rb.n_docs == len(texts)
    assert list(rt.doc_names) == list(rb.doc_names)
    ids, scores = bm25f_scores_f64(frs, [("spark", 1), ("join", 1)])
    got = {int(rt.doc_names[d]): s for d, s in zip(ids, scores)}
    want = _brute_bm25f(texts, ["spark", "join"])
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], rel=1e-12), d
    # ranking order: score desc, docid asc
    pairs = [(-s, int(rt.doc_names[d])) for d, s in zip(ids, scores)]
    assert pairs == sorted(pairs)


def test_bm25f_rejects_misaligned_readers(fielded_dir, tmp_path):
    from search_engine_ray.pipelines import documents_fielded_readers

    sf_dir, texts = fielded_dir
    frs = documents_fielded_readers(sf_dir, OPT)
    # an index over a DIFFERENT corpus must be refused
    other = str(tmp_path / "other")
    os.makedirs(other)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": pa.array(["a b", "c d", "e f"]),
            }
        ),
        os.path.join(other, "documents.parquet"),
    )
    frs_other = documents_fielded_readers(other, OPT)
    with pytest.raises(ValueError):
        bm25f_scores_f64([frs[0], frs_other[1]], [("spark", 1)])


def test_bm25f_absent_terms(fielded_dir):
    from search_engine_ray.pipelines import documents_fielded_readers

    sf_dir, _ = fielded_dir
    frs = documents_fielded_readers(sf_dir, OPT)
    ids, scores = bm25f_scores_f64(frs, [("zzz_nowhere", 1)])
    assert len(ids) == 0 and len(scores) == 0
