"""TREC <DOC>/<DOCNO> ingestion: parser semantics + golden equivalence —
indexing a TREC directory must reproduce exactly the postings of indexing
the same texts from a parquet corpus (Parser.cs:14-110 parity)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.sources import parse_trec_bytes

TEXTS = [
    "The quick brown fox jumps over the lazy dog in the SPARK hash table.",
    "Window functions join tables; <b>bold tags</b> are filtered as tokens.",
    "a tiny doc",
    "",  # empty content
    "Unicode café bytes and   runs\nof whitespace\ttabs.",
    "repeated repeated repeated words words for term frequency checks",
]


def _trec_file_bytes(ids_texts) -> bytes:
    out = []
    for doc_id, text in ids_texts:
        out.append(f"<DOC>\n<DOCNO> {doc_id} </DOCNO>\n{text}\n</DOC>\n")
    return "".join(out).encode("utf-8")


def test_parse_trec_bytes_semantics():
    data = _trec_file_bytes([("FBIS-1", "hello world"), ("FBIS-2", "second doc")])
    ids, contents = parse_trec_bytes(data)
    assert ids == ["FBIS-1", "FBIS-2"]  # whitespace-trimmed (Parser.cs:69)
    # content = everything between </DOCNO> and </DOC> MINUS the byte just
    # before the stop tag (Parser.cs:98 off-by-one, reproduced exactly)
    assert contents[0] == b"\nhello world"
    assert contents[1] == b"\nsecond doc"
    # garbage outside spans is ignored; truncated trailing doc is dropped
    noisy = b"junk" + data + b"<DOC>\n<DOCNO>X</DOCNO>\nno terminator"
    ids2, _ = parse_trec_bytes(noisy)
    assert ids2 == ["FBIS-1", "FBIS-2"]


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    base = tmp_path_factory.mktemp("trec")
    trec_dir = base / "trec"
    trec_dir.mkdir()
    # two TREC files; names chosen so sorted order = doc order
    half = len(TEXTS) // 2
    pairs = [(f"DOC-{i:03d}", t) for i, t in enumerate(TEXTS)]
    (trec_dir / "aa.trec").write_bytes(_trec_file_bytes(pairs[:half]))
    (trec_dir / "bb.trec").write_bytes(_trec_file_bytes(pairs[half:]))

    # the equivalent parquet corpus: SAME payload the TREC parse yields
    # (leading newline kept; trailing newline dropped per Parser.cs:98)
    pq_dir = base / "parquet"
    pq_dir.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_name": pa.array([p[0] for p in pairs]),
                "text": pa.array([f"\n{t}" for _, t in pairs]),
            }
        ),
        str(pq_dir / "part-000000.parquet"),
    )
    return str(trec_dir), str(pq_dir), str(base)


def test_trec_index_matches_parquet_index(corpora, ray_session):
    from search_engine_ray.config import BuildConfig
    from search_engine_ray.engine.build import build_index
    from search_engine_ray.engine.index_reader import IndexReader
    from search_engine_ray.sources import trec_to_parquet

    trec_dir, pq_dir, base = corpora
    conv = os.path.join(base, "converted")
    written = trec_to_parquet(trec_dir, conv)
    assert len(written) == 2
    # resumable: second call rewrites nothing
    mtimes = {p: os.path.getmtime(p) for p in written}
    trec_to_parquet(trec_dir, conv)
    assert {p: os.path.getmtime(p) for p in written} == mtimes

    cfg = BuildConfig()
    idx_trec = os.path.join(base, "idx_trec")
    idx_pq = os.path.join(base, "idx_pq")
    build_index(conv, idx_trec, cfg, source_column="text", name_column="doc_name", overwrite=True)
    build_index(pq_dir, idx_pq, cfg, source_column="text", name_column="doc_name", overwrite=True)

    ra, rb = IndexReader(idx_trec), IndexReader(idx_pq)
    assert ra.doc_names.tolist() == rb.doc_names.tolist()
    assert ra.doc_lens.tolist() == rb.doc_lens.tolist()
    assert set(ra._df) == set(rb._df) and len(ra._df) > 0
    for term in ra._df:
        a, b = ra.postings(term).arrays(), rb.postings(term).arrays()
        for x, y in zip(a, b):
            assert np.array_equal(x, y), term


def test_read_trec_streaming(corpora, ray_session):
    from search_engine_ray.sources import read_trec

    trec_dir, _, _ = corpora
    # row order across parallel read tasks is not promised — sort to compare
    df = read_trec(trec_dir).to_pandas().sort_values("doc_name").reset_index(drop=True)
    assert len(df) == len(TEXTS)
    assert df["doc_name"].tolist() == [f"DOC-{i:03d}" for i in range(len(TEXTS))]
    assert df["text"].tolist() == [f"\n{t}" for t in TEXTS]
