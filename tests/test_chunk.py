"""Document chunking (dataops/chunk.py) vs brute force and DuckDB."""

import re

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.dataops.chunk import chunk_documents

TEXTS = [
    " ".join(f"w{i}" for i in range(23)),  # 23 tokens
    "one two three",  # shorter than a chunk
    "",  # no chunks
    " \v ",  # whitespace-only: no chunks
    "single",
    " ".join(f"t{i}" for i in range(64)),  # several chunks
    "a\vb\fc d",  # pinned class separators
]
DOC_IDS = list(range(10, 10 + len(TEXTS)))


def _brute(chunk_tokens: int, overlap: int):
    step = chunk_tokens - overlap
    rows = []
    for did, t in zip(DOC_IDS, TEXTS):
        toks = [w for w in re.split("[\t\n\x0b\x0c\r ]+", t) if w]
        n = len(toks)
        if n == 0:
            continue
        cid = 0
        s = 0
        while True:
            rows.append(
                (did, cid, s, min(chunk_tokens, n - s), " ".join(toks[s : s + chunk_tokens]))
            )
            cid += 1
            s += step
            if s >= n or s + overlap >= n:
                break
        # brute n_chunks formula check: ceil((n - overlap) / step), min 1
        assert cid == max(1, -(-(n - overlap) // step))
    return rows


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(DOC_IDS, pa.int64()), "text": pa.array(TEXTS)})
    ).repartition(3)


@pytest.mark.parametrize("chunk_tokens,overlap", [(8, 2), (8, 0), (5, 4), (100, 10)])
def test_chunk_documents_vs_brute(docs_ds, ray_session, chunk_tokens, overlap):
    out = (
        chunk_documents(docs_ds, chunk_tokens=chunk_tokens, overlap=overlap)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"], ignore_index=True)
    )
    exp = _brute(chunk_tokens, overlap)
    got = list(
        zip(
            out["doc_id"].astype(int),
            out["chunk_id"].astype(int),
            out["start_token"].astype(int),
            out["n_tokens"].astype(int),
            out["text"],
        )
    )
    assert got == exp


def test_chunk_documents_validates(docs_ds):
    with pytest.raises(ValueError):
        chunk_documents(docs_ds, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(docs_ds, chunk_tokens=8, overlap=8)


def test_chunk_documents_vs_duckdb(docs_ds, ray_session):
    out = (
        chunk_documents(docs_ds, chunk_tokens=8, overlap=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"], ignore_index=True)
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pa.table({"doc_id": pa.array(DOC_IDS, pa.int64()), "text": pa.array(TEXTS)}),
    )
    exp = con.execute(
        r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '[\t\n\x0B\x0C\r ]+'),
                             x -> x <> '') AS t
          FROM documents),
        n AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
        c AS (
          SELECT doc_id, t, n,
                 CAST(g.x AS BIGINT) AS chunk_id, CAST(g.x AS BIGINT) * 6 AS s
          FROM n, UNNEST(generate_series(0, CAST(greatest(1, ceil((n - 2) / 6.0)) AS BIGINT) - 1)) AS g(x))
        SELECT doc_id, chunk_id, s AS start_token,
               CAST(least(8, n - s) AS BIGINT) AS n_tokens,
               array_to_string(t[s + 1 : least(s + 8, n)], ' ') AS text
        FROM c ORDER BY doc_id, chunk_id
        """
    ).fetch_arrow_table()
    assert out["doc_id"].tolist() == exp["doc_id"].to_pylist()
    assert out["chunk_id"].tolist() == exp["chunk_id"].to_pylist()
    assert out["start_token"].tolist() == exp["start_token"].to_pylist()
    assert out["n_tokens"].tolist() == exp["n_tokens"].to_pylist()
    assert out["text"].tolist() == exp["text"].to_pylist()


def _brute_cdc(texts, divisor):
    import hashlib

    rows = []
    for i, txt in enumerate(texts):
        toks = txt.split()
        if not toks:
            continue
        chunk, start, cid = [], 0, 0
        for j, t in enumerate(toks):
            chunk.append(t)
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            if h % divisor == 0:
                rows.append((i, cid, start, len(chunk), " ".join(chunk)))
                cid += 1
                start = j + 1
                chunk = []
        if chunk:
            rows.append((i, cid, start, len(chunk), " ".join(chunk)))
    return rows


def test_cdc_chunks_matches_brute(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from search_engine_ray.dataops.chunk import cdc_chunks

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 60)).tolist())
        for _ in range(30)
    ] + ["", "   ", "single"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    for divisor in (1, 4, 1_000_000_000):
        out = cdc_chunks(ds, divisor=divisor).to_pandas()
        got = sorted(
            (int(r.doc_id), int(r.chunk_id), int(r.start_token),
             int(r.n_tokens), r.text)
            for r in out.itertuples()
        )
        assert got == sorted(_brute_cdc(texts, divisor))
    # divisor=1: every token is its own chunk
    out1 = cdc_chunks(ds, divisor=1).to_pandas()
    assert (out1["n_tokens"] == 1).all()
    # concatenation invariant: chunks rebuild the canonical token stream
    big = cdc_chunks(ds, divisor=4).to_pandas()
    for i, txt in enumerate(texts):
        parts = big[big["doc_id"] == i].sort_values("chunk_id")["text"]
        assert " ".join(parts) == " ".join(txt.split())


def test_cdc_chunks_shift_robustness(ray_session):
    """The CDC property: inserting tokens at the front only reshapes the
    chunks up to the first boundary after the edit — later chunk TEXTS
    are identical (fixed-width chunking would shift every chunk)."""
    import pyarrow as pa
    import ray.data

    from search_engine_ray.dataops.chunk import cdc_chunks

    base = " ".join(f"tok{i}" for i in range(400))
    edited = "inserted words here " + base
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([0, 1], pa.int64()),
             "text": pa.array([base, edited])}
        )
    )
    out = cdc_chunks(ds, divisor=8).to_pandas()
    a = out[out["doc_id"] == 0].sort_values("chunk_id")["text"].tolist()
    b = out[out["doc_id"] == 1].sort_values("chunk_id")["text"].tolist()
    # all base chunks except possibly the first reappear verbatim
    assert set(a[1:]) <= set(b)


def test_cdc_chunks_validation(ray_session):
    import pyarrow as pa
    import ray.data

    from search_engine_ray.dataops.chunk import cdc_chunks

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["x"])})
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cdc_chunks(ds, divisor=0)
