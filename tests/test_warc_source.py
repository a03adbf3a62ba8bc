"""WARC source (sources/warc.py): roundtrip vs the deterministic pages
corpus, record-type filtering, gzip members, resume/invalidation guard."""

import gzip
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.corpus.pages import write_pages_parquet
from search_engine_ray.sources.warc import (
    parse_warc_bytes,
    read_warc,
    warc_to_parquet,
    write_warc,
)


@pytest.fixture(scope="module")
def pages_tbl(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc-pages")
    write_pages_parquet(str(d / "corpus"), 60, seed=11, n_files=1)
    files = sorted(
        f for f in os.listdir(d / "corpus") if f.endswith(".parquet")
    )
    return pq.read_table(
        str(d / "corpus" / files[0]), columns=["url", "warc_ts", "html"]
    )


def test_roundtrip_plain_and_gz(pages_tbl, tmp_path, ray_session):
    a, b = pages_tbl.slice(0, 30), pages_tbl.slice(30)
    p1 = str(tmp_path / "a.warc")
    p2 = str(tmp_path / "b.warc.gz")
    assert write_warc(a, p1) == 30
    assert write_warc(b, p2, compress=True) == 30

    got = (
        read_warc([p1, p2])
        .to_pandas()
        .sort_values("url", ignore_index=True)
    )
    want = pages_tbl.to_pandas().sort_values("url", ignore_index=True)
    assert got["url"].tolist() == want["url"].tolist()
    assert (got["warc_ts"] == want["warc_ts"]).all()
    assert [bytes(x) for x in got["html"]] == [bytes(x) for x in want["html"]]


def test_non_response_records_skipped(tmp_path):
    body = b"<html>ok</html>"
    http = (
        b"HTTP/1.1 200 OK\r\n\r\n" + body
    )
    rec_resp = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: http://x.com/\r\n"
        "WARC-Date: 2020-01-02T03:04:05Z\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode() + http + b"\r\n\r\n"
    rec_req = (
        "WARC/1.0\r\nWARC-Type: request\r\n"
        "WARC-Target-URI: http://x.com/\r\n"
        "WARC-Date: 2020-01-02T03:04:05Z\r\n"
        "Content-Length: 4\r\n\r\n"
    ).encode() + b"GET " + b"\r\n\r\n"
    rec_info = (
        "WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        "WARC-Date: 2020-01-02T03:04:05Z\r\n"
        "Content-Length: 2\r\n\r\n"
    ).encode() + b"ok" + b"\r\n\r\n"
    # identity payload (no HTTP envelope) is taken whole; malformed date
    # is skipped, not fatal
    rec_identity = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: http://y.com/\r\n"
        "WARC-Date: 2021-06-07T08:09:10.500000Z\r\n"
        "Content-Length: 5\r\n\r\n"
    ).encode() + b"plain" + b"\r\n\r\n"
    rec_bad_date = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: http://z.com/\r\n"
        "WARC-Date: not-a-date\r\nContent-Length: 2\r\n\r\n"
    ).encode() + b"xx" + b"\r\n\r\n"

    urls, tss, htmls = parse_warc_bytes(
        rec_info + rec_req + rec_resp + rec_identity + rec_bad_date
    )
    assert urls == ["http://x.com/", "http://y.com/"]
    assert htmls == [body, b"plain"]
    # fractional-second WARC-Date parses (WARC 1.1)
    assert tss[1] % 1_000_000 == 500_000


def test_cli_index_format_warc_matches_parquet(pages_tbl, tmp_path, ray_session):
    """`index --format warc` builds the SAME index as the parquet path:
    the conversion preserves (url, warc_ts, html) exactly, so postings,
    df, and doc tables must be bit-identical."""
    import json

    import pyarrow.parquet as pq_  # noqa: F401

    from search_engine_ray.cli import main
    from search_engine_ray.engine.index_reader import IndexReader

    src = tmp_path / "in"
    write_warc(pages_tbl.slice(0, 30), str(src / "f1.warc"))
    write_warc(pages_tbl.slice(30, 30), str(src / "f2.warc.gz"), compress=True)

    idx_warc = str(tmp_path / "idx_warc")
    assert main(["index", str(src), idx_warc, "--format", "warc",
                 "--overwrite"]) == 0

    # parquet-path twin over the same 60 pages (url order == file order
    # because write_pages_parquet emits urls in sorted order)
    pdir = tmp_path / "pq"
    pdir.mkdir()
    pq.write_table(pages_tbl, str(pdir / "part-000000.parquet"))
    idx_pq = str(tmp_path / "idx_pq")
    assert main(["index", str(pdir), idx_pq, "--overwrite"]) == 0

    ra, rb = IndexReader(idx_warc), IndexReader(idx_pq)
    assert ra.stats["n_docs"] == rb.stats["n_docs"] == 60
    assert ra.stats["n_terms"] == rb.stats["n_terms"]
    assert sorted(ra._df.items()) == sorted(rb._df.items())
    for term in list(ra._df)[:25]:
        pa_, pb_ = ra.postings(term), rb.postings(term)
        ia, ta, _ = pa_.arrays()
        ib, tb, _ = pb_.arrays()
        assert ia.tolist() == ib.tolist() and ta.tolist() == tb.tolist()


def test_warc_to_parquet_resume_and_invalidate(pages_tbl, tmp_path, ray_session):
    src = tmp_path / "in"
    out = tmp_path / "out"
    write_warc(pages_tbl.slice(0, 20), str(src / "f1.warc"))
    write_warc(pages_tbl.slice(20, 20), str(src / "f2.warc"))
    paths = warc_to_parquet(str(src), str(out))
    assert len(paths) == 2
    got = pa.concat_tables([pq.read_table(p) for p in paths])
    assert got.num_rows == 40
    assert got.column_names == ["url", "warc_ts", "html"]
    assert got["url"].to_pylist() == pages_tbl["url"].to_pylist()[:40]

    # resume: unchanged inputs are skipped (mtimes preserved)
    m1 = {p: os.path.getmtime(p) for p in paths}
    paths2 = warc_to_parquet(str(src), str(out))
    assert paths2 == paths
    assert {p: os.path.getmtime(p) for p in paths2} == m1

    # invalidation: a new input that sorts first shifts ranks -> rebuild
    write_warc(pages_tbl.slice(40, 10), str(src / "a0.warc"))
    paths3 = warc_to_parquet(str(src), str(out))
    assert len(paths3) == 3
    first = pq.read_table(paths3[0])
    assert first["url"].to_pylist() == pages_tbl["url"].to_pylist()[40:50]
