"""CSV source (sources/csv.py): streaming reads, column contract, TSV
delimiter, gzip, resumable csv_to_parquet conversion."""

import gzip
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from search_engine_ray.sources.csv import csv_to_parquet, read_csv, write_csv


@pytest.fixture()
def corpus(tmp_path):
    rows = [
        {"doc_id": i, "text": f"doc {i} body, with comma", "lang": ["en", "de"][i % 2]}
        for i in range(41)
    ]
    write_csv(pa.Table.from_pylist(rows[:20]), str(tmp_path / "a.csv"))
    raw = pa.Table.from_pylist(rows[20:])
    import io

    from pyarrow import csv as pacsv

    buf = io.BytesIO()
    pacsv.write_csv(raw, buf)
    with gzip.open(tmp_path / "b.csv.gz", "wb") as f:
        f.write(buf.getvalue())
    return tmp_path, rows


def test_read_csv_roundtrip_and_contract(ray_session, corpus):
    tmp_path, rows = corpus
    cols = {"doc_id": pa.int64(), "text": pa.string(), "lang": pa.string()}
    ds = read_csv([str(tmp_path / "a.csv"), str(tmp_path / "b.csv.gz")], cols)
    got = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    assert got == rows
    with pytest.raises(Exception, match="missing column"):
        read_csv(str(tmp_path / "a.csv"), {"nope": pa.string()}).take_all()


def test_read_tsv_delimiter(ray_session, tmp_path):
    tbl = pa.table({"a": pa.array([1, 2], pa.int64()),
                    "b": pa.array(["x,y", "z"], pa.string())})
    write_csv(tbl, str(tmp_path / "t.tsv"), delimiter="\t")
    got = read_csv(str(tmp_path / "t.tsv"),
                   {"a": pa.int64(), "b": pa.string()},
                   delimiter="\t").take_all()
    assert got == [{"a": 1, "b": "x,y"}, {"a": 2, "b": "z"}]


def test_csv_to_parquet_resume(ray_session, corpus):
    tmp_path, rows = corpus
    out = str(tmp_path / "pq")
    cols = {"doc_id": pa.int64(), "text": pa.string(), "lang": pa.string()}
    outs = csv_to_parquet(str(tmp_path), out, cols)
    assert len(outs) == 2 and all(os.path.exists(o) for o in outs)
    total = sum(pq.read_metadata(o).num_rows for o in outs)
    assert total == len(rows)
    # resume: outputs untouched
    mtimes = [os.path.getmtime(o) for o in outs]
    outs2 = csv_to_parquet(str(tmp_path), out, cols)
    assert outs2 == outs and [os.path.getmtime(o) for o in outs] == mtimes
    # ADDING an input is incremental append (a/b outputs reused, c added)
    write_csv(pa.table({"doc_id": pa.array([99], pa.int64()),
                        "text": pa.array(["x"]), "lang": pa.array(["en"])}),
              str(tmp_path / "c.csv"))
    outs3 = csv_to_parquet(str(tmp_path), out, cols)
    assert len(outs3) == 3 and [os.path.getmtime(o) for o in outs] == mtimes
    # REMOVING an input orphans its output -> fail loud
    os.remove(str(tmp_path / "a.csv"))
    with pytest.raises(ValueError, match="different input set"):
        csv_to_parquet(str(tmp_path), out, cols)
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no CSV files"):
        csv_to_parquet(str(empty), out, cols)
