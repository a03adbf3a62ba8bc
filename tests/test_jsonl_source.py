"""JSONL source (sources/jsonl.py): read_jsonl streaming reads,
column-contract enforcement, gzip handling, and the resumable
jsonl_to_parquet conversion."""

import gzip
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from search_engine_ray.sources.jsonl import jsonl_to_parquet, read_jsonl, write_jsonl


@pytest.fixture()
def corpus(tmp_path):
    rows = [
        {"doc_id": i, "text": f"doc {i} body with words", "lang": ["en", "de"][i % 2]}
        for i in range(57)
    ]
    p1 = tmp_path / "a.jsonl"
    write_jsonl(pa.Table.from_pylist(rows[:30]), str(p1))
    p2 = tmp_path / "b.jsonl.gz"
    with gzip.open(p2, "wt", encoding="utf-8") as f:
        for r in rows[30:]:
            f.write(json.dumps(r) + "\n")
    return tmp_path, rows


def test_read_jsonl_roundtrip_and_contract(ray_session, corpus):
    tmp_path, rows = corpus
    cols = {"doc_id": pa.int64(), "text": pa.string(), "lang": pa.string()}
    ds = read_jsonl([str(tmp_path / "a.jsonl"), str(tmp_path / "b.jsonl.gz")], cols)
    got = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    assert got == rows
    with pytest.raises(Exception, match="missing column"):
        read_jsonl(str(tmp_path / "a.jsonl"), {"nope": pa.string()}).take_all()


def test_jsonl_to_parquet_resumable(ray_session, corpus):
    tmp_path, rows = corpus
    out = tmp_path / "pq"
    cols = {"doc_id": pa.int64(), "text": pa.string(), "lang": pa.string()}
    outs = jsonl_to_parquet(str(tmp_path), str(out), cols)
    names = [os.path.basename(o) for o in outs]
    # rank prefix (sorted-input order for docID planning) + path hash
    # (resume safety when the input set changes)
    assert names[0].startswith("part-00000-") and names[1].startswith("part-00001-")
    assert names[0].endswith(".parquet") and len(set(names)) == 2
    back = pa.concat_tables(pq.read_table(o) for o in outs)
    assert sorted(back.to_pylist(), key=lambda r: r["doc_id"]) == rows
    # resume: poison one output, retouch the other — only missing is rebuilt
    m0 = os.path.getmtime(outs[0])
    os.remove(outs[1])
    outs2 = jsonl_to_parquet(str(tmp_path), str(out), cols)
    assert outs2 == outs
    assert os.path.getmtime(outs[0]) == m0  # untouched
    assert pq.read_table(outs[1]).num_rows == 27
    with pytest.raises(ValueError, match="no JSONL files"):
        jsonl_to_parquet(str(tmp_path / "pq"), str(out))  # parquet dir has none


def test_jsonl_to_parquet_rejects_stale_outputs(ray_session, corpus):
    tmp_path, rows = corpus
    out = tmp_path / "pq2"
    cols = {"doc_id": pa.int64(), "text": pa.string(), "lang": pa.string()}
    # adding an input later is SAFE (hash naming keeps the mapping):
    jsonl_to_parquet(str(tmp_path / "a.jsonl"), str(out), cols)
    outs = jsonl_to_parquet(str(tmp_path), str(out), cols)
    assert len(outs) == 2 and all(os.path.exists(o) for o in outs)
    # but a REMOVED input leaves an orphan output: fail loud
    with pytest.raises(ValueError, match="different input set"):
        jsonl_to_parquet(str(tmp_path / "b.jsonl.gz"), str(out), cols)
