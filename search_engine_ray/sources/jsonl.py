"""JSONL (newline-delimited JSON) corpus ingestion — the de-facto
web-text interchange format (Dolma, The Pile, FineWeb dumps all ship as
one JSON object per line, usually gzipped).

Two surfaces:

- ``read_jsonl``: a streaming ``ray.data.Dataset`` straight off the
  JSONL files (Ray's native ``read_json`` — pyarrow's block JSON parser,
  one task per file/split, transparent ``.gz`` handling by extension),
  followed by a vectorized projection that enforces the caller's column
  contract (missing columns fail loud, extras are dropped, types are
  cast).  Use this to feed any pipeline stage directly from a dump.
- ``jsonl_to_parquet``: resumable conversion into the engine's parquet
  corpus layout, mirroring ``sources/trec.py``: ONE parquet file per
  input file named by the input's rank in sorted order (deterministic
  docID planning downstream), each file an independent task, re-runs
  skip outputs that already exist.

Scale shape: both paths are embarrassingly parallel over files; no
stage ever holds more than one file's batch.  Column pruning happens at
the projection (JSON is row-major — unlike parquet there is nothing to
prune at the read, which is exactly why the convert-to-parquet path
exists for corpora that will be read more than once).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data


def read_jsonl(
    paths: str | list[str],
    columns: dict[str, pa.DataType] | None = None,
) -> ray.data.Dataset:
    """Stream a Dataset from JSONL file(s) or a directory of them.

    ``columns`` maps required column names to their arrow types; the
    projection casts to exactly that schema and fails loud on a missing
    column (a silently-absent metadata field corrupts every downstream
    groupby)."""
    ds = ray.data.read_json(paths)
    if columns is None:
        return ds
    want = dict(columns)

    def project(batch: pa.Table) -> pa.Table:
        missing = [c for c in want if c not in batch.schema.names]
        if missing:
            raise ValueError(f"read_jsonl: missing column(s) {missing}")
        return pa.table({c: batch[c].cast(t) for c, t in want.items()})

    return ds.map_batches(project, batch_format="pyarrow")


def write_jsonl(table: pa.Table, path: str) -> int:
    """One JSONL file from an arrow table (test/fixture helper — real
    exports go through the parquet shard sink).  Returns rows written."""
    cols = table.schema.names
    with open(path, "w", encoding="utf-8") as f:
        for row in table.to_pylist():
            f.write(json.dumps({c: row[c] for c in cols}, ensure_ascii=False))
            f.write("\n")
    return table.num_rows


def jsonl_to_parquet(
    src: str | list[str],
    out_dir: str,
    columns: dict[str, pa.DataType] | None = None,
) -> list[str]:
    """Resumable JSONL -> parquet corpus conversion: one output file per
    input file, named by sorted input rank; existing outputs are
    skipped.  Returns the output paths (all of them, skipped or not)."""
    if isinstance(src, str):
        if os.path.isdir(src):
            files = sorted(
                os.path.join(r, f)
                for r, _, fs in os.walk(src)
                for f in fs
                if f.endswith((".jsonl", ".jsonl.gz", ".json", ".json.gz"))
            )
        else:
            files = [src]
    else:
        files = sorted(src)
    if not files:
        raise ValueError(f"jsonl_to_parquet: no JSONL files under {src!r}")
    os.makedirs(out_dir, exist_ok=True)
    # outputs are named by input-path hash, not rank: if the input set
    # changes between runs, rank-based names would silently map existing
    # outputs to the WRONG inputs (skip-if-exists then drops a file and
    # duplicates another).  The sorted-input rank prefix is kept only so
    # downstream sorted-filename docID planning follows input order.
    # Caveat (documented): removing an input orphans its old output —
    # use one out_dir per corpus snapshot.
    import hashlib

    outs = [
        os.path.join(
            out_dir,
            f"part-{i:05d}-{hashlib.md5(f.encode()).hexdigest()[:10]}.parquet",
        )
        for i, f in enumerate(files)
    ]
    stale = set(os.listdir(out_dir)) - {os.path.basename(o) for o in outs}
    stale = {s for s in stale if s.endswith(".parquet")}
    if stale:
        raise ValueError(
            f"jsonl_to_parquet: {out_dir} holds outputs from a different "
            f"input set ({sorted(stale)[:3]}…) — use a fresh out_dir per "
            "corpus snapshot"
        )
    todo = [(f, o) for f, o in zip(files, outs) if not os.path.exists(o)]

    @ray.remote
    def convert(in_path: str, out_path: str) -> None:
        import pyarrow.json as pj
        import pyarrow.parquet as pq

        if in_path.endswith(".gz"):
            with pa.CompressedInputStream(
                pa.OSFile(in_path, "rb"), "gzip"
            ) as stream:
                tbl = pj.read_json(stream)
        else:
            tbl = pj.read_json(in_path)
        if columns is not None:
            missing = [c for c in columns if c not in tbl.schema.names]
            if missing:
                raise ValueError(
                    f"jsonl_to_parquet: {in_path} missing column(s) {missing}"
                )
            tbl = pa.table({c: tbl[c].cast(t) for c, t in columns.items()})
        tmp = out_path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, out_path)

    ray.get([convert.remote(f, o) for f, o in todo])
    return outs
