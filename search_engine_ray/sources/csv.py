"""CSV corpus ingestion — the other ubiquitous interchange format
(query logs, qrels dumps, metadata sidecars ship as CSV/TSV at least
as often as JSONL).  Mirrors sources/jsonl.py exactly:

- ``read_csv``: a streaming ``ray.data.Dataset`` off CSV file(s)
  (Ray's native reader — pyarrow's block CSV parser, one task per
  file/split) plus the same vectorized column contract: missing
  columns fail loud, extras are dropped, types are cast.
- ``csv_to_parquet``: resumable one-parquet-per-input conversion with
  input-path-hashed output names (the jsonl_to_parquet convention:
  rank-based names would silently mis-map outputs when the input set
  changes between runs) and atomic renames.

Scale shape: embarrassingly parallel over files; convert once, then
every downstream read is column-pruned parquet.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data


def read_csv(
    paths: str | list[str],
    columns: dict[str, pa.DataType] | None = None,
    delimiter: str = ",",
) -> ray.data.Dataset:
    """Stream a Dataset from CSV file(s) or a directory of them.

    ``columns`` maps required column names to arrow types; the
    projection casts to exactly that schema and fails loud on a missing
    column (the read_jsonl contract)."""
    from pyarrow import csv as pacsv

    ds = ray.data.read_csv(
        paths, parse_options=pacsv.ParseOptions(delimiter=delimiter)
    )
    if columns is None:
        return ds
    want = dict(columns)

    def project(batch: pa.Table) -> pa.Table:
        missing = [c for c in want if c not in batch.schema.names]
        if missing:
            raise ValueError(f"read_csv: missing column(s) {missing}")
        return pa.table({c: batch[c].cast(t) for c, t in want.items()})

    return ds.map_batches(project, batch_format="pyarrow")


def write_csv(table: pa.Table, path: str, delimiter: str = ",") -> int:
    """One CSV file from an arrow table (test/fixture helper).  Returns
    rows written."""
    from pyarrow import csv as pacsv

    pacsv.write_csv(
        table,
        path,
        write_options=pacsv.WriteOptions(delimiter=delimiter),
    )
    return table.num_rows


def csv_to_parquet(
    src: str | list[str],
    out_dir: str,
    columns: dict[str, pa.DataType] | None = None,
    delimiter: str = ",",
) -> list[str]:
    """Resumable CSV -> parquet corpus conversion: one output per input,
    input-path-hashed names, skip-if-exists, atomic renames, stale
    outputs from a different input set fail loud.  Returns all output
    paths (skipped or not)."""
    if isinstance(src, str):
        if os.path.isdir(src):
            files = sorted(
                os.path.join(r, f)
                for r, _, fs in os.walk(src)
                for f in fs
                if f.endswith((".csv", ".csv.gz", ".tsv", ".tsv.gz"))
            )
        else:
            files = [src]
    else:
        files = sorted(src)
    if not files:
        raise ValueError(f"csv_to_parquet: no CSV files under {src!r}")
    os.makedirs(out_dir, exist_ok=True)
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
            f"csv_to_parquet: {out_dir} holds outputs from a different "
            f"input set ({sorted(stale)[:3]}…) — use a fresh out_dir per "
            "corpus snapshot"
        )
    todo = [(f, o) for f, o in zip(files, outs) if not os.path.exists(o)]

    @ray.remote
    def convert(in_path: str, out_path: str) -> None:
        import pyarrow.parquet as pq
        from pyarrow import csv as pacsv

        popts = pacsv.ParseOptions(delimiter=delimiter)
        if in_path.endswith(".gz"):
            with pa.CompressedInputStream(
                pa.OSFile(in_path, "rb"), "gzip"
            ) as stream:
                tbl = pacsv.read_csv(stream, parse_options=popts)
        else:
            tbl = pacsv.read_csv(in_path, parse_options=popts)
        if columns is not None:
            missing = [c for c in columns if c not in tbl.schema.names]
            if missing:
                raise ValueError(
                    f"csv_to_parquet: {in_path} missing column(s) {missing}"
                )
            tbl = pa.table({c: tbl[c].cast(t) for c, t in columns.items()})
        tmp = out_path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, out_path)

    ray.get([convert.remote(f, o) for f, o in todo])
    return outs
