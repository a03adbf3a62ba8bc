"""Deterministic fragment planning + global docID assignment.

The reference statically range-partitions the corpus file list across
threads and rebases per-worker dense docIDs at merge time
(/root/reference/src/Indexing/Indexer.cs:38-56, WriteableIndex.cs:74-79).
Our Ray-native equivalent (SURVEY.md §1.3, §7.4.5): the unit of work is a
Parquet *row group* ("fragment").  Fragments are ordered by (sorted file
path, row-group ordinal); ``doc_id = fragment.base + row_index`` where the
bases are the running sum of row-group row counts read from Parquet
FOOTERS only — a metadata pass, no data I/O, no global sort, no serial
bottleneck (footer reads fan out across a thread pool here; at cluster
scale they fan out as Ray tasks the same way).

This yields DENSE global docIDs that are stable across runs, partition
counts and resumes (the plan is persisted in the build manifest), keeps
posting lists docID-sorted per fragment by construction, and makes the
term-merge a pure ordered concatenation — the streaming analogue of the
reference's merge-offset rebase.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, asdict

import pyarrow.parquet as pq


@dataclass(frozen=True)
class Fragment:
    frag_id: int
    path: str
    row_group: int
    base: int  # first global doc_id in this fragment
    n_rows: int

    def to_dict(self) -> dict:
        return asdict(self)


def list_parquet_files(path: str) -> list[str]:
    """Sorted recursive listing — the deterministic corpus order
    (reference: Directory.GetFiles(..., AllDirectories), Indexer.cs:32)."""
    if os.path.isfile(path):
        return [path]
    out: list[str] = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


def plan_fragments(path: str | list[str], max_workers: int = 16) -> list[Fragment]:
    files = list_parquet_files(path) if isinstance(path, str) else sorted(path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")

    def row_groups(p: str) -> list[int]:
        md = pq.ParquetFile(p).metadata
        return [md.row_group(i).num_rows for i in range(md.num_row_groups)]

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        per_file = list(ex.map(row_groups, files))

    fragments: list[Fragment] = []
    base = 0
    frag_id = 0
    for path_, groups in zip(files, per_file):
        for rg, n in enumerate(groups):
            fragments.append(Fragment(frag_id, path_, rg, base, n))
            base += n
            frag_id += 1
    return fragments


def read_fragment(frag: Fragment, columns: list[str] | None = None):
    """Read one row group (column-pruned) — the only data-plane read.

    Schema metadata is stripped: pandas-written parquet carries a metadata
    dict that makes the pa.Schema unhashable, defeating Ray's block-schema
    dedup downstream (see ioutil.read_parquet_clean)."""
    tbl = pq.ParquetFile(frag.path).read_row_group(frag.row_group, columns=columns)
    return tbl.replace_schema_metadata(None)
