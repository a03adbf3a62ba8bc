"""Terms-table access shared by every reader surface.

The terms table (term -> df, SURVEY §2 A4) has two on-disk layouts:

- ``terms.parquet`` — ONE sorted file.  Written by the driver-side
  finalization branch (fine up to a few million distinct terms) and by
  the maintenance verbs' metadata rewrites.
- ``terms/`` — a DIRECTORY of sorted parquet files, globally ordered by
  term across files.  Written by the distributed finalization branch
  (engine/build.py): at web scale distinct tokens are 10^9+ (round-3
  verdict #7), so the (term, df) aggregate sorts and writes WITHOUT ever
  collecting to the driver; each output file covers a disjoint term
  range, so the lexicon's row-group-pruned probes work unchanged
  (pyarrow.dataset prunes fragments and row groups by min/max stats in
  both layouts).

Every reader goes through :func:`terms_dataset` / :func:`read_terms_table`
so both layouts are equivalent everywhere.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

TERMS_FILE = "terms.parquet"
TERMS_DIR = "terms"


def terms_source(index_dir: str) -> str:
    """Path of the index's terms table (file or directory layout)."""
    f = os.path.join(index_dir, TERMS_FILE)
    if os.path.exists(f):
        return f
    d = os.path.join(index_dir, TERMS_DIR)
    if os.path.isdir(d):
        return d
    raise FileNotFoundError(f"no terms table under {index_dir}")


def terms_dataset(index_dir: str) -> pads.Dataset:
    """pyarrow Dataset over the terms table — works for both layouts;
    fragment (file) paths are enumerated in sorted order so directory
    reads preserve the global term order."""
    src = terms_source(index_dir)
    if os.path.isdir(src):
        files = sorted(
            os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
        )
        return pads.dataset(files)
    return pads.dataset(src)


def finalize_terms(
    postings_dir: str, index_dir: str, driver_max_rows: int = 5_000_000
) -> tuple[int, int]:
    """Write the terms table for ``index_dir`` from postings block
    metadata (term, n) — the shared finalization used by build, compact
    and merge.  Returns (n_terms, n_postings = sum of df).

    Small metadata aggregates driver-side into one sorted terms.parquet;
    above ``driver_max_rows`` block-metadata rows everything stays
    distributed (groupby.sum -> sort -> sorted terms/ directory; counts
    via metadata / a column-pruned distributed sum)."""
    import shutil

    import pyarrow.parquet as pq

    meta_ds = pads.dataset(postings_dir)
    approx_rows = sum(f.count_rows() for f in meta_ds.get_fragments())
    terms_path = os.path.join(index_dir, TERMS_FILE)
    terms_dir = os.path.join(index_dir, TERMS_DIR)
    if approx_rows <= driver_max_rows:
        meta_tbl = meta_ds.to_table(columns=["term", "n"])
        tbl = (
            meta_tbl.group_by("term")
            .aggregate([("n", "sum")])
            .rename_columns(["term", "df"])
            .sort_by("term")
        )
        tbl = tbl.set_column(1, "df", pc.cast(tbl["df"], pa.int64()))
        tmp = terms_path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, terms_path)
        if os.path.isdir(terms_dir):  # stale other-layout leftovers
            shutil.rmtree(terms_dir)
        return int(tbl.num_rows), int(pc.sum(tbl["df"]).as_py() or 0)

    import ray.data

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table({"term": b["term"], "df": pc.cast(b["sum(n)"], pa.int64())})

    tmp_dir = terms_dir + ".tmp"
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    (
        ray.data.read_parquet(postings_dir, columns=["term", "n"])
        .groupby("term")
        .sum("n")
        .map_batches(_rename, batch_format="pyarrow")
        .sort("term")
        .write_parquet(tmp_dir)
    )
    if os.path.isdir(terms_dir):
        shutil.rmtree(terms_dir)
    os.replace(tmp_dir, terms_dir)
    if os.path.exists(terms_path):
        os.remove(terms_path)
    n_terms = sum(f.count_rows() for f in pads.dataset(terms_dir).get_fragments())
    n_postings = int(ray.data.read_parquet(terms_dir, columns=["df"]).sum("df") or 0)
    return n_terms, n_postings


def read_terms_table(index_dir: str, columns: list[str] | None = None) -> pa.Table:
    """The full terms table, globally sorted by term.

    Directory layouts written by ``Dataset.sort("term").write_parquet``
    are sorted across files already; sortedness is verified (one
    vectorized pass) and restored if a foreign writer broke it."""
    tbl = terms_dataset(index_dir).to_table(columns=columns)
    if "term" in tbl.column_names and tbl.num_rows > 1:
        t = tbl["term"]
        if not pc.all(
            pc.less_equal(t.slice(0, len(t) - 1), t.slice(1))
        ).as_py():
            tbl = tbl.sort_by("term")
    return tbl
