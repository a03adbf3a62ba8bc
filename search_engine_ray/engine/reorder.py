"""Document-identifier reassignment (the docID assignment problem —
F. Silvestri, "Sorting out the document identifier assignment problem",
ECIR 2007, public): rebuild the index with docIDs assigned by the
lexicographic order of a corpus column.  Web corpora cluster similar
pages under adjacent URLs, so URL-ordered (or content-ordered) docIDs
shrink posting-list delta gaps and therefore the compressed index, while
ranking is untouched — scores never depend on the id assignment (the
`bm25_reordered_top10` gate pins rank-identity by doc NAME against the
same SQL oracle as the naturally-ordered index).

Ray-Data-first shape (the dataops/export.range_partition_export sink
pattern, string-keyed): ONE pass derives an order-compatible int64
prefix key (first 8 bytes, big-endian — if prefix(a) < prefix(b) then
a < b, and equal prefixes always share a bucket), split points come from
exact quantiles of that bounded-cardinality key, each bucket sorts
LOCALLY by the full string inside ``groupby().map_groups`` and writes
its ``part-K.parquet`` — the corpus never funnels through one sorter,
and reading parts in name order IS the global ORDER BY.  The rebuild is
then a plain ``build_index`` over the sorted parts (docID bases follow
file-name order, engine/reader.plan_fragments).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..ioutil import read_parquet_clean
from .build import build_index


def _prefix_key(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """int64 key, monotone in the string order: first 8 bytes big-endian,
    right-shifted one bit to fit the int64 domain (the shift is monotone,
    so order-compatibility survives; collisions merely share a bucket)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    b = pc.fill_null(col.cast(pa.large_binary()), b"")
    offsets = np.frombuffer(b.buffers()[1], dtype=np.int64)[
        b.offset : b.offset + len(b) + 1
    ]
    data = np.frombuffer(b.buffers()[2], dtype=np.uint8)
    starts, lens = offsets[:-1], np.diff(offsets)
    key = np.zeros(len(b), dtype=np.uint64)
    for j in range(8):
        has = lens > j
        byte = np.zeros(len(b), dtype=np.uint64)
        byte[has] = data[starts[has] + j]
        key = (key << np.uint64(8)) | byte
    return (key >> np.uint64(1)).astype(np.int64)


def reorder_corpus(
    corpus_path: str | list[str],
    out_dir: str,
    by: str = "url",
    n_partitions: int = 8,
    tiebreak: str | None = None,
) -> pa.Table:
    """Distributed ORDER BY ``by`` (string column) as a sink: disjoint
    ascending ``part-K.parquet`` ranges, each file sorted inside, so the
    name-ordered concatenation is the globally sorted corpus.  Equal
    ``by`` values always share a bucket; pass ``tiebreak`` (e.g. the doc
    name column) to make their relative order deterministic too.  The
    split-point pass assumes the 8-byte prefix key has far fewer
    distinct values than rows (true for URLs — hosts share prefixes —
    and natural-language text; a pathological all-unique-prefix corpus
    degrades exact_int_quantiles to a distinct-value-sized shuffle, slow
    but still correct).  Returns the per-part manifest (part, n_rows)."""
    import shutil

    import pyarrow.parquet as pq

    from ..dataops.sample import exact_int_quantiles

    if "://" in str(out_dir):
        raise ValueError("out_dir must be a local path")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)  # derived artifact: overwrite, never append
    os.makedirs(out_dir, exist_ok=True)

    ds = read_parquet_clean(corpus_path)

    def with_key(batch: pa.Table) -> pa.Table:
        return batch.append_column("_rk", pa.array(_prefix_key(batch[by])))

    keyed = ds.map_batches(with_key, batch_format="pyarrow")
    qs = tuple(i / n_partitions for i in range(1, n_partitions))
    if qs:
        qt = exact_int_quantiles(keyed, "_rk", qs=qs)
        bounds = (
            np.unique(np.asarray(qt["value"], dtype=np.int64))
            if qt.num_rows
            else np.empty(0, dtype=np.int64)
        )
    else:
        bounds = np.empty(0, dtype=np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch["_rk"], dtype=np.int64)
        part = np.searchsorted(bounds, v, side="right").astype(np.int64)
        return batch.append_column("_part", pa.array(part))

    def write_part(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"part": pa.array([], pa.int64()), "n_rows": pa.array([], pa.int64())}
        )
        if group.num_rows == 0:
            return empty
        part = int(group["_part"][0].as_py())
        keys = [(by, "ascending")] + (
            [(tiebreak, "ascending")] if tiebreak else []
        )
        order = pc.sort_indices(group, sort_keys=keys)
        body = group.drop_columns(["_rk", "_part"]).take(order)
        path = os.path.join(out_dir, f"part-{part:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(body, tmp)
        os.replace(tmp, path)
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "n_rows": pa.array([body.num_rows], pa.int64()),
            }
        )

    manifest = (
        keyed.map_batches(assign, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(write_part, batch_format="pyarrow")
        .to_pandas()
    )
    manifest = manifest.sort_values("part", ignore_index=True)
    return pa.table(
        {
            "part": pa.array(manifest["part"].astype(np.int64)),
            "n_rows": pa.array(manifest["n_rows"].astype(np.int64)),
        }
    )


def dir_bytes(path: str, suffix: str = ".parquet") -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(suffix)
    )


def reorder_index(
    corpus_path: str | list[str],
    index_dir: str,
    config=None,
    by: str = "url",
    source_column: str = "html",
    name_column: str = "url",
    n_partitions: int = 8,
    overwrite: bool = False,
) -> dict:
    """Reassign docIDs by lexicographic ``by`` order and rebuild: sorted
    corpus sink + plain build.  Adds ``reordered_by`` and the compressed
    ``postings_bytes`` to the build stats so callers can compare against
    a naturally-ordered build of the same corpus."""
    sorted_dir = index_dir.rstrip("/") + ".sorted-corpus"
    manifest = reorder_corpus(
        corpus_path,
        sorted_dir,
        by=by,
        n_partitions=n_partitions,
        tiebreak=name_column if name_column != by else None,
    )
    stats = build_index(
        sorted_dir,
        index_dir,
        config,
        source_column=source_column,
        name_column=name_column,
        overwrite=overwrite,
    )
    stats["reordered_by"] = by
    stats["reorder_parts"] = int(manifest.num_rows)
    stats["postings_bytes"] = dir_bytes(os.path.join(index_dir, "postings"))
    return stats
