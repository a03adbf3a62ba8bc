"""Training-shard export: the sink stage of a curation pipeline.

A trainer wants the curated corpus as N equal-ish shards it can stream
independently; a 100-TB pipeline wants that sink RESUMABLE and
DETERMINISTIC.  ``export_training_shards`` assigns every row
``shard = md5be(id) % n_shards`` — the repo's SQL-reproducible hash kind
(first 8 md5 bytes big-endian, see dataops/dedup.py) over the DECIMAL
string of the id, so a DuckDB oracle recomputes the exact assignment —
and writes one ``shard=K/`` parquet partition directory per shard
(APPEND-mode files; a failed run re-runs idempotently by deleting and
re-writing, and downstream readers open shards independently).  The
returned (shard, n_docs) table is the manifest a driver gate can
value-check.

The hash, not round-robin or input order, is the point: assignment is
independent of partitioning, retries and input file order, so any two
runs over the same rows produce byte-identical shard membership.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data


def shard_of_ids(ids: np.ndarray, n_shards: int) -> np.ndarray:
    """md5be(decimal string of id) % n_shards — matches the SQL
    ``('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 16))::UBIGINT % n``."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(int(i)).encode()).digest()[:8], "big")
            % n_shards
            for i in ids
        ),
        dtype=np.int64,
        count=len(ids),
    )


def export_training_shards(
    ds: ray.data.Dataset,
    out_dir: str,
    n_shards: int = 64,
    id_column: str = "doc_id",
) -> pa.Table:
    """Write ``ds`` as ``out_dir/shard=K/*.parquet`` and return the
    (shard, n_docs) manifest, shard ascending (every shard listed, empty
    ones as 0)."""
    from ray.data.aggregate import Count

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    # the output is a DERIVED artifact: always overwrite — appending next
    # to a partial failed run's files would double-count rows in both the
    # shards and the manifest (the sig_dir convention, dedup.py)
    import os
    import shutil

    if "://" in out_dir:
        raise ValueError(
            "out_dir must be a local path (remote URIs cannot be safely "
            "cleared before the overwrite)"
        )
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)

    def with_shard(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_column], dtype=np.int64)
        return batch.append_column(
            "shard", pa.array(shard_of_ids(ids, n_shards), pa.int64())
        )

    sharded = ds.map_batches(with_shard, batch_format="pyarrow")
    sharded.write_parquet(out_dir, partition_cols=["shard"])
    counts = (
        ray.data.read_parquet(out_dir)
        .groupby("shard")
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas()
    )
    # partition values come back as strings from the directory names
    got = dict(zip(counts["shard"].astype(np.int64), counts["n_docs"].astype(np.int64)))
    return pa.table(
        {
            "shard": pa.array(range(n_shards), pa.int64()),
            "n_docs": pa.array([int(got.get(s, 0)) for s in range(n_shards)], pa.int64()),
        }
    )


def range_partition_export(
    ds: ray.data.Dataset,
    out_dir: str,
    key: str,
    n_partitions: int = 8,
    id_column: str = "doc_id",
    bounds: np.ndarray | None = None,
    drop_key: bool = False,
) -> pa.Table:
    """Range-partitioned SORTED export — the distributed sort as a sink:
    ``part-K.parquet`` files whose key ranges are disjoint and ascending
    (every key in file K is strictly below every key in file K+1), each
    file sorted by (key, id) inside.  Reading the files in name order
    yields the global ``ORDER BY key, id`` — without ever funnelling the
    corpus through one sorter.

    Scale shape: split points are EXACT percentile_disc quantiles of the
    key (``exact_int_quantiles`` — distinct-value-sized shuffle, the
    bounded-cardinality precondition documented there); bucket assignment
    is one searchsorted per batch against the n-1 broadcast boundaries;
    each bucket then sorts locally inside ``groupby().map_groups`` —
    corpus/n_partitions rows per sorter, size ``n_partitions`` so that
    fits a worker.  Equal keys always land in one bucket (ties never
    straddle files).  Returns the (part, n_rows, min/max key and id)
    manifest, counted from what was actually WRITTEN, with the
    disjoint-ascending-range invariant asserted."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from .sample import exact_int_quantiles

    if n_partitions < 1:
        raise ValueError("n_partitions must be >= 1")
    if "://" in out_dir:
        raise ValueError("out_dir must be a local path")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)  # derived artifact: overwrite, never append
    os.makedirs(out_dir, exist_ok=True)

    if bounds is not None:
        # caller-supplied split points: for keys whose distribution is
        # known a priori (e.g. a uniform hash key), skipping the quantile
        # pass avoids exact_int_quantiles' bounded-cardinality
        # precondition — a near-unique key would otherwise shuffle
        # row-sized distinct pairs just to find split points
        bounds = np.unique(np.asarray(bounds, dtype=np.int64))
    else:
        qs = tuple(i / n_partitions for i in range(1, n_partitions))
        qt = exact_int_quantiles(ds, key, qs=qs) if qs else None
        bounds = (
            np.unique(np.asarray(qt["value"], dtype=np.int64))
            if qt is not None and qt.num_rows
            else np.empty(0, dtype=np.int64)
        )

    def assign(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[key], dtype=np.int64)
        b = np.searchsorted(bounds, v, side="right").astype(np.int64)
        return batch.append_column("_part", pa.array(b))

    def write_part(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "part": pa.array([], pa.int64()),
                "n_rows": pa.array([], pa.int64()),
                "min_key": pa.array([], pa.int64()),
                "max_key": pa.array([], pa.int64()),
                "min_id": pa.array([], pa.int64()),
                "max_id": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        part = int(group["_part"][0].as_py())
        k = np.asarray(group[key], dtype=np.int64)
        ids = np.asarray(group[id_column], dtype=np.int64)
        order = np.lexsort((ids, k))
        drops = ["_part", key] if drop_key else ["_part"]
        body = group.drop_columns(drops).take(pa.array(order))
        path = os.path.join(out_dir, f"part-{part:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(body, tmp)
        os.replace(tmp, path)
        read_cols = [id_column] if drop_key else [key, id_column]
        written = pq.read_table(path, columns=read_cols)
        # a dropped key can't be re-read: its stats come from the sorted
        # in-memory array (id/n_rows still verify the WRITTEN file)
        wk = k[order] if drop_key else np.asarray(written[key], dtype=np.int64)
        wi = np.asarray(written[id_column], dtype=np.int64)
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "n_rows": pa.array([written.num_rows], pa.int64()),
                "min_key": pa.array([int(wk.min())], pa.int64()),
                "max_key": pa.array([int(wk.max())], pa.int64()),
                "min_id": pa.array([int(wi.min())], pa.int64()),
                "max_id": pa.array([int(wi.max())], pa.int64()),
            }
        )

    manifest = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(write_part, batch_format="pyarrow")
        .to_pandas()
    )
    manifest = manifest.sort_values("part", ignore_index=True)
    mins = manifest["min_key"].to_numpy(dtype=np.int64)
    maxs = manifest["max_key"].to_numpy(dtype=np.int64)
    if len(mins) > 1 and not (maxs[:-1] < mins[1:]).all():
        raise AssertionError(
            "range_partition_export: partition key ranges overlap — "
            "boundary assignment is broken"
        )
    return pa.table(
        {
            c: pa.array(manifest[c].astype(np.int64))
            for c in ["part", "n_rows", "min_key", "max_key", "min_id", "max_id"]
        }
    )


def plan_compaction(in_dir: str, target_bytes: int) -> list[list[str]]:
    """Deterministic greedy bin-packing of a directory's parquet files
    into consecutive target-sized bins, METADATA-ONLY (file sizes from
    the filesystem, sorted-name order preserved — so compaction never
    reorders rows across files and a re-run plans identically).  A file
    larger than the target gets its own bin; bins are never empty."""
    import os

    if target_bytes < 1:
        raise ValueError("target_bytes must be >= 1")
    files = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(in_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    if not files:
        raise ValueError(f"plan_compaction: no parquet files under {in_dir}")
    bins: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for f in files:
        sz = os.path.getsize(f)
        if cur and cur_bytes + sz > target_bytes:
            bins.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += sz
    if cur:
        bins.append(cur)
    return bins


def compact_parquet_files(
    in_dir: str,
    out_dir: str,
    target_bytes: int = 128 << 20,
    concurrency: int | None = None,
) -> pa.Table:
    """The small-files compactor — the maintenance pass every long-lived
    100 TB parquet lake needs (streaming ingests leave thousands of
    KB-sized files; readers then pay per-file open/plan cost).  Rewrites
    ``in_dir`` as ``out_dir/part-{bin:05d}.parquet``, one file per
    planned bin.

    Scale shape: the plan is metadata-only on the driver; each bin is
    read and rewritten by ONE task (an actor-pool ``map_batches`` over
    the bin list — no shuffle, no row ever moves between bins), so the
    job is embarrassingly parallel and resumable: finished ``part-*``
    files are skipped on re-run, partial writes are invisible (tmp file
    + atomic rename).  Row order is preserved end-to-end (sorted-name
    file order within each bin, bins in name order).

    Returns the manifest (bin, n_files, n_rows) counted from the
    WRITTEN output — verifying the sink, not the plan."""
    import os

    import pyarrow.parquet as pq

    bins = plan_compaction(in_dir, target_bytes)
    os.makedirs(out_dir, exist_ok=True)
    # resume contract (the index-build convention): a re-run must see the
    # SAME plan, else stale part files would silently survive — fail loud
    import hashlib
    import json

    # fingerprint the BIN STRUCTURE (nested) and the target, not just the
    # flat file list: a re-run with a different target_bytes re-bins the
    # same files and must refuse, not silently reuse stale parts
    fp = hashlib.sha256(
        json.dumps(
            [target_bytes, [[[f, os.path.getsize(f)] for f in b] for b in bins]]
        ).encode()
    ).hexdigest()
    fp_path = os.path.join(out_dir, ".plan.sha256")
    if os.path.exists(fp_path):
        with open(fp_path) as fh:
            if fh.read().strip() != fp:
                raise ValueError(
                    f"compact_parquet_files: input layout changed since the "
                    f"previous run into {out_dir} — remove the directory to "
                    "recompact"
                )
    else:
        with open(fp_path, "w") as fh:
            fh.write(fp)

    plan_tbl = pa.table(
        {
            "bin": pa.array(range(len(bins)), pa.int64()),
            "files": pa.array(bins, pa.list_(pa.string())),
        }
    )

    def compact_bin(batch: pa.Table) -> pa.Table:
        out_rows = {"bin": [], "n_files": [], "n_rows": []}
        for b, files in zip(
            batch["bin"].to_pylist(), batch["files"].to_pylist()
        ):
            path = os.path.join(out_dir, f"part-{b:05d}.parquet")
            if not os.path.exists(path):  # resume: skip finished bins
                t = pa.concat_tables(
                    [pq.read_table(f) for f in files], promote_options="default"
                )
                tmp = path + ".tmp"
                pq.write_table(t, tmp)
                os.replace(tmp, path)  # atomic: partial writes invisible
            out_rows["bin"].append(b)
            out_rows["n_files"].append(len(files))
            out_rows["n_rows"].append(pq.read_metadata(path).num_rows)
        return pa.table(
            {
                "bin": pa.array(out_rows["bin"], pa.int64()),
                "n_files": pa.array(out_rows["n_files"], pa.int64()),
                "n_rows": pa.array(out_rows["n_rows"], pa.int64()),
            }
        )

    manifest = (
        ray.data.from_arrow(plan_tbl)
        .map_batches(
            compact_bin,
            batch_format="pyarrow",
            batch_size=1,  # one bin per task -> full parallelism
            concurrency=concurrency,
            num_cpus=1,
        )
        .to_pandas()
        .sort_values("bin", ignore_index=True)
    )
    return pa.table(
        {
            "bin": pa.array(manifest["bin"].astype(np.int64)),
            "n_files": pa.array(manifest["n_files"].astype(np.int64)),
            "n_rows": pa.array(manifest["n_rows"].astype(np.int64)),
        }
    )


def shuffled_export(
    ds: ray.data.Dataset,
    out_dir: str,
    seed: int = 0,
    n_partitions: int = 8,
    id_column: str = "doc_id",
) -> pa.Table:
    """Deterministic global training shuffle as a sink: rows land in
    ``part-K.parquet`` files ordered by a content-derived pseudo-random
    key — reading the files in name order IS the shuffled training
    order, reproducible across runs, partitionings and cluster sizes
    (``random_shuffle`` gives a different order every run and can't be
    resumed; this can, because the order is a pure function of
    (id, seed)).

    The shuffle key is the md5be half of ``"{seed}:{id}"`` — the repo's
    SQL-reproducible hash convention — shifted into non-negative int64
    (key >> 1), then delegated to ``range_partition_export``: exact
    split points, one searchsorted pass, per-bucket local sorts.  Ties
    are broken by id inside the sink, so even a (astronomically
    unlikely) key collision stays deterministic."""
    from .membership import md5_halves

    def with_key(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_column], dtype=np.int64)
        tagged = pa.array([f"{seed}:{i}" for i in ids], pa.string())
        h1, _ = md5_halves(tagged)
        # >> 1: fit uint64 into the sink's int64 key domain, bias-free
        return batch.append_column(
            "_shuffle_key", pa.array((h1 >> np.uint64(1)).astype(np.int64))
        )

    keyed = ds.map_batches(with_key, batch_format="pyarrow")
    # uniform hash key -> uniform split points: no quantile pass (the
    # key is near-unique, so exact_int_quantiles' distinct-pair shuffle
    # would be row-sized — its documented anti-precondition)
    bounds = (np.arange(1, n_partitions, dtype=np.int64) * ((1 << 63) // n_partitions))
    return range_partition_export(
        keyed, out_dir, key="_shuffle_key", n_partitions=n_partitions,
        id_column=id_column, bounds=bounds,
        drop_key=True,  # internal ordering key — never ship it to trainers
    )
