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
