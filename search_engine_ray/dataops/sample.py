"""Sampling / selection operators for training-data curation.

All three are single-pass and shuffle-light:

- deterministic_sample : stable id-hash filter — the same rows survive on
  every run and on every cluster size (re-runnable pipelines need
  deterministic sampling, not random_shuffle);
- head_per_key         : balanced per-key subsample (e.g. N docs per
  language/domain) — per-batch partial head bounds the shuffle to at most
  n rows per (key, batch);
- topk_by              : global top-k by a value column — per-batch
  partial top-k then ONE tiny merge, never a full sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

# sampling hash: h(id) = ((id mod P) * A + B) mod M — all intermediates fit
# int64 (P*A < 2^63), so the SAME expression evaluates overflow-free in SQL
_P = 100_003
_A = 2_654_435_761
_B = 12_345
_M = 1_000_000


def sample_hash(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.int64)
    return ((ids % _P) * _A + _B) % _M


def sample_hash_sql(id_expr: str) -> str:
    """The identical hash as a SQL expression (for oracles / pushdown)."""
    return f"((({id_expr}) % {_P}) * {_A} + {_B}) % {_M}"


def deterministic_sample(
    ds: ray.data.Dataset,
    fraction: float,
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """Keep rows whose id-hash falls below fraction — stable across runs,
    partitionings, and cluster sizes.  A pure per-batch filter (no shuffle,
    no RNG state)."""
    threshold = int(round(fraction * _M))

    def keep(batch: pa.Table) -> pa.Table:
        h = sample_hash(np.asarray(batch[id_column], dtype=np.int64))
        return batch.filter(pa.array(h < threshold))

    return ds.map_batches(keep, batch_format="pyarrow")


def head_per_key(
    ds: ray.data.Dataset,
    key_column: str,
    n: int,
    order_column: str = "doc_id",
) -> ray.data.Dataset:
    """First n rows per key, ordered by ``order_column`` ascending (the
    balanced-subsample primitive: N docs per language/domain/source).

    Two-phase: each batch keeps at most its local first-n per key (bounds
    the shuffle to n rows per (key, batch)), then one groupby finishes."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(order_column, kind="stable").groupby(key_column, sort=False).head(n),
            preserve_index=False,
        ).cast(batch.schema)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_column, kind="stable").head(n)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_column)
        .map_groups(finish, batch_format="pandas")
    )


def topk_by(
    ds: ray.data.Dataset,
    value_column: str,
    k: int,
    ascending: bool = False,
    id_column: str = "doc_id",
    fan_in: int = 64,
) -> pa.Table:
    """Global top-k rows by value (ties broken by ascending id — fully
    deterministic).  Per-batch partial top-k, then a two-level tree reduce
    (``fan_in`` intermediate blocks, then one final block) — the driver only
    ever receives the final k rows, NEVER k-per-batch partials and NEVER a
    full distributed sort.  At 10^6 input batches the intermediate level
    holds ~k*batches/fan_in rows per worker block, all inside the object
    store."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = np.asarray(batch[value_column], dtype=np.float64)
        ids = np.asarray(batch[id_column], dtype=np.int64)
        order = np.lexsort((ids, vals if ascending else -vals))[:k]
        return batch.take(pa.array(np.sort(order)))

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # tree reduce: fan_in intermediate merges, then one final merge block.
    # batch_size=None → each repartitioned block is merged as ONE batch, so
    # the final level emits exactly the global top-k.
    reduced = partials.repartition(fan_in).map_batches(
        partial, batch_size=None, batch_format="pyarrow"
    )
    final = reduced.repartition(1).map_batches(
        partial, batch_size=None, batch_format="pyarrow"
    )
    batches = [pa.table(b) for b in final.iter_batches(batch_size=None, batch_format="pyarrow")]
    batches = [b for b in batches if b.num_rows]
    if not batches:
        # typed empty result (the declared pa.Table, not None) with the
        # SAME columns a nonempty result would carry
        sch = ds.schema()
        if sch is not None and sch.names:
            return pa.schema(list(zip(sch.names, sch.types))).empty_table()
        return pa.table(
            {id_column: pa.array([], pa.int64()), value_column: pa.array([], pa.float64())}
        )
    allp = pa.concat_tables(batches)
    # the final level already merged a single block; this last sort is over
    # <= k rows (or <= fan_in*k if Ray split the final block), driver-cheap
    vals = np.asarray(allp[value_column], dtype=np.float64)
    ids = np.asarray(allp[id_column], dtype=np.int64)
    order = np.lexsort((ids, vals if ascending else -vals))[:k]
    return allp.take(pa.array(order))
