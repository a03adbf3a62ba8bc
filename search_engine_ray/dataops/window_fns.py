"""Partition-ordered window functions — the SQL
``f(...) OVER (PARTITION BY key ORDER BY ...)`` shape as a Ray Data
stage: per-key running sums and lag deltas over event/order streams.

Scale shape
-----------
A window function needs every row of a key together and in order —
but it does NOT need a global sort.  Rows hash-bucket by key
(``n_buckets`` groups, one shuffle), and each bucket is finished by ONE
vectorized kernel: a single ``np.lexsort`` over (key, order..., id)
followed by a segmented cumulative pass — never a Python loop over keys
or rows.  At 100 TB, size ``n_buckets`` so a bucket (≈ input/n_buckets)
fits a worker's heap; distinct keys spread uniformly via a Knuth
multiplicative hash.  The inherent limit is per-KEY, not per-bucket: a
single key's rows are sequentially dependent by definition, so one key
with billions of rows is a skew problem no engine can shard further
(SQL engines serialize it on one thread too).

Determinism
-----------
Ordering inside a key is (order_cols..., id_col) ascending — callers
pass an id that makes the order total, so output is independent of
partitioning and batch order (the same contract a SQL
``ORDER BY o, id ROWS UNBOUNDED PRECEDING`` frame gives).  Values are
int64 (callers convert money to cents / timestamps to epoch-us first),
so sums are exact and order-independent.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import ray.data

_KNUTH = np.uint64(0x9E3779B97F4A7C15)


def _bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic bucket per key (all rows of a key share a bucket)."""
    return ((keys.astype(np.uint64) * _KNUTH) >> np.uint64(33)) % np.uint64(n_buckets)


def _bucket_of_strings(col, n_buckets: int) -> np.ndarray:
    """Bucket per STRING key via membership.md5_halves (the repo's one
    content-hash convention: hash the batch's dictionary once, gather
    through codes; nulls hash as "" — they share the empty string's
    BUCKET but stay a distinct GROUP inside it, see per_bucket)."""
    from .membership import md5_halves

    h1, _ = md5_halves(col)
    return h1 % np.uint64(n_buckets)


def _run_kernel(v: np.ndarray, boundary: np.ndarray, fill: int) -> np.ndarray:
    """Segmented cumulative sum: running total restarting at each
    segment start (``boundary[i]`` marks the first row of a key)."""
    cs = np.cumsum(v)
    starts = np.flatnonzero(boundary)
    offs = np.zeros(len(starts), dtype=np.int64)
    if len(starts) > 1:
        offs[1:] = cs[starts[1:] - 1]
    seg = np.cumsum(boundary) - 1
    return cs - offs[seg]


def _lag_kernel(v: np.ndarray, boundary: np.ndarray, fill: int) -> np.ndarray:
    """Segmented delta vs the previous row: ``v - lag(v)`` within the
    key, ``fill`` on each key's first row."""
    out = np.empty_like(v)
    out[1:] = v[1:] - v[:-1]
    out[boundary] = fill
    return out


def _rownum_kernel(v: np.ndarray, boundary: np.ndarray, fill: int) -> np.ndarray:
    """Segmented 1-based row number (``ROW_NUMBER() OVER (...)``):
    position within the key, restarting at each segment start."""
    n = len(v)
    idx = np.arange(1, n + 1, dtype=np.int64)
    starts = np.flatnonzero(boundary)
    seg = np.cumsum(boundary) - 1
    return idx - idx[starts][seg] + 1


def _make_rolling_kernel(window: int):
    """Segmented sliding sum over the trailing ``window`` rows
    (``SUM(v) OVER (... ROWS BETWEEN window-1 PRECEDING AND CURRENT
    ROW)``): the running sum minus itself shifted by ``window``, clamped
    at each segment start."""

    def kernel(v: np.ndarray, boundary: np.ndarray, fill: int) -> np.ndarray:
        run = _run_kernel(v, boundary, fill)
        starts = np.flatnonzero(boundary)
        seg = np.cumsum(boundary) - 1
        pos = np.arange(len(v), dtype=np.int64) - starts[seg]  # 0-based in-segment
        out = run.copy()
        far = pos >= window  # rows with a full window behind them
        idx = np.flatnonzero(far)
        out[idx] -= run[idx - window]
        return out

    return kernel


def _make_tile_kernel(n_tiles: int):
    """Segmented 0-based equi-depth tile: ``((pos_in_key) * n_tiles) //
    key_size`` — the integer-exact NTILE-like bucket (sizes differ by at
    most 1; the formula, not SQL NTILE's remainder-first convention, so
    the oracle states the same expression: ``((rn-1)*T)//cnt``)."""

    def kernel(v: np.ndarray, boundary: np.ndarray, fill: int) -> np.ndarray:
        starts = np.flatnonzero(boundary)
        seg = np.cumsum(boundary) - 1
        sizes = np.diff(np.append(starts, len(v)))
        pos = np.arange(len(v), dtype=np.int64) - starts[seg]
        return (pos * n_tiles) // sizes[seg]

    return kernel


def _windowed(
    ds: ray.data.Dataset,
    key: str,
    order_cols: Sequence[str],
    value_col: str,
    id_col: str,
    kernel: Callable[[np.ndarray, np.ndarray, int], np.ndarray],
    out_name: str,
    fill: int,
    n_buckets: int,
) -> ray.data.Dataset:
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1 (got {n_buckets})")
    cols: list[str] = []
    for c in (id_col, key, *order_cols, value_col):
        if c not in cols:
            cols.append(c)

    def proj(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        kcol = batch[key]
        if pa.types.is_string(kcol.type) or pa.types.is_large_string(kcol.type):
            b = _bucket_of_strings(kcol, n_buckets)
        else:
            b = _bucket_of(np.asarray(kcol, dtype=np.int64), n_buckets)
        return batch.append_column("_bucket", pa.array(b.astype(np.int64)))

    def per_bucket(group: pa.Table) -> pa.Table:
        kcol = group[key]
        string_key = pa.types.is_string(kcol.type) or pa.types.is_large_string(
            kcol.type
        )
        icol = group[id_col]
        string_id = pa.types.is_string(icol.type) or pa.types.is_large_string(
            icol.type
        )
        if group.num_rows == 0:  # keep schema on degenerate groups
            return pa.table(
                {
                    id_col: pa.array([], pa.string() if string_id else pa.int64()),
                    key: pa.array([], pa.string() if string_key else pa.int64()),
                    out_name: pa.array([], pa.int64()),
                }
            )
        if string_key:
            # group equal keys via per-bucket dictionary codes: any total
            # order works — per-row output depends only on WITHIN-key
            # order, so first-occurrence code order stays deterministic
            import pyarrow.compute as pc

            denc = pc.dictionary_encode(
                kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) else kcol
            )
            if isinstance(denc, pa.ChunkedArray):
                denc = denc.combine_chunks()
            # nulls get code -1: their own group, distinct from ""
            k = np.asarray(pc.fill_null(denc.indices, -1), dtype=np.int64)
        else:
            k = np.asarray(kcol, dtype=np.int64)
        # string ids (e.g. urls): numpy lexsorts unicode arrays with plain
        # lexicographic comparison — same order as the SQL ORDER BY
        ids = np.asarray(group[id_col]) if string_id else np.asarray(
            group[id_col], dtype=np.int64
        )
        orders = [np.asarray(group[c]) for c in order_cols]
        # lexsort: LAST key is primary -> (key, order_cols..., id) asc
        perm = np.lexsort((ids, *reversed(orders), k))
        ks = k[perm]
        boundary = np.empty(len(ks), dtype=bool)
        boundary[0] = True
        np.not_equal(ks[1:], ks[:-1], out=boundary[1:])
        vcol = group[value_col]
        if pa.types.is_string(vcol.type) or pa.types.is_large_string(vcol.type):
            if value_col != id_col:
                # a real VALUE column must be numeric — silently zeroing a
                # string money/count column would corrupt running sums
                raise TypeError(
                    f"window value column {value_col!r} is string-typed; "
                    "only position-based kernels (row_number/tile, which "
                    "reuse the id column) accept strings"
                )
            # position-based kernels ignore the values
            v = np.zeros(group.num_rows, dtype=np.int64)
        else:
            v = np.asarray(vcol, dtype=np.int64)[perm]
        key_out = (
            kcol.take(pa.array(perm)) if string_key else pa.array(ks)
        )
        id_out = (
            icol.take(pa.array(perm)) if string_id else pa.array(ids[perm])
        )
        return pa.table(
            {
                id_col: id_out,
                key: key_out,
                out_name: pa.array(kernel(v, boundary, fill)),
            }
        )

    return (
        ds.map_batches(proj, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def running_sum(
    ds: ray.data.Dataset,
    key: str,
    order_cols: Sequence[str],
    value_col: str,
    id_col: str,
    out_name: str = "run",
    n_buckets: int = 256,
) -> ray.data.Dataset:
    """``SUM(value) OVER (PARTITION BY key ORDER BY order_cols..., id
    ROWS UNBOUNDED PRECEDING)`` — per-row cumulative int64 sum within
    each key.  Output: one row per input row with (id, key, out_name)."""
    return _windowed(
        ds, key, order_cols, value_col, id_col, _run_kernel, out_name, 0, n_buckets
    )


def lag_delta(
    ds: ray.data.Dataset,
    key: str,
    order_cols: Sequence[str],
    value_col: str,
    id_col: str,
    out_name: str = "delta",
    fill: int = -1,
    n_buckets: int = 256,
) -> ray.data.Dataset:
    """``value - LAG(value) OVER (PARTITION BY key ORDER BY
    order_cols..., id)`` — per-row delta vs the key's previous row,
    ``fill`` on each key's first row (int64 sentinel instead of NULL so
    the column stays fixed-type).  Output: (id, key, out_name)."""
    return _windowed(
        ds, key, order_cols, value_col, id_col, _lag_kernel, out_name, fill, n_buckets
    )


def row_number(
    ds: ray.data.Dataset,
    key: str,
    order_cols: Sequence[str],
    id_col: str,
    out_name: str = "row_num",
    n_buckets: int = 256,
) -> ray.data.Dataset:
    """``ROW_NUMBER() OVER (PARTITION BY key ORDER BY order_cols...,
    id)`` — 1-based position within the key.  Output: (id, key,
    out_name)."""
    # the kernel ignores values; reuse the id column as a typed stand-in
    return _windowed(
        ds, key, order_cols, id_col, id_col, _rownum_kernel, out_name, 0, n_buckets
    )


def group_tile(
    ds: ray.data.Dataset,
    key: str,
    order_cols: Sequence[str],
    id_col: str,
    n_tiles: int,
    out_name: str = "tile",
    n_buckets: int = 256,
) -> ray.data.Dataset:
    """Equi-depth tile within each key (the CCNet head/middle/tail
    split shape): rows of a key, ordered by (order_cols..., id)
    ascending, land in 0-based tile ``(pos * n_tiles) // key_size`` —
    integer-exact and partition-invariant, equivalent to the SQL
    ``((ROW_NUMBER() OVER w - 1) * n_tiles) // (COUNT(*) OVER
    (PARTITION BY key))``.  Output: (id, key, out_name)."""
    if n_tiles < 1:
        raise ValueError(f"group_tile: n_tiles must be >= 1 (got {n_tiles})")
    return _windowed(
        ds,
        key,
        order_cols,
        id_col,
        id_col,
        _make_tile_kernel(n_tiles),
        out_name,
        0,
        n_buckets,
    )


def rolling_sum(
    ds: ray.data.Dataset,
    key: str,
    order_cols: Sequence[str],
    value_col: str,
    id_col: str,
    window: int,
    out_name: str = "rsum",
    n_buckets: int = 256,
) -> ray.data.Dataset:
    """``SUM(value) OVER (PARTITION BY key ORDER BY order_cols..., id
    ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)`` — trailing
    sliding-window int64 sum (partial windows at each key's start, the
    SQL ROWS-frame semantics).  Output: (id, key, out_name)."""
    if window < 1:
        raise ValueError(f"rolling_sum: window must be >= 1 (got {window})")
    return _windowed(
        ds,
        key,
        order_cols,
        value_col,
        id_col,
        _make_rolling_kernel(window),
        out_name,
        0,
        n_buckets,
    )
