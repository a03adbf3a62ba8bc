"""OLAP / event-analytics operators: ordered funnels, ROLLUP
subtotals, and wide pivots over the event and document tables.

Scale shapes
------------
- ``funnel_counts``: one predicate-pruned pass over events PER STEP
  (each pass reads only that step's type), folded to per-user minima by
  per-batch partials before the groupby — the cross-step state is a
  user-cardinality (user, first_ts) table carried through native hash
  joins, never broadcast, never the event log itself.
- ``rollup_counts``: ONE streaming pass.  Each batch folds its finest
  (d1, d2) partial, then derives the coarser levels from that partial
  locally (rows-per-batch = fine groups + d1 groups + 1), so the single
  groupby exchange moves subtotal rows for every level at once — never
  one pass per level.
- ``pivot_counts``: the column domain is asserted bounded (it becomes
  the output schema), then one pass of per-batch (row_key x column)
  count matrices through a groupby-sum over the row key.

All counts are int64; no floats anywhere, so results are exact and
partition/order-invariant.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import _join_parts

ROLLUP_ALL = "ALL"


def funnel_counts(
    events: ray.data.Dataset,
    steps: Sequence[str],
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_us: int | None = None,
    join_partitions: int = 8,
) -> pa.Table:
    """Ordered-funnel user counts: step i counts the users whose first
    qualifying step-i event happens STRICTLY AFTER their first
    qualifying step-(i-1) event — and, with ``within_us``, no more than
    that many microseconds after it (the product-analytics conversion
    window).

    Returns (step, step_name, n_users) with step 1-based.  The per-user
    first-qualifying-time table rolls forward step by step; each step is
    one pruned pass + one partial-aggregated groupby + (after step 1)
    one user-cardinality hash join."""
    if not steps:
        raise ValueError("funnel_counts: steps must be non-empty")
    if within_us is not None and within_us <= 0:
        raise ValueError(f"funnel_counts: within_us must be positive ({within_us})")
    from ray.data.aggregate import Min

    jp = _join_parts(join_partitions)
    counts: list[int] = []
    prev: ray.data.Dataset | None = None  # (key, _t) after each step

    for i, step in enumerate(steps):
        def only_step(batch: pa.Table, _s=step) -> pa.Table:
            batch = batch.filter(pc.equal(batch[type_col], pa.scalar(_s)))
            return pa.table(
                {
                    key: batch[key].cast(pa.int64()),
                    "_ts": batch[ts_col].cast(pa.int64()),
                }
            )

        cur = events.map_batches(only_step, batch_format="pyarrow")
        if prev is not None:
            # the pruned step events must materialize before the join: an
            # all-empty join side crashes Ray 2.49's hash shuffle, and a
            # dead step should short-circuit the remaining passes anyway
            cur = cur.materialize()
            if cur.count() == 0:
                counts.extend([0] * (len(steps) - i))
                break
            cur = cur.join(prev, "inner", jp, on=(key,))

            def after_prev(batch: pa.Table) -> pa.Table:
                ok = pc.greater(batch["_ts"], batch["_t"])
                if within_us is not None:
                    ok = pc.and_(
                        ok,
                        pc.less_equal(
                            batch["_ts"],
                            pc.add(batch["_t"], pa.scalar(within_us, pa.int64())),
                        ),
                    )
                batch = batch.filter(ok)
                return pa.table(
                    {
                        key: batch[key].cast(pa.int64()),
                        "_ts": batch["_ts"].cast(pa.int64()),
                    }
                )

            cur = cur.map_batches(after_prev, batch_format="pyarrow")

        def partial_min(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {key: pa.array([], pa.int64()), "_ts": pa.array([], pa.int64())}
                )
            u = np.asarray(batch[key], dtype=np.int64)
            t = np.asarray(batch["_ts"], dtype=np.int64)
            uk, inv = np.unique(u, return_inverse=True)
            mins = np.full(len(uk), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(mins, inv, t)
            return pa.table({key: pa.array(uk), "_ts": pa.array(mins)})

        cur = (
            cur.map_batches(partial_min, batch_format="pyarrow")
            .groupby(key)
            .aggregate(Min("_ts", alias_name="_t"))
            # post-aggregate hygiene before the next round's join
            .materialize()
        )
        n = cur.count()
        counts.append(n)
        if n == 0:
            counts.extend([0] * (len(steps) - i - 1))
            break
        prev = cur.repartition(max(1, n // 200_000 + 1))

    return pa.table(
        {
            "step": pa.array(np.arange(1, len(steps) + 1, dtype=np.int64)),
            "step_name": pa.array(list(steps), pa.string()),
            "n_users": pa.array(np.asarray(counts, dtype=np.int64)),
        }
    )


def rollup_counts(
    ds: ray.data.Dataset,
    dims: tuple[str, str],
    value_col: str,
) -> pa.Table:
    """``GROUP BY ROLLUP(d1, d2)`` — counts and int64 value sums at
    three levels: (d1, d2), (d1, ALL) and (ALL, ALL), with the literal
    ``'ALL'`` standing in for the rolled-up dimension (fixed-type string
    columns instead of SQL's NULLs).  Fails loud if a dimension value
    collides with the sentinel."""
    from ray.data.aggregate import Sum

    d1, d2 = dims

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                d1: pa.array([], pa.string()),
                d2: pa.array([], pa.string()),
                "n_rows": pa.array([], pa.int64()),
                "sum_val": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        key = pc.binary_join_element_wise(
            batch[d1].cast(pa.string()), batch[d2].cast(pa.string()), "|"
        )
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        denc = key.dictionary_encode()
        codes = np.asarray(denc.indices, dtype=np.int64)
        g = len(denc.dictionary)
        vals = np.asarray(batch[value_col], dtype=np.int64)
        pairs = [s.split("|") for s in denc.dictionary.to_pylist()]
        if any(len(p) != 2 or ROLLUP_ALL in p for p in pairs):
            raise ValueError(
                f"rollup_counts: dimension values must not contain '|' or "
                f"equal {ROLLUP_ALL!r}"
            )
        n_fine = np.bincount(codes, minlength=g).astype(np.int64)
        s_fine = np.zeros(g, dtype=np.int64)
        np.add.at(s_fine, codes, vals)
        a1 = np.asarray([p[0] for p in pairs], dtype=object)
        a2 = np.asarray([p[1] for p in pairs], dtype=object)
        # coarser levels derived from the fine partial (local, tiny)
        u1, inv1 = np.unique(a1.astype(str), return_inverse=True)
        n_mid = np.zeros(len(u1), dtype=np.int64)
        s_mid = np.zeros(len(u1), dtype=np.int64)
        np.add.at(n_mid, inv1, n_fine)
        np.add.at(s_mid, inv1, s_fine)
        out1 = list(a1) + list(u1) + [ROLLUP_ALL]
        out2 = list(a2) + [ROLLUP_ALL] * len(u1) + [ROLLUP_ALL]
        out_n = np.concatenate([n_fine, n_mid, [n_fine.sum()]])
        out_s = np.concatenate([s_fine, s_mid, [s_fine.sum()]])
        return pa.table(
            {
                d1: pa.array([str(x) for x in out1], pa.string()),
                d2: pa.array([str(x) for x in out2], pa.string()),
                "n_rows": pa.array(out_n),
                "sum_val": pa.array(out_s),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([d1, d2])
        .aggregate(
            Sum("n_rows", alias_name="n_rows"), Sum("sum_val", alias_name="sum_val")
        )
        .sort([d1, d2])
        .to_pandas()
    )
    return pa.table(
        {
            d1: pa.array(out[d1], pa.string()),
            d2: pa.array(out[d2], pa.string()),
            "n_rows": pa.array(out["n_rows"].astype(np.int64)),
            "sum_val": pa.array(out["sum_val"].astype(np.int64)),
        }
    )


def pivot_counts(
    ds: ray.data.Dataset,
    row_col: str,
    col_col: str,
    col_values: Sequence[str],
    on_unknown: str = "error",
) -> pa.Table:
    """Wide pivot: one output row per ``row_col`` value, one int64 count
    column per entry of ``col_values`` (the bounded, caller-fixed column
    domain — it becomes the schema, which is why it cannot be
    discovered on the fly).  Values of ``col_col`` outside the domain
    fail loud by default (``on_unknown="error"``) rather than vanish;
    ``on_unknown="ignore"`` counts them nowhere (the SQL CASE-WHEN
    semantics) for callers whose domain is a fixed report schema."""
    from ray.data.aggregate import Sum

    if on_unknown not in ("error", "ignore"):
        raise ValueError(f"pivot_counts: bad on_unknown {on_unknown!r}")
    cols = list(col_values)
    if len(set(cols)) != len(cols) or not cols:
        raise ValueError("pivot_counts: col_values must be non-empty and unique")
    if row_col in cols:
        raise ValueError(
            f"pivot_counts: col_values entry {row_col!r} collides with row_col"
        )
    domain = np.asarray(sorted(cols))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            d = {row_col: pa.array([], pa.string())}
            d.update({c: pa.array([], pa.int64()) for c in cols})
            return pa.table(d)
        rk = batch[row_col].cast(pa.string())
        if isinstance(rk, pa.ChunkedArray):
            rk = rk.combine_chunks()
        denc = rk.dictionary_encode()
        rcodes = np.asarray(denc.indices, dtype=np.int64)
        nr = len(denc.dictionary)
        cv = batch[col_col].cast(pa.string())
        if isinstance(cv, pa.ChunkedArray):
            cv = cv.combine_chunks()
        idx = pc.index_in(cv, value_set=pa.array(domain, pa.string()))
        if idx.null_count:
            if on_unknown == "error":
                missing = pc.unique(cv.filter(pc.is_null(idx))).to_pylist()
                shown = sorted(m for m in missing if m is not None)[:5]
                if any(m is None for m in missing):
                    shown.append("<null>")
                raise ValueError(
                    f"pivot_counts: {col_col} value(s) outside the declared "
                    f"domain: {shown}"
                )
            known = pc.is_valid(idx)
            idx = idx.filter(known)
            rcodes = rcodes[np.asarray(known)]
        ccodes = np.asarray(idx, dtype=np.int64)
        mat = np.zeros((nr, len(domain)), dtype=np.int64)
        np.add.at(mat, (rcodes, ccodes), 1)
        d = {row_col: denc.dictionary.cast(pa.string())}
        for j, c in enumerate(domain):
            d[str(c)] = pa.array(mat[:, j])
        return pa.table(d)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(row_col)
        .aggregate(*[Sum(str(c), alias_name=str(c)) for c in domain])
        .sort(row_col)
        .to_pandas()
    )
    d = {row_col: pa.array(out[row_col], pa.string())}
    for c in domain:
        d[str(c)] = pa.array(out[str(c)].astype(np.int64))
    return pa.table(d)


def transition_counts(
    events: ray.data.Dataset,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    n_buckets: int = 256,
) -> pa.Table:
    """Per-key event transition matrix (the Markov-chain / user-journey
    aggregate): counts of consecutive (from_type, to_type) pairs within
    each key's (ts, id)-ordered stream — ``LAG(type) OVER (PARTITION BY
    key ORDER BY ts, id)`` folded to a types x types table.

    Scale shape: keys hash-bucket (the window_fns shape — one shuffle,
    never a global sort); each bucket is ONE vectorized kernel (lexsort,
    adjacency mask, dictionary-encoded pair bincount) emitting at most
    |types|^2 partial rows; a tiny final groupby sums them."""
    from ray.data.aggregate import Sum

    from .window_fns import _bucket_of

    def proj(batch: pa.Table) -> pa.Table:
        b = _bucket_of(np.asarray(batch[key], dtype=np.int64), n_buckets)
        return pa.table(
            {
                key: batch[key].cast(pa.int64()),
                "_ts": batch[ts_col].cast(pa.int64()),
                "_id": batch[id_col].cast(pa.int64()),
                "_ty": batch[type_col].cast(pa.string()),
                "_bucket": pa.array(b.astype(np.int64)),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "from_type": pa.array([], pa.string()),
                "to_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if group.num_rows < 2:
            return empty
        k = np.asarray(group[key], dtype=np.int64)
        ts = np.asarray(group["_ts"], dtype=np.int64)
        ids = np.asarray(group["_id"], dtype=np.int64)
        ty = group["_ty"]
        if isinstance(ty, pa.ChunkedArray):
            ty = ty.combine_chunks()
        denc = ty.dictionary_encode()
        codes = np.asarray(denc.indices, dtype=np.int64)
        g = len(denc.dictionary)
        perm = np.lexsort((ids, ts, k))
        ks, cs = k[perm], codes[perm]
        adj = ks[:-1] == ks[1:]
        pair = cs[:-1][adj] * g + cs[1:][adj]
        if len(pair) == 0:
            return empty
        up, cnt = np.unique(pair, return_counts=True)
        types = denc.dictionary.to_pylist()
        return pa.table(
            {
                "from_type": pa.array([types[p // g] for p in up], pa.string()),
                "to_type": pa.array([types[p % g] for p in up], pa.string()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    out = (
        events.map_batches(proj, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["from_type", "to_type"])
        .to_pandas()
    )
    return pa.table(
        {
            "from_type": pa.array(out["from_type"], pa.string()),
            "to_type": pa.array(out["to_type"], pa.string()),
            "n": pa.array(out["n"].astype(np.int64)),
        }
    )


def journey_strings(
    events: ray.data.Dataset,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    sep: str = ">",
    n_buckets: int = 256,
) -> ray.data.Dataset:
    """Per-key ordered string aggregation — the SQL ``string_agg(type,
    sep ORDER BY ts, id) GROUP BY key`` shape: each key's full event
    stream folded into one journey string (the sequence-mining /
    prompt-building primitive downstream of transition_counts).

    Scale shape: keys hash-bucket (window_fns — ONE shuffle, never a
    global sort); each bucket finishes in one vectorized kernel: lexsort
    (key, ts, id), a ListArray built straight from the segment offsets,
    and ONE ``pc.binary_join`` over the whole bucket (the chunk.py
    trick) — no Python loop over keys or rows.  The inherent limit is
    per-KEY output size (a key's journey string must fit a worker),
    which is the same bound SQL's string_agg has.  NULL values are
    skipped (string_agg semantics); a key whose values are ALL null is
    absent from the output (SQL would emit (key, NULL) — the one
    documented divergence)."""
    from .window_fns import _bucket_of

    def proj(batch: pa.Table) -> pa.Table:
        # string_agg semantics: NULL values are SKIPPED, never joined
        # (binary_join would otherwise null the whole key's journey).
        # Divergence, documented: a key whose values are ALL null is
        # absent here, where SQL would emit (key, NULL).
        batch = batch.filter(pc.is_valid(batch[type_col]))
        b = _bucket_of(np.asarray(batch[key], dtype=np.int64), n_buckets)
        return pa.table(
            {
                key: batch[key].cast(pa.int64()),
                "_ts": batch[ts_col].cast(pa.int64()),
                "_id": batch[id_col].cast(pa.int64()),
                "_ty": batch[type_col].cast(pa.string()),
                "_bucket": pa.array(b.astype(np.int64)),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    key: pa.array([], pa.int64()),
                    "journey": pa.array([], pa.string()),
                }
            )
        k = np.asarray(group[key], dtype=np.int64)
        ts = np.asarray(group["_ts"], dtype=np.int64)
        ids = np.asarray(group["_id"], dtype=np.int64)
        perm = np.lexsort((ids, ts, k))
        ks = k[perm]
        ty = group["_ty"].combine_chunks() if isinstance(
            group["_ty"], pa.ChunkedArray
        ) else group["_ty"]
        ty = ty.take(pa.array(perm))
        boundary = np.empty(len(ks), dtype=bool)
        boundary[0] = True
        np.not_equal(ks[1:], ks[:-1], out=boundary[1:])
        starts = np.flatnonzero(boundary)
        # int64 LargeList offsets: a bucket can exceed 2^31 values at
        # scale (the chunk.py int32-overflow lesson)
        offsets = np.concatenate([starts, [len(ks)]]).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets), pc.cast(ty, pa.large_string())
        )
        joined = pc.cast(
            pc.binary_join(lists, pa.scalar(sep, pa.large_string())),
            pa.string(),
        )
        return pa.table(
            {
                key: pa.array(ks[starts]),
                "journey": joined,
            }
        )

    return (
        events.map_batches(proj, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
