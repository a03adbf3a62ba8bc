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

    # head-by-order is grouped top-k with ascending order — one shared
    # two-phase implementation (see topk_per_key below)
    return topk_per_key(ds, key_column, order_column, n, ascending=True)


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


def exact_int_quantiles(
    ds: ray.data.Dataset,
    column: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> pa.Table:
    """EXACT quantiles of an integer-valued column (discrete percentile,
    ``percentile_disc`` semantics: the smallest value whose cumulative
    count reaches ceil(q * n)).

    Distributed shape: per-batch value-count partials (np.unique) -> ONE
    native groupby sum over the DISTINCT values -> the tiny (value, count)
    histogram on the driver.  Exactness costs one shuffle of
    #distinct-values rows — for the bounded-cardinality columns this is
    meant for (token counts, doc lengths, quality buckets) that is
    thousands of rows at any corpus scale, never the corpus itself.  For
    unbounded/continuous columns use a sketch instead (not implemented —
    approximate answers cannot be oracle-checked)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vals, counts = np.unique(np.asarray(batch[column], dtype=np.int64), return_counts=True)
        return pa.table({"value": pa.array(vals), "cnt": pa.array(counts.astype(np.int64))})

    hist = (
        ds.select_columns([column])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    blocks = [
        pa.table(b) for b in hist.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    if not blocks:
        return pa.table(
            {"q_micros": pa.array([], pa.int64()), "value": pa.array([], pa.int64())}
        )
    t = pa.concat_tables(blocks).sort_by([("value", "ascending")])
    values = np.asarray(t["value"], dtype=np.int64)
    counts = np.asarray(t["cnt"], dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            continue
        target = max(1, int(np.ceil(q * n)))
        idx = int(np.searchsorted(cum, target, side="left"))
        out_q.append(int(round(q * 1_000_000)))
        out_v.append(int(values[min(idx, len(values) - 1)]))
    return pa.table(
        {"q_micros": pa.array(out_q, pa.int64()), "value": pa.array(out_v, pa.int64())}
    )


def grouped_int_quantiles(
    ds: ray.data.Dataset,
    key_column: str,
    column: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> pa.Table:
    """EXACT per-key quantiles of an integer-valued column
    (``percentile_disc`` semantics per group: the smallest value whose
    within-key cumulative count reaches ceil(q * n_key)).

    Same shape as :func:`exact_int_quantiles`, grouped: per-batch
    (key, value) count partials (Arrow group_by) -> ONE native groupby
    sum over the DISTINCT pairs -> the (key, value, count) histogram on
    the driver.  Exactness costs a shuffle of #distinct-pairs rows —
    bounded by key-cardinality x value-cardinality (languages x token
    counts: thousands), never the corpus.  Output sorted by
    (key, q_micros)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select([key_column, column])
            .group_by([key_column, column])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([key_column, "value", "cnt"])

    key_type = ds.schema().base_schema.field(key_column).type
    empty = pa.table(
        {
            key_column: pa.array([], key_type),
            "q_micros": pa.array([], pa.int64()),
            "value": pa.array([], pa.int64()),
        }
    )
    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_column, "value"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    blocks = [
        pa.table(b) for b in hist.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    if not blocks:
        return empty
    t = pa.concat_tables(blocks).sort_by(
        [(key_column, "ascending"), ("value", "ascending")]
    )
    if t.num_rows == 0:
        return empty
    keys = t[key_column].to_pylist()
    values = np.asarray(t["value"], dtype=np.int64)
    counts = np.asarray(t["cnt"], dtype=np.int64)
    out_k: list = []
    out_q: list[int] = []
    out_v: list[int] = []
    i = 0
    while i < len(keys):
        j = i
        while j < len(keys) and keys[j] == keys[i]:
            j += 1
        cum = np.cumsum(counts[i:j])
        n = int(cum[-1])
        for q in qs:
            target = max(1, int(np.ceil(q * n)))
            idx = int(np.searchsorted(cum, target, side="left"))
            out_k.append(keys[i])
            out_q.append(int(round(q * 1_000_000)))
            out_v.append(int(values[i:j][min(idx, j - i - 1)]))
        i = j
    return pa.table(
        {
            key_column: pa.array(out_k, key_type),
            "q_micros": pa.array(out_q, pa.int64()),
            "value": pa.array(out_v, pa.int64()),
        }
    )


def stratified_sample(
    ds: ray.data.Dataset,
    key_column: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """Per-stratum deterministic sampling: keep a different fraction of
    rows per key (e.g. downsample web text to 10% but keep 100% of books).
    The id-hash is the SAME stable hash as ``deterministic_sample``, so the
    kept set is reproducible across runs, partitionings, and cluster
    sizes, and the whole operator is one shuffle-free per-batch filter —
    the per-key thresholds ride into every task as a plain dict (bytes,
    not a broadcast join)."""
    thresholds = {k: int(round(f * _M)) for k, f in fractions.items()}
    default_threshold = int(round(default_fraction * _M))

    def keep(batch: pa.Table) -> pa.Table:
        h = sample_hash(np.asarray(batch[id_column], dtype=np.int64))
        keys = batch[key_column].to_pylist()
        thr = np.fromiter(
            (thresholds.get(k, default_threshold) for k in keys),
            dtype=np.int64,
            count=len(keys),
        )
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def mix_sources(
    ds: ray.data.Dataset,
    parts: dict[str, int],
    key_column: str = "source",
    id_column: str = "doc_id",
) -> tuple[ray.data.Dataset, pa.Table]:
    """Weighted corpus mixing (the Pile/Dolma recipe step): target output
    proportions given as INTEGER parts per source (e.g. web:6, wiki:3,
    books:1), scaled to the largest mix the data supports — the binding
    source is kept (almost) fully, the rest downsample to match.

    All arithmetic is integer so a SQL oracle reproduces the exact kept
    set: ``K = min(n_s // w_s)`` scales the recipe to the data,
    ``thr_s = w_s * K * 10^6 // n_s`` is each source's keep threshold in
    hash micros, and membership is the repo's deterministic id-hash
    (``sample_hash``) — reproducible across runs, partitionings and
    cluster sizes.  Unweighted sources drop.  Returns (sampled Dataset —
    one shuffle-free filter pass — and the integer mixing plan
    (source, n_rows, weight, threshold_micros))."""
    from ray.data.aggregate import Count

    if not parts or any(w < 1 for w in parts.values()):
        raise ValueError("parts must be a non-empty dict of positive integers")
    counts = (
        ds.select_columns([key_column])
        .groupby(key_column)
        .aggregate(Count(alias_name="n_rows"))
        .to_pandas()
    )
    n_by_key = dict(zip(counts[key_column], counts["n_rows"].astype(np.int64)))
    missing = sorted(set(parts) - set(n_by_key))
    if missing:
        raise ValueError(f"mix_sources: no rows for weighted sources {missing}")
    k_scale = min(int(n_by_key[s]) // w for s, w in parts.items())
    if k_scale == 0:
        short = sorted(s for s, w in parts.items() if int(n_by_key[s]) < w)
        raise ValueError(
            f"mix_sources: sources {short} have fewer rows than their weight "
            "— the recipe cannot be satisfied even once (lower the weights)"
        )
    thr = {s: (w * k_scale * _M) // int(n_by_key[s]) for s, w in parts.items()}
    plan = pa.table(
        {
            key_column: pa.array(sorted(parts), pa.string()),
            "n_rows": pa.array([int(n_by_key[s]) for s in sorted(parts)], pa.int64()),
            "weight": pa.array([parts[s] for s in sorted(parts)], pa.int64()),
            "threshold_micros": pa.array([thr[s] for s in sorted(parts)], pa.int64()),
        }
    )

    def keep(batch: pa.Table) -> pa.Table:
        h = sample_hash(np.asarray(batch[id_column], dtype=np.int64))
        keys = batch[key_column].to_pylist()
        t = np.fromiter((thr.get(k, 0) for k in keys), dtype=np.int64, count=len(keys))
        return batch.filter(pa.array(h < t))

    return ds.map_batches(keep, batch_format="pyarrow"), plan


def topk_per_key(
    ds: ray.data.Dataset,
    key_column: str,
    value_column: str,
    k: int,
    ascending: bool = False,
    tie_columns: tuple[str, ...] = (),
    n_buckets: int = 256,
) -> ray.data.Dataset:
    """Grouped top-k: the k rows with the largest (or smallest)
    ``value_column`` within each key — trending items per window, best
    docs per domain, hottest users per cohort.

    Two-phase like head_per_key: each batch keeps at most its local
    top-k per key (bounds the shuffle to k rows per (key, batch) — never
    a global sort), then a KEY-BUCKETED finish: keys hash into
    ``n_buckets`` groups and each group resolves MANY keys in one
    vectorized pandas sort+head — never one Python call per key (a
    per-key map_groups is O(distinct keys) interpreter round-trips,
    which is billions of calls for per-domain/per-doc keys at corpus
    scale).  Ties break by ``tie_columns`` ascending (pass enough
    columns for a total order to make the result deterministic)."""
    by = [value_column, *tie_columns]
    asc = [ascending] + [True] * len(tie_columns)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(by, ascending=asc, kind="stable")
            .groupby(key_column, sort=False)
            .head(k),
            preserve_index=False,
        ).cast(batch.schema).replace_schema_metadata(None)

    def bucket(batch: pa.Table) -> pa.Table:
        from .window_fns import _bucket_of, _bucket_of_strings

        col = batch[key_column]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pa.types.is_integer(col.type):
            b = _bucket_of(np.asarray(col, dtype=np.int64), n_buckets)
        else:
            b = _bucket_of_strings(col, n_buckets)
        return batch.append_column("_bucket", pa.array(b.astype(np.int64)))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.sort_values(by, ascending=asc, kind="stable")
            .groupby(key_column, sort=False)
            .head(k)
        )
        return out.drop(columns=["_bucket"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(finish, batch_format="pandas")
    )


def balance_classes(
    ds: ray.data.Dataset,
    label_column: str = "label",
    id_column: str = "vec_id",
    target: int | None = None,
) -> ray.data.Dataset:
    """Deterministic class balancing: every label ends up with EXACTLY
    ``target`` rows (default: the majority class size).  A row of a
    class with ``c`` rows and 1-based rank ``rn`` (by ascending id)
    appears ``target // c + (1 if rn - 1 < target % c else 0)`` times —
    integer arithmetic only, so the output multiset is a pure function of
    (ids, labels, target): reproducible across runs, partitionings and
    cluster sizes, and exactly SQL-mirrorable.  Minority classes
    oversample (copy_id numbers the repeats); classes larger than
    ``target`` downsample to their ``target`` lowest-id rows.

    Distributed shape: one tiny class-count groupby (class cardinality
    rows), the bucketed row_number window (window_fns), then a stateless
    flat-map expand with the per-class quotas riding along as a plain
    dict.  Output: (id, label, copy_id)."""
    from .window_fns import row_number

    counts_df = ds.groupby(label_column).count().to_pandas()
    if "count()" not in counts_df.columns or not len(counts_df):
        sch = ds.schema().base_schema
        return ray.data.from_arrow(
            pa.table(
                {
                    id_column: pa.array([], sch.field(id_column).type),
                    label_column: pa.array([], sch.field(label_column).type),
                    "copy_id": pa.array([], pa.int64()),
                }
            )
        )
    counts = {
        k: int(c) for k, c in zip(counts_df[label_column], counts_df["count()"])
    }
    tgt = int(target) if target is not None else max(counts.values())
    if tgt < 1:
        raise ValueError(f"target must be >= 1, got {tgt}")
    base = {k: tgt // c for k, c in counts.items()}
    rem = {k: tgt % c for k, c in counts.items()}

    rn = row_number(ds, label_column, [], id_column)

    def expand(batch: pa.Table) -> pa.Table:
        labels = batch[label_column].to_pylist()
        r = np.asarray(batch["row_num"], dtype=np.int64)
        reps = np.fromiter(
            (base[l] + (1 if rr - 1 < rem[l] else 0) for l, rr in zip(labels, r)),
            dtype=np.int64,
            count=len(r),
        )
        idx = np.repeat(np.arange(len(r), dtype=np.int64), reps)
        starts = np.zeros(len(r) + 1, dtype=np.int64)
        np.cumsum(reps, out=starts[1:])
        copy_id = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            starts[:-1], reps
        )
        take = pa.array(idx)
        return pa.table(
            {
                id_column: batch[id_column].take(take),
                label_column: batch[label_column].take(take),
                "copy_id": pa.array(copy_id),
            }
        )

    return rn.map_batches(expand, batch_format="pyarrow")


def select_token_budget(
    ds: "ray.data.Dataset",
    budget: int,
    priority_column: str,
    token_column: str,
    id_column: str = "doc_id",
) -> "ray.data.Dataset":
    """Best-docs-until-the-token-budget selection — the training-mix
    primitive: rows ordered by (priority DESC, id ASC) are kept while
    the INCLUSIVE running token total stays <= budget.  SQL equivalent:
    ``QUALIFY SUM(tokens) OVER (ORDER BY priority DESC, id) <= budget``.

    Shape: ONE distributed range-partitioned sort, then a two-phase
    block prefix-sum (the pack_sequences discipline): pass 1 collects
    one (first-row key, token sum) row per BLOCK to the driver, the
    driver computes exclusive block offsets and broadcasts the
    block-key -> offset map, pass 2 cumsums within blocks and filters.
    The driver only ever holds block-count-sized state; the row data
    moves once (the sort) and is then read twice from the object store.

    Integer tokens + integer priorities keep the cut deterministic under
    any partitioning (ties are impossible: (priority, id) is unique)."""
    import ray

    if budget < 0:
        raise ValueError("budget must be >= 0")
    proj = ds.select_columns([id_column, priority_column, token_column])
    s = proj.sort(
        [priority_column, id_column], descending=[True, False]
    ).materialize()

    def block_total(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "p0": pa.array([], pa.int64()),
                    "i0": pa.array([], pa.int64()),
                    "tot": pa.array([], pa.int64()),
                }
            )
        toks = np.asarray(batch[token_column], dtype=np.int64)
        return pa.table(
            {
                "p0": pa.array([np.int64(np.asarray(batch[priority_column])[0])]),
                "i0": pa.array([np.int64(np.asarray(batch[id_column])[0])]),
                "tot": pa.array([np.int64(toks.sum())]),
            }
        )

    heads = s.map_batches(
        block_total, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if "p0" not in heads.columns:
        # empty input: every block bypassed the UDF (zero-column wart)
        sch0 = proj.schema()
        return ray.data.from_arrow(
            pa.table(
                {n: pa.array([], t) for n, t in zip(sch0.names, sch0.types)}
            )
        )
    # block order == sort order: sort the per-block heads by the same key
    heads = heads.sort_values(
        ["p0", "i0"], ascending=[False, True], ignore_index=True
    )
    offsets = np.concatenate(
        [[0], np.cumsum(heads["tot"].to_numpy(np.int64))[:-1]]
    )
    off_map = {
        (int(p), int(i)): int(o)
        for p, i, o in zip(heads["p0"], heads["i0"], offsets)
    }
    ref = ray.put(off_map)

    def cut(batch: pa.Table, _ref=ref) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        m = ray.get(_ref)
        p = np.asarray(batch[priority_column], dtype=np.int64)
        i = np.asarray(batch[id_column], dtype=np.int64)
        toks = np.asarray(batch[token_column], dtype=np.int64)
        start = m[(int(p[0]), int(i[0]))]
        run = start + np.cumsum(toks)
        keep = run <= budget
        return batch.filter(pa.array(keep))

    out = s.map_batches(cut, batch_format="pyarrow", batch_size=None)
    # the sort emits schema-less empty blocks for empty range partitions
    # (same Ray 2.49 wart as the hash joins) and they bypass the UDF —
    # drop them, and restore a typed empty table when nothing survives
    from ..ioutil import nonempty_blocks

    sch = proj.schema()  # NOT s.schema(): the sort's empty first block
    # can make the sorted dataset report a zero-column schema
    empty = pa.table({n: pa.array([], t) for n, t in zip(sch.names, sch.types)})
    out = nonempty_blocks(out.materialize())
    if out is None:
        return ray.data.from_arrow(empty)
    return out
