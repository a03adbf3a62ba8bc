"""Table profiling — the data-quality pass a 100 TB ingest runs before
anything else: per-column row count, null count, min/max, exact
distinct count, in two bounded passes.

pass 1: ONE fused ``Dataset.aggregate`` computes Count + per-column
    Sum(null flag) + Min + Max in a single scan (Ray Data folds all
    requested aggregates into one pass); min/max run on the NATIVE
    type (string "10" < "9" would corrupt numeric ranges) and render
    to string only at the end.
pass 2: per-batch DISTINCT (column, value-as-string) pairs — each
    batch contributes each of its distinct values once, so the ONLY
    exchange is bounded by sum-of-per-column-cardinalities, never row
    count (the count_distinct two-level shape, fused across columns).

Everything is exact and deterministic; a SQL oracle (per-column
UNION ALL of COUNT / COUNT(DISTINCT) / CAST(MIN..) aggregates)
reproduces the profile bit-for-bit on int64/string columns.  Float
columns profile too (min/max rendered via repr) but stay out of SQL
gates — CAST(DOUBLE AS VARCHAR) formatting is engine-specific.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _render(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def profile_table(ds: ray.data.Dataset, columns: list[str]) -> pa.Table:
    """Profile ``columns`` -> (col, n, n_null, n_distinct, min_str,
    max_str), ascending by column name.  NULLs are excluded from
    distinct/min/max (the SQL aggregate convention); an all-null column
    yields n_distinct 0 and null min/max strings."""
    from ray.data.aggregate import Count, Max, Min, Sum

    if not columns:
        raise ValueError("profile_table: columns must be non-empty")
    cols = sorted(set(columns))
    if len(cols) != len(columns):
        raise ValueError("profile_table: duplicate column names")

    def with_null_flags(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        for c in cols:
            batch = batch.append_column(
                f"__null_{c}",
                pc.cast(pc.is_null(batch[c]), pa.int64()),
            )
        return batch

    aggs = [Count()]
    for c in cols:
        aggs += [
            Sum(f"__null_{c}", alias_name=f"nn_{c}"),
            Min(c, alias_name=f"min_{c}"),
            Max(c, alias_name=f"max_{c}"),
        ]
    stats = ds.map_batches(with_null_flags, batch_format="pyarrow").aggregate(*aggs)

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        outc, outv = [], []
        for c in cols:
            col = batch[c]
            if not (
                pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
            ):
                col = pc.cast(col, pa.string())
            u = pc.unique(pc.drop_null(col))
            outc.append(np.full(len(u), c, dtype=object))
            outv.append(u.to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "col": pa.array(np.concatenate(outc), pa.string()),
                "value": pa.array(np.concatenate(outv), pa.string()),
            }
        )

    # the count_distinct two-level shape (relational.py), fused across
    # columns: global pair dedup, then per-batch partial counts + sum
    pairs = (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby(["col", "value"])
        .aggregate(Count(alias_name="_n"))
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["col", "value"]).group_by("col").aggregate(
            [("value", "count")]
        )
        # select by NAME: pyarrow's key/aggregate column order is
        # version-dependent — a positional rename would silently swap
        return g.select(["col", "value_count"]).rename_columns(
            ["col", "n_distinct"]
        )

    nd = (
        pairs.map_batches(count_partial, batch_format="pyarrow")
        .groupby("col")
        .aggregate(Sum("n_distinct", alias_name="n_distinct"))
        .to_pandas()
    )
    nd_map = dict(zip(nd["col"], nd["n_distinct"].astype(np.int64)))

    if stats is None:  # empty dataset: Ray aggregate yields no row
        stats = {"count()": 0}
        for c in cols:
            stats.update({f"nn_{c}": 0, f"min_{c}": None, f"max_{c}": None})
    n = int(stats["count()"] or 0)
    return pa.table(
        {
            "col": pa.array(cols, pa.string()),
            "n": pa.array([n] * len(cols), pa.int64()),
            "n_null": pa.array(
                [int(stats[f"nn_{c}"] or 0) for c in cols], pa.int64()
            ),
            "n_distinct": pa.array(
                [int(nd_map.get(c, 0)) for c in cols], pa.int64()
            ),
            "min_str": pa.array([_render(stats[f"min_{c}"]) for c in cols], pa.string()),
            "max_str": pa.array([_render(stats[f"max_{c}"]) for c in cols], pa.string()),
        }
    )
