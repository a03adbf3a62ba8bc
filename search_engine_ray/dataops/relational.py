"""Relational analytics operators over the TPC-H-shaped side tables.

The reference engine is a fulltext indexer, but an engine curating 100 TB
also carries relational metadata tables (orders/lineitem-shaped logs,
customer/dimension tables).  This module adds the relational wing with
Ray-Data-first shapes:

- **Exact decimal arithmetic.** Money columns arrive as 2-decimal
  doubles; every operator converts ONCE to integer cents via
  ``floor(x*100 + 0.5)`` — the *identical* IEEE-double expression a SQL
  oracle evaluates — and all downstream arithmetic is integer-only.  No
  float summation anywhere, so results are order-, partition- and
  libm-invariant (the round-3 lesson from the LM gates).
- **Overflow-proof sums.** A per-row product like
  ``cents * (100-disc) * (100+tax)`` reaches ~2.3e11, so a plain int64
  sum overflows at ~4e7 rows per group — real at 100 TB.  Checked sums
  are therefore carried as the pair ``(sum(v // 10^6), sum(v % 10^6))``:
  lo < 10^6 and hi < 2.3e5 per row push the overflow horizon past 10^12
  rows per group, and the true sum is recoverable as
  ``hi*10^6 + lo`` in arbitrary precision.  SQL reproduces both columns
  with integer ``//`` and ``%`` — for NON-NEGATIVE values only (numpy
  floors, SQL truncates; ``_split_cols`` enforces the precondition, and
  signed columns like acctbal keep plain int64 sums, whose horizon at
  <=10^6 cents/row is 10^12 rows anyway).
- **Partial aggregation before every shuffle.** Each fact-table pass
  folds per-batch group sums inside ``map_batches`` (``np.add.at`` on
  int64 — never float ``bincount`` weights), so the groupby exchange
  moves n_groups x n_batches rows, not the corpus.
- **Dimension tables broadcast.** ``broadcast_join`` ships the small
  side once per cluster via ``ray.put`` and probes it with a sorted-key
  ``searchsorted`` per batch — no shuffle, no aggregator actors, the
  fact side streams.
- **Fact-fact equi-joins** use the native hash join with the repo's
  post-aggregate ``materialize + repartition`` convention
  (Ray 2.49 emits schema-less empty blocks from aggregates that crash
  a downstream join; see dataops/dedup.py).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .dedup import _join_parts
from .sample import topk_by

_MOD = 1_000_000


def money_cents(col: pa.Array | pa.ChunkedArray | np.ndarray) -> np.ndarray:
    """Exact integer cents from a 2-decimal double column.

    ``floor(x*100 + 0.5)`` in IEEE double: both numpy and a SQL engine
    compute the same multiply, add and floor, so the two sides agree
    bit-for-bit wherever the stored doubles are (near-)2-decimal."""
    x = np.asarray(col, dtype=np.float64)
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


def _group_sum(codes: np.ndarray, n_groups: int, vals: np.ndarray) -> np.ndarray:
    """Int64 per-group sums (``np.bincount`` takes float weights and
    silently rounds above 2^53 — ``np.add.at`` stays integral)."""
    out = np.zeros(n_groups, dtype=np.int64)
    np.add.at(out, codes, vals)
    return out


def _split_cols(name: str, codes: np.ndarray, n_groups: int, vals: np.ndarray) -> dict:
    """The overflow-proof (hi, lo) decomposition of a per-group sum.

    NON-NEGATIVE values only: numpy's ``//``/``%`` floor while SQL's
    truncate, so the two sides disagree on every negative row — callers
    with signed columns (acctbal) must keep plain int64 sums instead."""
    if len(vals) and int(vals.min()) < 0:
        raise ValueError(f"{name}: (hi, lo) split requires non-negative values")
    return {
        f"{name}_hi": pa.array(_group_sum(codes, n_groups, vals // _MOD)),
        f"{name}_lo": pa.array(_group_sum(codes, n_groups, vals % _MOD)),
    }


# --------------------------------------------------------------------------
# grouped decimal aggregate (TPC-H Q1 shape)
# --------------------------------------------------------------------------

_Q1_SUMS = [
    "n_rows",
    "sum_qty",
    "sum_base_hi",
    "sum_base_lo",
    "sum_disc_hi",
    "sum_disc_lo",
    "sum_charge_hi",
    "sum_charge_lo",
    "sum_disc_pct",
]


def pricing_summary(lineitem: ray.data.Dataset, cutoff: str = "1998-09-02") -> pa.Table:
    """Pricing-summary rollup (the TPC-H Q1 shape): per
    (returnflag, linestatus) exact-integer sums of quantity, base price,
    discounted price and charge over rows shipped on or before ``cutoff``.

    Scale shape: one streaming pass; per-batch partials fold ~6 groups x
    n_batches rows through one tiny groupby.  Needs only 7 of lineitem's
    11 columns — read with ``columns=PRICING_SUMMARY_COLUMNS``."""
    from ray.data.aggregate import Sum

    cut = pa.scalar(_dt.datetime.fromisoformat(cutoff), type=pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cut))
        if batch.num_rows == 0:
            cols = {
                "l_returnflag": pa.array([], pa.string()),
                "l_linestatus": pa.array([], pa.string()),
            }
            cols.update({c: pa.array([], pa.int64()) for c in _Q1_SUMS})
            return pa.table(cols)
        key = pc.binary_join_element_wise(
            batch["l_returnflag"], batch["l_linestatus"], "|"
        )
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        denc = key.dictionary_encode()
        codes = np.asarray(denc.indices, dtype=np.int64)
        g = len(denc.dictionary)
        qty = money_cents(batch["l_quantity"]) // 100  # integer-valued qty
        base_c = money_cents(batch["l_extendedprice"])
        disc_pct = money_cents(batch["l_discount"])  # 0..100 integer percent
        tax_pct = money_cents(batch["l_tax"])
        disc_c2 = base_c * (100 - disc_pct)
        charge_c4 = disc_c2 * (100 + tax_pct)
        flags = [s.split("|") for s in denc.dictionary.to_pylist()]
        if any(len(f) != 2 for f in flags):
            raise ValueError(
                "pricing_summary: flag values must not contain '|' "
                f"(got {[f for f in flags if len(f) != 2][:3]})"
            )
        cols = {
            "l_returnflag": pa.array([f[0] for f in flags], pa.string()),
            "l_linestatus": pa.array([f[1] for f in flags], pa.string()),
            "n_rows": pa.array(np.bincount(codes, minlength=g).astype(np.int64)),
            "sum_qty": pa.array(_group_sum(codes, g, qty)),
        }
        cols.update(_split_cols("sum_base", codes, g, base_c))
        cols.update(_split_cols("sum_disc", codes, g, disc_c2))
        cols.update(_split_cols("sum_charge", codes, g, charge_c4))
        cols["sum_disc_pct"] = pa.array(_group_sum(codes, g, disc_pct))
        return pa.table(cols)

    out = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(*[Sum(c, alias_name=c) for c in _Q1_SUMS])
        .sort(["l_returnflag", "l_linestatus"])
        .to_pandas()
    )
    cols = {
        "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
        "l_linestatus": pa.array(out["l_linestatus"], pa.string()),
    }
    for c in _Q1_SUMS:
        cols[c] = pa.array(out[c].astype(np.int64), pa.int64())
    return pa.table(cols)


PRICING_SUMMARY_COLUMNS = [
    "l_returnflag",
    "l_linestatus",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_shipdate",
]


# --------------------------------------------------------------------------
# broadcast hash join (dimension lookup)
# --------------------------------------------------------------------------


def broadcast_join(
    ds: ray.data.Dataset,
    right: pa.Table,
    on: str,
    right_on: str,
    columns: list[str] | None = None,
    how: str = "inner",
) -> ray.data.Dataset:
    """Small-side broadcast hash join: ``right`` (a dimension table with
    UNIQUE integer ``right_on`` keys) is put in the object store ONCE and
    probed per batch with ``np.searchsorted`` over its sorted keys — no
    shuffle, no join actors, zero per-batch re-shipping.  ``how`` is
    ``"inner"`` (drop unmatched probe rows) or ``"left"`` (keep them with
    null payload columns)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    cols = columns if columns is not None else [
        c for c in right.column_names if c != right_on
    ]
    overlap = set(cols) & set(ds.schema().names)
    if overlap:
        raise ValueError(f"payload columns collide with the probe side: {sorted(overlap)}")
    keys_np = np.asarray(right[right_on], dtype=np.int64)
    order = np.argsort(keys_np, kind="stable")
    keys_np = keys_np[order]
    if len(keys_np) > 1 and (keys_np[1:] == keys_np[:-1]).any():
        raise ValueError(f"right_on {right_on!r} keys must be unique")
    payload = right.select(cols).take(pa.array(order))
    ref = ray.put((keys_np, payload.combine_chunks()))

    def probe(batch: pa.Table) -> pa.Table:
        keys, rtbl = ray.get(ref)
        pk = np.asarray(batch[on], dtype=np.int64)
        if len(keys) == 0:
            matched = np.zeros(len(pk), dtype=bool)
            pos = np.zeros(len(pk), dtype=np.int64)
        else:
            pos = np.searchsorted(keys, pk)
            pos = np.minimum(pos, len(keys) - 1)
            matched = keys[pos] == pk
        if how == "inner":
            batch = batch.filter(pa.array(matched))
            idx = pa.array(pos[matched])
        else:
            idx = pa.array(pos, mask=~matched)  # null index -> null value
        for c in rtbl.column_names:
            batch = batch.append_column(c, rtbl[c].take(idx))
        return batch

    return ds.map_batches(probe, batch_format="pyarrow")


def acctbal_per_region(
    ds: ray.data.Dataset,
    nation: pa.Table,
    region: pa.Table,
    nationkey_column: str,
    balance_column: str,
    count_name: str = "n_rows",
) -> pa.Table:
    """Row count + exact account-balance sum per region for ANY fact
    table carrying a nationkey (customer, supplier, ...): the two tiny
    dimension tables are pre-joined driver-side (25 rows) and broadcast
    once; the fact side streams through one partial-aggregated pass
    (5 groups x n_batches rows shuffle)."""
    from ray.data.aggregate import Sum

    dim = nation.join(
        region, keys="n_regionkey", right_keys="r_regionkey", join_type="inner"
    ).select(["n_nationkey", "r_name"])
    enriched = broadcast_join(
        ds, dim, on=nationkey_column, right_on="n_nationkey", columns=["r_name"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "r_name": pa.array([], pa.string()),
                    count_name: pa.array([], pa.int64()),
                    "sum_acctbal_c": pa.array([], pa.int64()),
                }
            )
        key = batch["r_name"]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        denc = key.dictionary_encode()
        codes = np.asarray(denc.indices, dtype=np.int64)
        g = len(denc.dictionary)
        bal_c = money_cents(batch[balance_column])
        return pa.table(
            {
                "r_name": denc.dictionary.cast(pa.string()),
                count_name: pa.array(np.bincount(codes, minlength=g).astype(np.int64)),
                "sum_acctbal_c": pa.array(_group_sum(codes, g, bal_c)),
            }
        )

    out = (
        enriched.map_batches(partial, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(
            Sum(count_name, alias_name=count_name),
            Sum("sum_acctbal_c", alias_name="sum_acctbal_c"),
        )
        .sort("r_name")
        .to_pandas()
    )
    return pa.table(
        {
            "r_name": pa.array(out["r_name"], pa.string()),
            count_name: pa.array(out[count_name].astype(np.int64)),
            "sum_acctbal_c": pa.array(out["sum_acctbal_c"].astype(np.int64)),
        }
    )


def customers_per_region(
    customer: ray.data.Dataset, nation: pa.Table, region: pa.Table
) -> pa.Table:
    """Customer count + exact account-balance sum per region (see
    :func:`acctbal_per_region`)."""
    return acctbal_per_region(
        customer, nation, region, "c_nationkey", "c_acctbal", "n_customers"
    )


def suppliers_per_region(
    supplier: ray.data.Dataset, nation: pa.Table, region: pa.Table
) -> pa.Table:
    """Supplier count + exact account-balance sum per region (see
    :func:`acctbal_per_region`)."""
    return acctbal_per_region(
        supplier, nation, region, "s_nationkey", "s_acctbal", "n_suppliers"
    )


# --------------------------------------------------------------------------
# fact-fact join + grouped top-k (TPC-H Q10 shape)
# --------------------------------------------------------------------------


def _order_revenue_partial(date_col: str | None = None, after=None):
    """Per-batch (l_orderkey -> exact discounted revenue) partial — the
    load-bearing integer cents*pct expression shared by every revenue
    rollup (Q10, Q3).  ``date_col``/``after`` optionally pre-filter to
    rows shipped strictly after the cutoff."""

    def l_partial(batch: pa.Table) -> pa.Table:
        if date_col is not None:
            batch = batch.filter(pc.greater(batch[date_col], after))
        if batch.num_rows == 0:
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "rev_c2": pa.array([], pa.int64()),
                }
            )
        ok = np.asarray(batch["l_orderkey"], dtype=np.int64)
        rev = money_cents(batch["l_extendedprice"]) * (
            100 - money_cents(batch["l_discount"])
        )
        uk, inv = np.unique(ok, return_inverse=True)
        return pa.table(
            {
                "l_orderkey": pa.array(uk),
                "rev_c2": pa.array(_group_sum(inv, len(uk), rev)),
            }
        )

    return l_partial


def top_customers_by_revenue(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    k: int = 20,
    join_partitions: int = 16,
) -> pa.Table:
    """Top-k customers by exact discounted revenue (the TPC-H Q10 shape,
    integer cents x pct so a SQL oracle reproduces it bit-for-bit).

    Scale shape: lineitem folds per-batch (orderkey -> rev) partials
    BEFORE its groupby so the first exchange moves ~one row per
    (order, batch); orders joins via the native hash join (both sides
    fact-scale — no broadcast); the customer rollup ends in the
    tree-reduced ``topk_by`` so the driver only ever holds k rows.
    Customer names/dims for the k winners are a driver-side filtered
    lookup, not a corpus join."""
    from ray.data.aggregate import Sum

    l_partial = _order_revenue_partial()

    order_rev = (
        lineitem.map_batches(l_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rev_c2", alias_name="rev_c2"))
    )
    # post-aggregate join hygiene (see module docstring / dedup.py)
    order_rev = order_rev.materialize()
    n_orders = order_rev.count()
    if n_orders == 0:
        return pa.table(
            {"o_custkey": pa.array([], pa.int64()), "rev_c2": pa.array([], pa.int64())}
        )
    order_rev = order_rev.repartition(max(1, n_orders // 100_000 + 1))
    # partitions sized by the known row count (~16 B/row): tiny inputs pay
    # 2 aggregator actors, 100-TB inputs get the full requested width
    # (the dedup.py join-sizing convention)
    jp = _join_parts(min(join_partitions, (n_orders * 16) // (128 << 20) + 2))
    joined = order_rev.join(
        orders.select_columns(["o_orderkey", "o_custkey"]),
        "inner",
        jp,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def c_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "o_custkey": pa.array([], pa.int64()),
                    "rev_c2": pa.array([], pa.int64()),
                }
            )
        ck = np.asarray(batch["o_custkey"], dtype=np.int64)
        rev = np.asarray(batch["rev_c2"], dtype=np.int64)
        uk, inv = np.unique(ck, return_inverse=True)
        return pa.table(
            {
                "o_custkey": pa.array(uk),
                "rev_c2": pa.array(_group_sum(inv, len(uk), rev)),
            }
        )

    cust_rev = (
        joined.map_batches(c_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("rev_c2", alias_name="rev_c2"))
    )
    # topk_by sorts on float64 — exact here: rev_c2 stays far below 2^53
    # at any plausible per-customer revenue (10^13 cents*pct = $10^9)
    top = topk_by(cust_rev, "rev_c2", k, id_column="o_custkey")
    return pa.table(
        {
            "o_custkey": top["o_custkey"].cast(pa.int64()),
            "rev_c2": top["rev_c2"].cast(pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# calendar rollup
# --------------------------------------------------------------------------


def orders_per_month(orders: ray.data.Dataset) -> pa.Table:
    """Order count + exact total-price sum per calendar month
    (``ym = year*100 + month`` — an integer, so the gate never hashes a
    timestamp).  One partial-aggregated streaming pass; the exchange is
    n_months x n_batches tiny rows.  Needs 2 of orders' 6 columns."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "ym": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                    "sum_total_c": pa.array([], pa.int64()),
                }
            )
        ts = batch["o_orderdate"]
        ym = (
            np.asarray(pc.year(ts), dtype=np.int64) * 100
            + np.asarray(pc.month(ts), dtype=np.int64)
        )
        total_c = money_cents(batch["o_totalprice"])
        uk, inv = np.unique(ym, return_inverse=True)
        return pa.table(
            {
                "ym": pa.array(uk),
                "n_orders": pa.array(np.bincount(inv, minlength=len(uk)).astype(np.int64)),
                "sum_total_c": pa.array(_group_sum(inv, len(uk), total_c)),
            }
        )

    out = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("sum_total_c", alias_name="sum_total_c"),
        )
        .sort("ym")
        .to_pandas()
    )
    return pa.table(
        {
            "ym": pa.array(out["ym"].astype(np.int64)),
            "n_orders": pa.array(out["n_orders"].astype(np.int64)),
            "sum_total_c": pa.array(out["sum_total_c"].astype(np.int64)),
        }
    )


# --------------------------------------------------------------------------
# distributed anti-join
# --------------------------------------------------------------------------


def customers_without_orders(
    customer: ray.data.Dataset,
    orders: ray.data.Dataset,
    since: str | None = None,
    join_partitions: int = 16,
) -> ray.data.Dataset:
    """Customers with no orders (on or after ``since``, when given):
    distinct qualifying custkeys (per-batch unique partials -> one
    groupby, customer-table-sized — NOT broadcast) anti-joined against
    the customer table with the native hash join.  Returns a streaming
    Dataset of (c_custkey, acctbal_c) — the result can itself be
    corpus-scale, so nothing collects on the driver."""
    cut = (
        pa.scalar(_dt.datetime.fromisoformat(since), type=pa.timestamp("us"))
        if since is not None
        else None
    )

    def distinct_partial(batch: pa.Table) -> pa.Table:
        if cut is not None:
            batch = batch.filter(pc.greater_equal(batch["o_orderdate"], cut))
        ck = np.unique(np.asarray(batch["o_custkey"], dtype=np.int64))
        return pa.table({"o_custkey": pa.array(ck)})

    from ray.data.aggregate import Count

    ocols = ["o_custkey"] + (["o_orderdate"] if cut is not None else [])
    okeys = (
        orders.select_columns(ocols)
        .map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["o_custkey"])
    )
    okeys = okeys.materialize()
    n_keys = okeys.count()

    def proj(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": pa.array(np.asarray(batch["c_custkey"], dtype=np.int64)),
                "acctbal_c": pa.array(money_cents(batch["c_acctbal"])),
            }
        )

    cust = customer.select_columns(["c_custkey", "c_acctbal"])
    if n_keys == 0:
        # no qualifying orders -> every customer qualifies; skip the join
        # (an empty post-aggregate dataset feeds the join schema-less
        # blocks and crashes it — Ray 2.49)
        return cust.map_batches(proj, batch_format="pyarrow")
    okeys = okeys.repartition(max(1, n_keys // 100_000 + 1))
    jp = _join_parts(min(join_partitions, (n_keys * 8) // (128 << 20) + 2))
    out = cust.join(
        okeys, "left_anti", jp, on=("c_custkey",), right_on=("o_custkey",)
    )
    return out.map_batches(proj, batch_format="pyarrow")


# --------------------------------------------------------------------------
# exact grouped count-distinct
# --------------------------------------------------------------------------


def count_distinct(ds: ray.data.Dataset, key: str, value: str) -> pa.Table:
    """Exact ``COUNT(DISTINCT value) GROUP BY key`` in two bounded levels:
    per-batch (key, value) dedup (Arrow group_by — any key/value types)
    caps level 1 at batch-row volume, one pair-level groupby finishes the
    global dedup, then per-batch partial counts fold through a tiny
    key-level groupby.  Neither exchange ever exceeds the DISTINCT-pair
    cardinality and no value set is ever collected anywhere — the shape
    HyperLogLog approximates, answered exactly."""
    from ray.data.aggregate import Count, Sum

    def pair_partial(batch: pa.Table) -> pa.Table:
        return batch.select([key, value]).group_by([key, value]).aggregate([])

    pairs = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby([key, value])
        .aggregate(Count(alias_name="_n"))
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.select([key, value]).group_by(key).aggregate([(value, "count")])
        return g.rename_columns([key, "n_distinct"])

    out = (
        pairs.map_batches(count_partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("n_distinct", alias_name="n_distinct"))
        .sort(key)
        .to_pandas()
    )
    return pa.table(
        {
            key: pa.Array.from_pandas(out[key]),
            "n_distinct": pa.array(out["n_distinct"].astype(np.int64), pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# exact grouped second moments (variance sufficient statistics)
# --------------------------------------------------------------------------


def grouped_moments(
    ds: ray.data.Dataset, key: str, value: str
) -> pa.Table:
    """Exact integer sufficient statistics for per-group mean/variance
    over a 2-decimal money column: n, sum of cents, sum of squared cents
    — every checked number an integer, so no float summation order or
    libm can flip a digit.

    Overflow math: cents of 7-digit money are <= ~1e7, squares <= ~1e14;
    the (hi, lo) split (hi = v // 1e6, lo = v %% 1e6, the pricing_summary
    convention) keeps each int64 partial sum safe past 9e12 rows per
    group.  One streaming pass of per-batch partials (dictionary-encoded
    keys, ``np.add.at`` integer folds) through a group-count-sized native
    groupby — the Q1 shape with a second moment.

    Variance itself is a RATIO of these integers; compute it lib-side
    with :func:`variance_from_moments` (exact integer arithmetic until
    the final divide)."""
    from ray.data.aggregate import Sum

    sums = ["n_rows", "sum_c_hi", "sum_c_lo", "sumsq_hi", "sumsq_lo"]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            cols = {key: pa.array([], pa.string())}
            cols.update({c: pa.array([], pa.int64()) for c in sums})
            return pa.table(cols)
        kcol = batch[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        if kcol.null_count:
            raise ValueError(f"grouped_moments: null group keys in {key!r}")
        denc = kcol.dictionary_encode()
        codes = np.asarray(denc.indices, dtype=np.int64)
        g = len(denc.dictionary)
        v = money_cents(batch[value])
        if len(v) and int(v.min()) < 0:
            raise ValueError(
                f"grouped_moments: {value} must be non-negative "
                "(the (hi, lo) split floors; SQL truncates negatives)"
            )
        v2 = v * v
        cols = {
            key: denc.dictionary,
            "n_rows": pa.array(np.bincount(codes, minlength=g).astype(np.int64)),
        }
        cols.update(
            {
                "sum_c_hi": pa.array(_group_sum(codes, g, v // _MOD)),
                "sum_c_lo": pa.array(_group_sum(codes, g, v % _MOD)),
                "sumsq_hi": pa.array(_group_sum(codes, g, v2 // _MOD)),
                "sumsq_lo": pa.array(_group_sum(codes, g, v2 % _MOD)),
            }
        )
        return pa.table(cols)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(*[Sum(c, alias_name=c) for c in sums])
        .sort(key)
        .to_pandas()
    )
    cols = {key: pa.Array.from_pandas(out[key])}
    for c in sums:
        cols[c] = pa.array(out[c].astype(np.int64), pa.int64())
    return pa.table(cols)


def variance_from_moments(moments: pa.Table) -> pa.Table:
    """Per-group mean and population variance (in money units) from
    :func:`grouped_moments` output.  Reassembles the exact integer sum
    and sum-of-squares with arbitrary-precision Python ints, so the only
    rounding is the final float divide."""
    names = [c for c in moments.column_names if not c.endswith(("_hi", "_lo")) and c != "n_rows"]
    key = names[0]
    n = moments["n_rows"].to_pylist()
    s = [
        h * _MOD + l
        for h, l in zip(moments["sum_c_hi"].to_pylist(), moments["sum_c_lo"].to_pylist())
    ]
    s2 = [
        h * _MOD + l
        for h, l in zip(moments["sumsq_hi"].to_pylist(), moments["sumsq_lo"].to_pylist())
    ]
    mean = [si / ni / 100.0 for si, ni in zip(s, n)]
    var = [
        (ni * s2i - si * si) / (ni * ni) / 10000.0
        for si, s2i, ni in zip(s, s2, n)
    ]
    return pa.table(
        {key: moments[key], "mean": pa.array(mean, pa.float64()), "var_pop": pa.array(var, pa.float64())}
    )


# --------------------------------------------------------------------------
# shipping priority (three-way join + filtered grouped revenue + top-k)
# --------------------------------------------------------------------------


def shipping_priority(
    customer: ray.data.Dataset,
    orders: ray.data.Dataset,
    lineitem: ray.data.Dataset,
    segment: str = "HOUSEHOLD",
    cutoff: str = "1995-03-15",
    k: int = 10,
    join_partitions: int = 16,
) -> pa.Table:
    """Top-k unshipped orders by exact discounted revenue for one market
    segment (the TPC-H Q3 shape): customers in ``segment``, orders placed
    before ``cutoff``, revenue from lineitems shipped after it.

    Scale shape: each side is pruned by its predicate BEFORE any
    exchange — lineitem folds per-batch (orderkey -> revenue) partials
    over post-cutoff rows only, orders keeps two columns of pre-cutoff
    rows, customer contributes just the segment's keys.  Both joins are
    native hash joins (every side is fact-scale in TPC-H — nothing is
    broadcast), with the post-aggregate materialize+repartition hygiene,
    and the result ends in the tree-reduced ``topk_by`` so the driver
    holds k rows.  Dates ride as integer ymd = y*10000+m*100+d — no
    timestamp is ever hashed or shuffled."""
    from ray.data.aggregate import Sum

    cut = pa.scalar(_dt.datetime.fromisoformat(cutoff), type=pa.timestamp("us"))

    def c_keys(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["c_mktsegment"], pa.scalar(segment))
        return pa.table(
            {"c_custkey": batch.filter(m)["c_custkey"].cast(pa.int64())}
        )

    def o_proj(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less(batch["o_orderdate"], cut))
        d = batch["o_orderdate"]
        ymd = (
            pc.multiply(pc.year(d).cast(pa.int64()), pa.scalar(10000, pa.int64()))
        )
        ymd = pc.add(ymd, pc.multiply(pc.month(d).cast(pa.int64()), pa.scalar(100, pa.int64())))
        ymd = pc.add(ymd, pc.day(d).cast(pa.int64()))
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].cast(pa.int64()),
                "o_custkey": batch["o_custkey"].cast(pa.int64()),
                "ymd": ymd,
            }
        )

    l_partial = _order_revenue_partial(date_col="l_shipdate", after=cut)

    empty = pa.table(
        {
            "l_orderkey": pa.array([], pa.int64()),
            "rev_c2": pa.array([], pa.int64()),
            "ymd": pa.array([], pa.int64()),
        }
    )
    jp = _join_parts(join_partitions)
    # the segment's key set is customer/segment-sized — materialized so an
    # empty side is caught (an all-empty join input crashes Ray 2.49's
    # hash shuffle) and the join partitions see a stable schema
    seg_keys = customer.map_batches(c_keys, batch_format="pyarrow").materialize()
    if seg_keys.count() == 0:
        return empty
    qual_orders = orders.map_batches(o_proj, batch_format="pyarrow").join(
        seg_keys,
        "inner",
        jp,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    # join outputs carry schema-inconsistent empty blocks (Ray 2.49) that
    # crash a downstream join — same hygiene as after aggregates
    qual_orders = qual_orders.select_columns(["o_orderkey", "ymd"]).materialize()
    n_q = qual_orders.count()
    if n_q == 0:
        return empty
    qual_orders = qual_orders.repartition(max(1, n_q // 100_000 + 1))
    order_rev = (
        lineitem.map_batches(l_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rev_c2", alias_name="rev_c2"))
    )
    # post-aggregate join hygiene (see module docstring / dataops/dedup.py)
    order_rev = order_rev.materialize()
    if order_rev.count() == 0:
        return empty
    joined = order_rev.join(
        qual_orders,
        "inner",
        jp,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    top = topk_by(joined, "rev_c2", k, id_column="l_orderkey")
    # rev_c2 <= ~1e13 per order: exact in topk_by's float64 ordering
    return pa.table(
        {
            "l_orderkey": top["l_orderkey"].cast(pa.int64()),
            "rev_c2": top["rev_c2"].cast(pa.int64()),
            "ymd": top["ymd"].cast(pa.int64()),
        }
    )
