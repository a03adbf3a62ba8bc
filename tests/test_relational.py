"""Relational wing (dataops/relational.py) vs DuckDB on synthetic tables."""

import datetime as dt

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.dataops.relational import (
    broadcast_join,
    count_distinct,
    customers_per_region,
    customers_without_orders,
    money_cents,
    orders_per_month,
    pricing_summary,
    top_customers_by_revenue,
)

RNG = np.random.default_rng(421)
N_LINE = 4000
N_ORDERS = 900
N_CUST = 120


def _ts(days: np.ndarray) -> pa.Array:
    base = dt.datetime(1995, 1, 1)
    return pa.array(
        [base + dt.timedelta(days=int(d)) for d in days], pa.timestamp("us")
    )


@pytest.fixture(scope="module")
def tables():
    li = pa.table(
        {
            "l_orderkey": pa.array(RNG.integers(1, N_ORDERS + 1, N_LINE), pa.int64()),
            "l_quantity": pa.array(RNG.integers(1, 51, N_LINE).astype(np.float64)),
            "l_extendedprice": pa.array(
                np.round(RNG.uniform(900, 105000, N_LINE), 2)
            ),
            "l_discount": pa.array(RNG.integers(0, 11, N_LINE) / 100.0),
            "l_tax": pa.array(RNG.integers(0, 9, N_LINE) / 100.0),
            "l_returnflag": pa.array(RNG.choice(["A", "N", "R"], N_LINE)),
            "l_linestatus": pa.array(RNG.choice(["F", "O"], N_LINE)),
            "l_shipdate": _ts(RNG.integers(0, 2400, N_LINE)),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(1, N_ORDERS + 1), pa.int64()),
            "o_custkey": pa.array(
                RNG.integers(1, N_CUST + 1, N_ORDERS), pa.int64()
            ),
            "o_totalprice": pa.array(np.round(RNG.uniform(1000, 500000, N_ORDERS), 2)),
            "o_orderdate": _ts(RNG.integers(0, 2400, N_ORDERS)),
        }
    )
    customer = pa.table(
        {
            # keys 1..150: 30 customers (121..150) have no orders
            "c_custkey": pa.array(np.arange(1, 151), pa.int64()),
            "c_nationkey": pa.array(RNG.integers(0, 5, 150).astype(np.int32)),
            "c_acctbal": pa.array(np.round(RNG.uniform(-999, 9999, 150), 2)),
        }
    )
    nation = pa.table(
        {
            "n_nationkey": pa.array(np.arange(5, dtype=np.int32)),
            "n_name": pa.array([f"NATION{i}" for i in range(5)]),
            "n_regionkey": pa.array(np.array([0, 0, 1, 1, 2], dtype=np.int32)),
        }
    )
    region = pa.table(
        {
            "r_regionkey": pa.array(np.arange(3, dtype=np.int32)),
            "r_name": pa.array(["AFRICA", "ASIA", "EUROPE"]),
        }
    )
    supplier = pa.table(
        {
            "s_suppkey": pa.array(np.arange(1, 41), pa.int64()),
            "s_nationkey": pa.array(RNG.integers(0, 5, 40).astype(np.int32)),
            "s_acctbal": pa.array(np.round(RNG.uniform(-999, 9999, 40), 2)),
        }
    )
    return {
        "lineitem": li,
        "orders": orders,
        "customer": customer,
        "nation": nation,
        "region": region,
        "supplier": supplier,
    }


@pytest.fixture(scope="module")
def con(tables):
    c = duckdb.connect()
    for name, tbl in tables.items():
        c.register(name, tbl)
    return c


def _ds(tbl: pa.Table, parts: int = 5):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(parts)


def test_money_cents_exact():
    vals = pa.array([901.82, 0.0, -994.28, 104997.88, 0.1, 0.05])
    assert money_cents(vals).tolist() == [90182, 0, -99428, 10499788, 10, 5]


def test_pricing_summary_vs_duckdb(ray_session, tables, con):
    got = pricing_summary(_ds(tables["lineitem"]), cutoff="1998-09-02")
    exp = con.execute(
        """
        WITH l AS (
          SELECT l_returnflag, l_linestatus,
                 CAST(floor(l_quantity*100 + 0.5) AS BIGINT) // 100 AS qty,
                 CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS base_c,
                 CAST(floor(l_discount*100 + 0.5) AS BIGINT) AS disc_pct,
                 CAST(floor(l_tax*100 + 0.5) AS BIGINT) AS tax_pct
          FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'),
        v AS (SELECT *, base_c*(100-disc_pct) AS disc_c2,
                     base_c*(100-disc_pct)*(100+tax_pct) AS charge_c4 FROM l)
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(qty) AS BIGINT) AS sum_qty,
               CAST(sum(base_c // 1000000) AS BIGINT) AS sum_base_hi,
               CAST(sum(base_c % 1000000) AS BIGINT) AS sum_base_lo,
               CAST(sum(disc_c2 // 1000000) AS BIGINT) AS sum_disc_hi,
               CAST(sum(disc_c2 % 1000000) AS BIGINT) AS sum_disc_lo,
               CAST(sum(charge_c4 // 1000000) AS BIGINT) AS sum_charge_hi,
               CAST(sum(charge_c4 % 1000000) AS BIGINT) AS sum_charge_lo,
               CAST(sum(disc_pct) AS BIGINT) AS sum_disc_pct
        FROM v GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetch_arrow_table()
    assert got.num_rows == 6
    for c in exp.column_names:
        assert got[c].to_pylist() == exp[c].to_pylist(), c
    # the decomposition recombines to the true full-precision sums
    base = [
        h * 1_000_000 + lo
        for h, lo in zip(got["sum_base_hi"].to_pylist(), got["sum_base_lo"].to_pylist())
    ]
    exp_base = con.execute(
        """SELECT CAST(sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)) AS HUGEINT)
           FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
           GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""
    ).fetchall()
    assert base == [int(r[0]) for r in exp_base]


def test_pricing_summary_partition_invariant(ray_session, tables):
    base = pricing_summary(_ds(tables["lineitem"], 1))
    for parts in (3, 11):
        got = pricing_summary(_ds(tables["lineitem"], parts))
        assert got.equals(base)


def test_broadcast_join_inner_and_left(ray_session, tables, con):
    cust = _ds(tables["customer"])
    dim = tables["nation"].select(["n_nationkey", "n_name"])
    inner = (
        broadcast_join(cust, dim, on="c_nationkey", right_on="n_nationkey")
        .to_pandas()
        .sort_values("c_custkey", ignore_index=True)
    )
    exp = con.execute(
        """SELECT c_custkey, n_name FROM customer
           JOIN nation ON c_nationkey = n_nationkey ORDER BY c_custkey"""
    ).fetch_arrow_table()
    assert inner["c_custkey"].tolist() == exp["c_custkey"].to_pylist()
    assert inner["n_name"].tolist() == exp["n_name"].to_pylist()
    # left join keeps unmatched probe rows with null payload
    dim_partial = dim.slice(0, 3)  # nations 0-2 only
    left = (
        broadcast_join(cust, dim_partial, on="c_nationkey", right_on="n_nationkey", how="left")
        .to_pandas()
        .sort_values("c_custkey", ignore_index=True)
    )
    assert len(left) == 150
    nulls = left["n_name"].isna()
    assert (left.loc[nulls, "c_nationkey"] >= 3).all()
    assert (left.loc[~nulls, "c_nationkey"] < 3).all()


def test_broadcast_join_rejects_dup_keys_and_collisions(ray_session, tables):
    cust = _ds(tables["customer"])
    dup = pa.table(
        {"n_nationkey": pa.array([1, 1], pa.int32()), "n_name": pa.array(["a", "b"])}
    )
    with pytest.raises(ValueError, match="unique"):
        broadcast_join(cust, dup, on="c_nationkey", right_on="n_nationkey")
    clash = pa.table(
        {"n_nationkey": pa.array([1], pa.int32()), "c_acctbal": pa.array([1.0])}
    )
    with pytest.raises(ValueError, match="collide"):
        broadcast_join(cust, clash, on="c_nationkey", right_on="n_nationkey")


def test_customers_per_region_vs_duckdb(ray_session, tables, con):
    got = customers_per_region(_ds(tables["customer"]), tables["nation"], tables["region"])
    exp = con.execute(
        """SELECT r_name, CAST(count(*) AS BIGINT) AS n_customers,
                  CAST(sum(CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)) AS BIGINT)
                    AS sum_acctbal_c
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY r_name ORDER BY r_name"""
    ).fetch_arrow_table()
    assert got.equals(exp)


def test_suppliers_per_region_vs_duckdb(ray_session, tables, con):
    from search_engine_ray.dataops.relational import suppliers_per_region

    got = suppliers_per_region(
        _ds(tables["supplier"], 3), tables["nation"], tables["region"]
    )
    exp = con.execute(
        """SELECT r_name, CAST(count(*) AS BIGINT) AS n_suppliers,
                  CAST(sum(CAST(floor(s_acctbal*100 + 0.5) AS BIGINT)) AS BIGINT)
                    AS sum_acctbal_c
           FROM supplier JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY r_name ORDER BY r_name"""
    ).fetch_arrow_table()
    assert got.equals(exp)


def test_top_customers_by_revenue_vs_duckdb(ray_session, tables, con):
    got = top_customers_by_revenue(
        _ds(tables["lineitem"]), _ds(tables["orders"]), k=15
    )
    exp = con.execute(
        """
        WITH orv AS (
          SELECT l_orderkey,
                 sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
                     * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS rev
          FROM lineitem GROUP BY l_orderkey),
        cr AS (SELECT o_custkey, CAST(sum(rev) AS BIGINT) AS rev_c2
               FROM orv JOIN orders ON l_orderkey = o_orderkey
               GROUP BY o_custkey)
        SELECT o_custkey, rev_c2 FROM cr ORDER BY rev_c2 DESC, o_custkey LIMIT 15
        """
    ).fetch_arrow_table()
    assert got.equals(exp)


def test_orders_per_month_vs_duckdb(ray_session, tables, con):
    got = orders_per_month(_ds(tables["orders"]))
    exp = con.execute(
        """SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS ym,
                  CAST(count(*) AS BIGINT) AS n_orders,
                  CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
                    AS sum_total_c
           FROM orders GROUP BY 1 ORDER BY 1"""
    ).fetch_arrow_table()
    assert got.equals(exp)


def test_customers_without_orders_vs_duckdb(ray_session, tables, con):
    out = (
        customers_without_orders(_ds(tables["customer"]), _ds(tables["orders"]))
        .to_pandas()
        .sort_values("c_custkey", ignore_index=True)
    )
    exp = con.execute(
        """SELECT c_custkey,
                  CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS acctbal_c
           FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
           ORDER BY c_custkey"""
    ).fetch_arrow_table()
    assert out["c_custkey"].tolist() == exp["c_custkey"].to_pylist()
    assert out["acctbal_c"].tolist() == exp["acctbal_c"].to_pylist()
    assert len(out) >= 1  # fixture guarantees some customers lack orders


def test_customers_without_orders_since_vs_duckdb(ray_session, tables, con):
    out = (
        customers_without_orders(
            _ds(tables["customer"]), _ds(tables["orders"]), since="2000-01-01"
        )
        .to_pandas()
        .sort_values("c_custkey", ignore_index=True)
    )
    exp = con.execute(
        """SELECT c_custkey,
                  CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS acctbal_c
           FROM customer WHERE c_custkey NOT IN (
             SELECT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '2000-01-01')
           ORDER BY c_custkey"""
    ).fetch_arrow_table()
    assert len(out) > 30  # strictly more than the no-orders-at-all set
    assert out["c_custkey"].tolist() == exp["c_custkey"].to_pylist()
    assert out["acctbal_c"].tolist() == exp["acctbal_c"].to_pylist()


def test_customers_without_orders_empty_keyset(ray_session, tables):
    """No order passes the cutoff -> EVERY customer qualifies (the empty
    post-aggregate keyset must not reach the join: schema-less empty
    blocks crash it — found by code review)."""
    out = customers_without_orders(
        _ds(tables["customer"]), _ds(tables["orders"]), since="2099-01-01"
    ).to_pandas()
    assert len(out) == 150
    assert sorted(out["c_custkey"]) == list(range(1, 151))


def test_count_distinct_vs_duckdb(ray_session, tables, con):
    # distinct customers per order-month: string-free int key AND the
    # string-keyed variant, both vs DuckDB
    got = count_distinct(_ds(tables["orders"]), key="o_custkey", value="o_orderkey")
    exp = con.execute(
        """SELECT o_custkey, CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
           FROM orders GROUP BY o_custkey ORDER BY o_custkey"""
    ).fetch_arrow_table()
    assert got.equals(exp)
    got2 = count_distinct(
        _ds(tables["lineitem"]), key="l_returnflag", value="l_orderkey"
    )
    exp2 = con.execute(
        """SELECT l_returnflag, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
    ).fetch_arrow_table()
    assert got2.equals(exp2)


def test_count_distinct_partition_invariant(ray_session, tables):
    base = count_distinct(_ds(tables["lineitem"], 1), "l_linestatus", "l_orderkey")
    for parts in (4, 9):
        got = count_distinct(
            _ds(tables["lineitem"], parts), "l_linestatus", "l_orderkey"
        )
        assert got.equals(base)


def test_shipping_priority_vs_duckdb(ray_session, tables, con):
    from search_engine_ray.dataops.relational import shipping_priority

    # segment column built here (module fixture has none): deterministic
    seg = pa.array(
        ["HOUSEHOLD" if k % 3 == 0 else "MACHINERY" for k in range(1, 151)]
    )
    cust = tables["customer"].append_column("c_mktsegment", seg)
    c2 = duckdb.connect()
    c2.register("customer", cust)
    c2.register("orders", tables["orders"])
    c2.register("lineitem", tables["lineitem"])
    exp = c2.sql(
        """
        WITH ql AS (
          SELECT l_orderkey,
                 SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
                     * (100 - CAST(floor(l_discount*100+0.5) AS BIGINT))) AS rev_c2
          FROM lineitem WHERE l_shipdate > TIMESTAMP '1997-06-01'
          GROUP BY l_orderkey),
        qo AS (
          SELECT o_orderkey,
                 CAST(year(o_orderdate)*10000 + month(o_orderdate)*100
                      + day(o_orderdate) AS BIGINT) AS ymd
          FROM orders JOIN customer ON c_custkey = o_custkey
          WHERE o_orderdate < TIMESTAMP '1997-06-01'
            AND c_mktsegment = 'HOUSEHOLD')
        SELECT l_orderkey, rev_c2, ymd FROM ql JOIN qo ON l_orderkey = o_orderkey
        ORDER BY rev_c2 DESC, l_orderkey LIMIT 10
        """
    ).arrow()
    got = shipping_priority(
        _ds(cust), _ds(tables["orders"]), _ds(tables["lineitem"]),
        segment="HOUSEHOLD", cutoff="1997-06-01", k=10,
    )
    assert got.num_rows == 10  # non-vacuous
    assert got.equals(exp.cast(got.schema))
    # partition invariance
    got2 = shipping_priority(
        _ds(cust, 1), _ds(tables["orders"], 9), _ds(tables["lineitem"], 2),
        segment="HOUSEHOLD", cutoff="1997-06-01", k=10,
    )
    assert got2.equals(got)


def test_shipping_priority_empty_segment(ray_session, tables):
    from search_engine_ray.dataops.relational import shipping_priority

    seg = pa.array(["MACHINERY"] * 150)
    cust = tables["customer"].append_column("c_mktsegment", seg)
    got = shipping_priority(
        _ds(cust), _ds(tables["orders"]), _ds(tables["lineitem"]),
        segment="HOUSEHOLD", cutoff="1997-06-01", k=10,
    )
    assert got.num_rows == 0
    assert got.schema.names == ["l_orderkey", "rev_c2", "ymd"]


def test_grouped_moments_vs_duckdb(ray_session, tables, con):
    from search_engine_ray.dataops.relational import grouped_moments

    got = grouped_moments(_ds(tables["lineitem"]), "l_returnflag", "l_extendedprice")
    exp = con.execute(
        """
        WITH v AS (SELECT l_returnflag,
                          CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS c
                   FROM lineitem)
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(c // 1000000) AS BIGINT) AS sum_c_hi,
               CAST(sum(c % 1000000) AS BIGINT) AS sum_c_lo,
               CAST(sum((c*c) // 1000000) AS BIGINT) AS sumsq_hi,
               CAST(sum((c*c) % 1000000) AS BIGINT) AS sumsq_lo
        FROM v GROUP BY 1 ORDER BY 1
        """
    ).fetch_arrow_table()
    assert got.column_names == exp.column_names
    for c in exp.column_names:
        assert got[c].to_pylist() == exp[c].to_pylist(), c
    # partition invariance
    got2 = grouped_moments(
        _ds(tables["lineitem"], 1), "l_returnflag", "l_extendedprice"
    )
    assert got2.equals(got)


def test_grouped_moments_rejects_negative_and_null(ray_session):
    from search_engine_ray.dataops.relational import grouped_moments

    bad = pa.table({"k": ["a", "b"], "v": [1.0, -2.0]})
    with pytest.raises(Exception, match="non-negative"):
        grouped_moments(_ds(bad, 1), "k", "v")
    nul = pa.table({"k": ["a", None], "v": [1.0, 2.0]})
    with pytest.raises(Exception, match="null group keys"):
        grouped_moments(_ds(nul, 1), "k", "v")


def test_variance_from_moments_exact(ray_session):
    from search_engine_ray.dataops.relational import (
        grouped_moments,
        variance_from_moments,
    )

    # hand-checkable: [1.00, 2.00, 3.00] -> mean 2.0, var_pop 2/3
    tbl = pa.table({"k": ["a"] * 3 + ["b"], "v": [1.0, 2.0, 3.0, 5.5]})
    m = grouped_moments(_ds(tbl, 2), "k", "v")
    v = variance_from_moments(m)
    assert v["k"].to_pylist() == ["a", "b"]
    assert v["mean"].to_pylist() == [2.0, 5.5]
    assert abs(v["var_pop"].to_pylist()[0] - 2.0 / 3.0) < 1e-12
    assert v["var_pop"].to_pylist()[1] == 0.0


def test_variance_from_moments_matches_numpy(ray_session, tables):
    from search_engine_ray.dataops.relational import (
        grouped_moments,
        variance_from_moments,
    )

    m = grouped_moments(_ds(tables["lineitem"]), "l_returnflag", "l_extendedprice")
    v = variance_from_moments(m)
    cents = money_cents(tables["lineitem"]["l_extendedprice"])
    flags = np.asarray(tables["lineitem"]["l_returnflag"])
    for i, flag in enumerate(v["l_returnflag"].to_pylist()):
        grp = cents[flags == flag].astype(np.float64) / 100.0
        assert abs(v["mean"].to_pylist()[i] - grp.mean()) < 1e-9 * abs(grp.mean())
        assert abs(v["var_pop"].to_pylist()[i] - grp.var()) < 1e-6 * max(grp.var(), 1)
