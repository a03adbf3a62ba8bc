"""Partition-ordered window functions (dataops/window_fns.py):
running_sum / lag_delta vs brute-force references and DuckDB window
oracles, plus partition invariance (results must not depend on how rows
are batched or which bucket count is used)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from search_engine_ray.dataops.window_fns import lag_delta, running_sum


def _toy(n=500, keys=17, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "k": pa.array(rng.integers(0, keys, n).astype(np.int64)),
            "o": pa.array(rng.integers(0, 50, n).astype(np.int64)),  # ties!
            "v": pa.array(rng.integers(-1000, 1000, n).astype(np.int64)),
        }
    )


def _brute(tbl: pa.Table):
    df = tbl.to_pandas().sort_values(["k", "o", "id"], ignore_index=True)
    df["run"] = df.groupby("k")["v"].cumsum()
    df["delta"] = df["v"] - df.groupby("k")["v"].shift(1)
    first = df.groupby("k").cumcount() == 0
    df.loc[first, "delta"] = -1
    return df.astype({"delta": np.int64}).sort_values("id", ignore_index=True)


@pytest.mark.parametrize("n_buckets,n_blocks", [(8, 1), (3, 7), (64, 4)])
def test_window_fns_match_brute_force(ray_session, n_buckets, n_blocks):
    tbl = _toy()
    ds = ray.data.from_arrow(tbl).repartition(n_blocks)
    exp = _brute(tbl)
    got_r = (
        running_sum(ds, "k", ("o",), "v", "id", out_name="run", n_buckets=n_buckets)
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got_r, exp[["id", "k", "run"]], check_dtype=False)
    got_l = (
        lag_delta(ds, "k", ("o",), "v", "id", out_name="delta", n_buckets=n_buckets)
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got_l, exp[["id", "k", "delta"]], check_dtype=False)


def test_window_fns_match_duckdb(ray_session):
    tbl = _toy(n=800, keys=9, seed=11)
    ds = ray.data.from_arrow(tbl).repartition(5)
    con = duckdb.connect()
    con.register("t", tbl)
    exp_r = con.sql(
        """SELECT id, k, SUM(v) OVER (PARTITION BY k ORDER BY o, id
           ROWS UNBOUNDED PRECEDING) AS run FROM t ORDER BY id"""
    ).df()
    got_r = (
        running_sum(ds, "k", ("o",), "v", "id", out_name="run")
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    assert (got_r[["id", "k", "run"]].values == exp_r.values).all()
    exp_l = con.sql(
        """SELECT id, k, COALESCE(v - lag(v) OVER (PARTITION BY k ORDER BY o, id), -1)
           AS delta FROM t ORDER BY id"""
    ).df()
    got_l = (
        lag_delta(ds, "k", ("o",), "v", "id", out_name="delta")
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    assert (got_l[["id", "k", "delta"]].values == exp_l.values).all()


def test_window_fns_single_key_and_single_rows(ray_session):
    # one key (worst skew: everything in one bucket) and n=1
    tbl = pa.table(
        {
            "id": pa.array([0, 1, 2], pa.int64()),
            "k": pa.array([5, 5, 5], pa.int64()),
            "o": pa.array([2, 1, 1], pa.int64()),
            "v": pa.array([10, 20, 30], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    got = (
        running_sum(ds, "k", ("o",), "v", "id", out_name="run", n_buckets=4)
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    # order within k=5: (o=1,id=1), (o=1,id=2), (o=2,id=0)
    assert got["run"].tolist() == [60, 20, 50]
    one = ray.data.from_arrow(tbl.slice(0, 1))
    got1 = lag_delta(one, "k", ("o",), "v", "id").to_pandas()
    assert got1["delta"].tolist() == [-1]


def test_window_fns_validation(ray_session):
    tbl = _toy(n=10)
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(ValueError, match="n_buckets"):
        running_sum(ds, "k", ("o",), "v", "id", n_buckets=0)


def test_row_number_and_rolling_sum_vs_duckdb(ray_session):
    from search_engine_ray.dataops.window_fns import rolling_sum, row_number

    tbl = _toy(n=700, keys=13, seed=23)
    ds = ray.data.from_arrow(tbl).repartition(6)
    con = duckdb.connect()
    con.register("t", tbl)
    got_rn = (
        row_number(ds, "k", ("o",), "id", out_name="rn", n_buckets=16)
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    exp_rn = con.sql(
        """SELECT id, k, ROW_NUMBER() OVER (PARTITION BY k ORDER BY o, id) AS rn
           FROM t ORDER BY id"""
    ).df()
    assert (got_rn[["id", "k", "rn"]].values == exp_rn.values).all()
    for w in (1, 4):
        got_rs = (
            rolling_sum(ds, "k", ("o",), "v", "id", window=w, out_name="rs")
            .to_pandas()
            .sort_values("id", ignore_index=True)
        )
        exp_rs = con.sql(
            f"""SELECT id, k, SUM(v) OVER (PARTITION BY k ORDER BY o, id
                ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS rs
                FROM t ORDER BY id"""
        ).df()
        assert (got_rs[["id", "k", "rs"]].values == exp_rs.values).all()
    with pytest.raises(ValueError, match="window"):
        rolling_sum(ds, "k", ("o",), "v", "id", window=0)


def test_string_key_windows_vs_duckdb(ray_session):
    from search_engine_ray.dataops.window_fns import (
        rolling_sum,
        row_number,
        running_sum,
    )

    rng = np.random.default_rng(31)
    tbl = pa.table(
        {
            "id": pa.array(np.arange(600, dtype=np.int64)),
            "lang": pa.array([["en", "de", "fr", "zh", ""][i] for i in
                              rng.integers(0, 5, 600)]),
            "o": pa.array(rng.integers(0, 40, 600).astype(np.int64)),
            "v": pa.array(rng.integers(0, 100, 600).astype(np.int64)),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    con = duckdb.connect()
    con.register("t", tbl)
    got = (
        row_number(ds, "lang", ("o",), "id", out_name="rn", n_buckets=7)
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    exp = con.sql(
        """SELECT id, lang, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY o, id)
           AS rn FROM t ORDER BY id"""
    ).df()
    assert (got[["id", "lang", "rn"]].values == exp.values).all()
    got2 = (
        running_sum(ds, "lang", ("o",), "v", "id", out_name="run", n_buckets=3)
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    exp2 = con.sql(
        """SELECT id, lang, SUM(v) OVER (PARTITION BY lang ORDER BY o, id
           ROWS UNBOUNDED PRECEDING) AS run FROM t ORDER BY id"""
    ).df()
    assert (got2[["id", "lang", "run"]].values == exp2.values).all()
    # partition invariance with string keys
    got3 = (
        rolling_sum(ray.data.from_arrow(tbl), "lang", ("o",), "v", "id",
                    window=3, out_name="rs")
        .to_pandas().sort_values("id", ignore_index=True)
    )
    got4 = (
        rolling_sum(ds, "lang", ("o",), "v", "id", window=3, out_name="rs",
                    n_buckets=2)
        .to_pandas().sort_values("id", ignore_index=True)
    )
    assert got3.equals(got4)


def test_group_tile_vs_duckdb(ray_session):
    from search_engine_ray.dataops.window_fns import group_tile

    rng = np.random.default_rng(43)
    tbl = pa.table(
        {
            "id": pa.array(np.arange(700, dtype=np.int64)),
            "k": pa.array(rng.integers(0, 9, 700).astype(np.int64)),
            "lang": pa.array([["en", "de", ""][i] for i in rng.integers(0, 3, 700)]),
            "o": pa.array(rng.integers(-50, 50, 700).astype(np.int64)),
        }
    )
    con = duckdb.connect()
    con.register("t", tbl)
    for key, tiles, parts in (("k", 3, 1), ("k", 4, 6), ("lang", 3, 5)):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        got = (
            group_tile(ds, key, ("o",), "id", n_tiles=tiles, out_name="b", n_buckets=5)
            .to_pandas()
            .sort_values("id", ignore_index=True)
        )
        exp = con.sql(f"""
            SELECT id, {key},
                   ((ROW_NUMBER() OVER (PARTITION BY {key} ORDER BY o, id) - 1)
                    * {tiles}) // (COUNT(*) OVER (PARTITION BY {key})) AS b
            FROM t ORDER BY id
        """).df()
        assert (got["b"].to_numpy() == exp["b"].to_numpy()).all()
        assert (got["id"].to_numpy() == exp["id"].to_numpy()).all()
    # equi-depth: tile sizes within a key differ by at most 1
    got = (
        group_tile(ray.data.from_arrow(tbl), "k", ("o",), "id", n_tiles=3)
        .to_pandas()
    )
    sizes = got.groupby(["k", "tile"]).size().groupby(level=0)
    assert ((sizes.max() - sizes.min()) <= 1).all()
    with pytest.raises(ValueError, match="n_tiles"):
        group_tile(ray.data.from_arrow(tbl), "k", ("o",), "id", n_tiles=0)


def test_string_key_windows_null_keys(ray_session):
    # review fix: null string keys must form their own group (distinct
    # from ""), not crash the bucket hash
    from search_engine_ray.dataops.window_fns import row_number

    tbl = pa.table(
        {
            "id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
            "k": pa.array(["a", None, "", "a", None, ""], pa.string()),
            "o": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        }
    )
    got = (
        row_number(ray.data.from_arrow(tbl).repartition(3), "k", ("o",), "id",
                   out_name="rn", n_buckets=4)
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    assert got["rn"].tolist() == [1, 1, 1, 2, 2, 2]
