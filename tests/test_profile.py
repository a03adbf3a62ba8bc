"""Table profiling (dataops/profile.py) vs DuckDB aggregates."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from search_engine_ray.dataops.profile import profile_table


def test_profile_table_vs_duckdb(ray_session):
    rng = np.random.default_rng(3)
    n = 500
    ids = np.arange(n, dtype=np.int64)
    vals = rng.integers(-100, 10_000, n).astype(np.int64)
    cats = np.array([["x", "y", "zz", "9", "10"][i] for i in rng.integers(0, 5, n)],
                    dtype=object)
    # nulls in both an int and a string column
    val_arr = pa.array([None if i % 7 == 0 else int(v) for i, v in enumerate(vals)],
                       pa.int64())
    cat_arr = pa.array([None if i % 11 == 0 else c for i, c in enumerate(cats)],
                       pa.string())
    tbl = pa.table({"id": pa.array(ids), "val": val_arr, "cat": cat_arr})
    got = profile_table(
        ray.data.from_arrow(tbl).repartition(5), ["val", "cat", "id"]
    )
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.sql("""
        SELECT 'cat' AS col, count(*) AS n,
               count(*) - count(cat) AS n_null, count(DISTINCT cat) AS n_distinct,
               MIN(cat) AS min_str, MAX(cat) AS max_str FROM t
        UNION ALL
        SELECT 'id', count(*), count(*) - count(id), count(DISTINCT id),
               CAST(MIN(id) AS VARCHAR), CAST(MAX(id) AS VARCHAR) FROM t
        UNION ALL
        SELECT 'val', count(*), count(*) - count(val), count(DISTINCT val),
               CAST(MIN(val) AS VARCHAR), CAST(MAX(val) AS VARCHAR) FROM t
        ORDER BY col
    """).arrow()
    assert got.equals(exp.cast(got.schema))
    # string min/max is lexicographic ("10" < "9"); int min/max is numeric —
    # the native-type guarantee
    row = {c: got[c][0].as_py() for c in got.column_names}  # cat row
    assert row["min_str"] == "10" and row["max_str"] == "zz"
    # partition invariance
    got1 = profile_table(ray.data.from_arrow(tbl), ["val", "cat", "id"])
    assert got.equals(got1)


def test_profile_edges(ray_session):
    # all-null column; empty table; validation
    tbl = pa.table(
        {
            "a": pa.array([None, None], pa.int64()),
            "b": pa.array([1, 1], pa.int64()),
        }
    )
    got = profile_table(ray.data.from_arrow(tbl), ["a", "b"])
    assert got["n_null"].to_pylist() == [2, 0]
    assert got["n_distinct"].to_pylist() == [0, 1]
    assert got["min_str"].to_pylist() == [None, "1"]
    with pytest.raises(ValueError, match="non-empty"):
        profile_table(ray.data.from_arrow(tbl), [])
    with pytest.raises(ValueError, match="duplicate"):
        profile_table(ray.data.from_arrow(tbl), ["a", "a"])
