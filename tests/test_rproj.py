"""Signed random projection (dataops/rproj.py)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from search_engine_ray.dataops.rproj import (
    MICROS,
    random_projection,
    sign_matrix,
)

RNG = np.random.default_rng(3)
N, DIM, K = 40, 12, 5
VECS = RNG.normal(size=(N, DIM)).astype(np.float32)


def _tbl() -> pa.Table:
    return pa.table(
        {
            "vec_id": pa.array(np.arange(N, dtype=np.int64)),
            "embedding": pa.array(list(VECS), pa.list_(pa.float32())),
        }
    )


def _brute() -> np.ndarray:
    s = sign_matrix(K, DIM)
    vm = np.floor(VECS.astype(np.float64) * MICROS + 0.5).astype(np.int64)
    return vm @ s.T


def test_exact_and_partition_invariant(ray_session):
    out = (
        random_projection(ray.data.from_arrow(_tbl()), K, dim=DIM)
        .to_pandas()
        .sort_values(["vec_id", "comp"], ignore_index=True)
    )
    want = _brute()
    got = out["proj_micros"].to_numpy().reshape(N, K)
    assert (got == want).all()
    out2 = (
        random_projection(ray.data.from_arrow(_tbl()).repartition(7), K)
        .to_pandas()
        .sort_values(["vec_id", "comp"], ignore_index=True)
    )
    assert (out2["proj_micros"].to_numpy() == out["proj_micros"].to_numpy()).all()


def test_matches_duckdb(ray_session, tmp_path):
    path = str(tmp_path / "emb.parquet")
    pq.write_table(_tbl(), path)
    ora = duckdb.connect().execute(
        f"""
        WITH flat AS (
          SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
                 CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS vm
          FROM read_parquet('{path}'),
               unnest(generate_series(1, len(embedding))) AS g(i)),
        signs AS (
          SELECT c, dim,
                 CASE WHEN ('0x' || substr(md5('rp:' || c || ':' || dim), 1, 16))::UBIGINT % 2 = 1
                      THEN 1 ELSE -1 END AS s
          FROM (SELECT CAST(unnest(generate_series(0, {K - 1})) AS BIGINT) AS c),
               (SELECT DISTINCT dim FROM flat) d(dim))
        SELECT f.vec_id, s.c AS comp, CAST(SUM(s.s * f.vm) AS BIGINT) AS proj_micros
        FROM flat f JOIN signs s USING (dim)
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).arrow()
    got = (
        random_projection(ray.data.read_parquet(path), K)
        .to_pandas()
        .sort_values(["vec_id", "comp"], ignore_index=True)
    )
    assert (got["vec_id"].to_numpy() == ora["vec_id"].to_numpy()).all()
    assert (got["comp"].to_numpy() == ora["comp"].to_numpy()).all()
    assert (got["proj_micros"].to_numpy() == ora["proj_micros"].to_numpy()).all()


def test_preserves_dot_products_in_expectation(ray_session):
    # JL property sanity: with k=64 components the projected cosine tracks
    # the true cosine within loose tolerance for a few planted pairs
    rng = np.random.default_rng(9)
    base = rng.normal(size=(1, 32))
    vecs = np.concatenate(
        [base, base + rng.normal(scale=0.1, size=(1, 32)), rng.normal(size=(1, 32))]
    ).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(3, dtype=np.int64)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )
    out = (
        random_projection(ray.data.from_arrow(tbl), 64, dim=32)
        .to_pandas()
        .sort_values(["vec_id", "comp"], ignore_index=True)
    )
    p = out["proj_micros"].to_numpy().reshape(3, 64).astype(np.float64)

    def cos(a, b):
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b))

    v = vecs.astype(np.float64)
    assert cos(p[0], p[1]) > cos(p[0], p[2]) + 0.2
    assert abs(cos(p[0], p[1]) - cos(v[0], v[1])) < 0.25


def test_validates(ray_session):
    with pytest.raises(ValueError):
        random_projection(ray.data.from_arrow(_tbl()), 0)
    ragged = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[1.0, 2.0], [1.0, 2.0, 3.0]], pa.list_(pa.float32())),
        }
    )
    with pytest.raises(Exception):
        random_projection(ray.data.from_arrow(ragged), 4, dim=2).materialize()


def test_empty_blocks_do_not_poison_actors(ray_session):
    # more partitions than rows -> some blocks are empty; lazily-sized
    # actors must survive them (and an all-empty dataset returns 0 rows)
    sparse = ray.data.from_arrow(_tbl()).repartition(N + 30)
    out = (
        random_projection(sparse, K)
        .to_pandas()
        .sort_values(["vec_id", "comp"], ignore_index=True)
    )
    assert (out["proj_micros"].to_numpy().reshape(N, K) == _brute()).all()
    empty = ray.data.from_arrow(_tbl().slice(0, 0))
    assert random_projection(empty, K).count() == 0
