"""Distributed PCA (dataops/pca.py): exact gram micros + fit + project."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from search_engine_ray.dataops.pca import (
    MICROS,
    emb_gram_micros,
    pca_fit,
    pca_project,
)

RNG = np.random.default_rng(7)
DIM = 6
N = 80
# anisotropic: variance concentrated along two known directions + offset mean
_BASIS = np.linalg.qr(RNG.normal(size=(DIM, DIM)))[0]
_SCALES = np.array([4.0, 2.0, 0.3, 0.2, 0.1, 0.05])
VECS = (RNG.normal(size=(N, DIM)) * _SCALES) @ _BASIS.T + np.array(
    [1.0, -2.0, 0.5, 0.0, 3.0, -1.0]
)
VECS = VECS.astype(np.float32)


def _tbl() -> pa.Table:
    return pa.table(
        {
            "vec_id": pa.array(np.arange(N, dtype=np.int64)),
            "embedding": pa.array(
                [v for v in VECS.astype(np.float32)], pa.list_(pa.float32())
            ),
        }
    )


def _brute_gram(aug: bool = True) -> dict[tuple[int, int], int]:
    m = VECS.astype(np.float64)
    if aug:
        m = np.concatenate([m, np.ones((N, 1))], axis=1)
    d = m.shape[1]
    out: dict[tuple[int, int], int] = {}
    for i in range(d):
        for j in range(i, d):
            out[(i, j)] = int(
                np.floor(m[:, i] * m[:, j] * MICROS + 0.5).astype(np.int64).sum()
            )
    return out


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    return ray.data.from_arrow(_tbl())


def test_gram_exact_and_partition_invariant(emb_ds, ray_session):
    g1 = emb_gram_micros(emb_ds)
    g2 = emb_gram_micros(ray.data.from_arrow(_tbl()).repartition(7))
    assert g1.equals(g2)
    got = {
        (int(i), int(j)): int(s)
        for i, j, s in zip(
            g1["i"].to_numpy(), g1["j"].to_numpy(), g1["sum_micros"].to_numpy()
        )
    }
    assert got == _brute_gram()


def test_gram_matches_duckdb(emb_ds, tmp_path):
    path = str(tmp_path / "emb.parquet")
    import pyarrow.parquet as pq

    pq.write_table(_tbl(), path)
    con = duckdb.connect()
    ora = con.execute(
        f"""
        WITH flat AS (
          SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
                 CAST(embedding[i] AS DOUBLE) AS val
          FROM read_parquet('{path}'),
               unnest(generate_series(1, len(embedding))) AS g(i)),
        aug AS (
          SELECT vec_id, dim, val FROM flat
          UNION ALL
          SELECT vec_id, (SELECT max(dim) + 1 FROM flat) AS dim, 1.0 AS val
          FROM (SELECT DISTINCT vec_id FROM flat))
        SELECT a.dim AS i, b.dim AS j,
               CAST(sum(floor(a.val * b.val * 1000000 + 0.5)) AS BIGINT)
                 AS sum_micros
        FROM aug a JOIN aug b ON a.vec_id = b.vec_id AND b.dim >= a.dim
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).arrow()
    got = emb_gram_micros(emb_ds)
    assert got.equals(ora.cast(got.schema))


def test_fit_recovers_dominant_directions(emb_ds):
    comps, mean, ev = pca_fit(emb_gram_micros(emb_ds), 2)
    assert comps.shape == (2, DIM)
    # orthonormal
    assert np.allclose(comps @ comps.T, np.eye(2), atol=1e-12)
    # mean correct to micros quantization
    assert np.allclose(mean, VECS.astype(np.float64).mean(axis=0), atol=1e-4)
    # leading components span the two high-variance basis directions
    for r, tol in ((0, 0.02), (1, 0.02)):
        overlap = abs(comps[r] @ _BASIS[:, r])
        assert overlap > 1 - tol, (r, overlap)
    # explained variance descending and close to the planted scales^2
    assert ev[0] >= ev[1]
    assert np.allclose(np.sqrt(ev[:2]), _SCALES[:2], rtol=0.25)
    # sign pin: largest-|loading| coordinate positive
    for r in range(2):
        assert comps[r, int(np.argmax(np.abs(comps[r])))] > 0


def test_fit_validates(emb_ds):
    gram = emb_gram_micros(emb_ds)
    with pytest.raises(ValueError):
        pca_fit(gram, 0)
    with pytest.raises(ValueError):
        pca_fit(gram, DIM + 1)
    one = ray.data.from_arrow(_tbl().slice(0, 1))
    with pytest.raises(ValueError):
        pca_fit(emb_gram_micros(one), 1)


def test_project_matches_driver_recompute(emb_ds):
    comps, mean, ev = pca_fit(emb_gram_micros(emb_ds), 3)
    out = (
        pca_project(emb_ds, comps, mean)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    assert list(out.columns) == ["vec_id", "proj"]
    P = np.stack(out["proj"].to_numpy())
    want = (VECS.astype(np.float64) - mean) @ comps.T
    assert np.allclose(P, want, atol=1e-9)
    # per-axis variance of projections == eigenvalue (micros-quantized cov)
    assert np.allclose(P.var(axis=0), ev, rtol=1e-3, atol=1e-6)


def test_empty_blocks_and_unaugmented_guard(emb_ds, ray_session):
    # empty blocks must not crash the projector or the gram pass
    comps, mean, ev = pca_fit(emb_gram_micros(emb_ds), 2)
    sparse = ray.data.from_arrow(_tbl()).repartition(N + 20)
    out = pca_project(sparse, comps, mean).to_pandas()
    assert len(out) == N
    # empty input: clean error, not KeyError
    empty = ray.data.from_arrow(_tbl().slice(0, 0))
    g = emb_gram_micros(empty)
    assert g.num_rows == 0
    with pytest.raises(ValueError):
        pca_fit(g, 1)
    # a non-augmented gram must be refused, not silently mis-read
    with pytest.raises(ValueError):
        pca_fit(emb_gram_micros(emb_ds, augment=False), 2)


# ---------------------------------------------------------------------------
# linear probe (dataops/probe.py) — shares the gram fixtures above
# ---------------------------------------------------------------------------


def _labeled_tbl() -> pa.Table:
    # label correlated with the data: first coordinate + deterministic noise
    y = VECS.astype(np.float64)[:, 0] * 2.0 + np.sin(np.arange(N))
    return _tbl().append_column("label", pa.array(y, pa.float64()))


def test_probe_fit_matches_driver_normal_equations(ray_session):
    from search_engine_ray.dataops.probe import (
        probe_fit,
        probe_gram_micros,
        probe_score,
    )

    tbl = _labeled_tbl()
    ridge = 1e-3
    # partition invariance of the suffstats
    g1 = probe_gram_micros(ray.data.from_arrow(tbl).repartition(1))
    g5 = probe_gram_micros(ray.data.from_arrow(tbl).repartition(5))
    assert g1.equals(g5)

    w, b = probe_fit(g1, ridge=ridge)
    x = VECS.astype(np.float64)
    y = np.asarray(tbl["label"], dtype=np.float64)
    # exact reference: brute-force the SAME micros-quantized suffstats
    # driver-side, then the identical solve — must agree to float noise
    v = np.concatenate([x, y[:, None], np.ones((N, 1))], axis=1)
    d_aug = DIM + 2
    gq = np.zeros((d_aug, d_aug))
    for i in range(d_aug):
        for j in range(d_aug):
            gq[i, j] = np.floor(v[:, i] * v[:, j] * MICROS + 0.5).astype(
                np.int64
            ).sum()
    keep = list(range(DIM)) + [d_aug - 1]
    reg = np.eye(DIM + 1) * ridge
    reg[-1, -1] = 0.0
    refq = np.linalg.solve(
        gq[np.ix_(keep, keep)] / MICROS + reg, gq[keep, DIM] / MICROS
    )
    assert np.allclose(w, refq[:-1], atol=1e-9)
    assert abs(b - refq[-1]) < 1e-9
    # coarse: micros quantization stays near the raw normal equations
    xa = np.concatenate([x, np.ones((N, 1))], axis=1)
    ref = np.linalg.solve(xa.T @ xa + reg, xa.T @ y)
    assert np.allclose(w, ref[:-1], atol=5e-3)
    assert abs(b - ref[-1]) < 5e-3
    # the fit is a real fit: residuals far below label variance
    pred = x @ w + b
    assert ((y - pred) ** 2).mean() < 0.5 * y.var()

    # actor-pool scoring == driver matmul, empty blocks tolerated
    out = (
        probe_score(ray.data.from_arrow(tbl).repartition(N + 10), w, b)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    assert len(out) == N
    assert np.allclose(out["score"].to_numpy(), pred, atol=1e-9)


def test_probe_fit_validates(ray_session):
    import pytest as _pytest

    from search_engine_ray.dataops.probe import probe_fit, probe_gram_micros

    empty = ray.data.from_arrow(_labeled_tbl().slice(0, 0))
    g = probe_gram_micros(empty)
    with _pytest.raises(ValueError):
        probe_fit(g)
    # a plain pca gram (no label coordinate) must be refused: its layout
    # would silently treat the bias column as the label
    with _pytest.raises(ValueError):
        probe_fit(pa.table({
            "i": pa.array([0], pa.int64()),
            "j": pa.array([0], pa.int64()),
            "sum_micros": pa.array([12345], pa.int64()),
        }))
