"""Distributed PCA over an embedding column.

The only data-sized pass is the GRAM MATRIX accumulation, and it is made
integer-exact: every pairwise product is floored to micros PER ELEMENT
(``floor(x_i * x_j * 1e6 + 0.5)`` — one IEEE multiply, no libm) and the
int64 micros are summed.  Integer sums commute, so the result is
partition-invariant and a DuckDB oracle reproduces the whole matrix
bit-for-bit — float dot-product sums would be neither.

The AUGMENTED trick (Tukey's sweep-matrix layout): each vector is
extended with a constant 1.0 coordinate, so one gram table carries
  * sum x_i x_j  (covariance numerators)       at (i, j < dim)
  * sum x_i      (the mean numerators)          at (i, dim)
  * n * 1e6      (the count)                    at (dim, dim)
and the centered covariance is assembled driver-side from micros.

Eigendecomposition and projection are float (LAPACK) — deliberately
OUTSIDE the exactness boundary, like kmeans/IVF.  Determinism: the
covariance input is integer-exact, ``numpy.linalg.eigh`` on an identical
matrix is deterministic within one platform, and component signs are
pinned (largest-|loading| coordinate made positive), so projections are
reproducible run-to-run; cross-platform they are "LAPACK-close", which
is why the projection gate self-checks against a driver-side recompute
instead of SQL.

int64 bound: per-cell partial sums reach n * max|x_i x_j| * 1e6; with
unit-scale embeddings (|x| <= ~6) that is safe past 1e12 rows.  Beyond
that, shard the accumulation per doc-range and sum hi/lo pairs like the
relational wing (dataops/relational.py) — the groupby shape is
unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .similarity import _batch_matrix

MICROS = 1_000_000
# rows per outer-product chunk inside one batch: 256 x dim^2 float64 stays
# cache-friendly (dim=64 -> 8 MB)
_CHUNK = 256


def emb_gram_micros(
    ds: ray.data.Dataset, column: str = "embedding", augment: bool = True
) -> pa.Table:
    """Upper-triangle augmented Gram matrix in exact integer micros.

    Output: (i, j, sum_micros) with j >= i, ascending — (dim+1)^2/2 rows
    total when augmented; the exchange per batch is bounded by that, never
    data-sized."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, column).astype(np.float64)
        if augment and len(m):
            m = np.concatenate([m, np.ones((len(m), 1), dtype=np.float64)], axis=1)
        d = m.shape[1] if len(m) else 0
        if len(m) == 0:
            return pa.table(
                {
                    "i": pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                    "sum_micros": pa.array([], pa.int64()),
                }
            )
        g = np.zeros((d, d), dtype=np.int64)
        for lo in range(0, len(m), _CHUNK):
            chunk = m[lo : lo + _CHUNK]
            prods = np.einsum("ni,nj->nij", chunk, chunk)
            g += np.floor(prods * MICROS + 0.5).astype(np.int64).sum(axis=0)
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64)),
                "j": pa.array(ju.astype(np.int64)),
                "sum_micros": pa.array(g[iu, ju]),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("sum_micros", alias_name="sum_micros"))
        .sort(["i", "j"])
        .to_pandas()
    )
    if "i" not in out.columns:  # all-empty blocks lose the schema
        return pa.table(
            {
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "sum_micros": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "i": pa.array(out["i"].to_numpy().astype(np.int64)),
            "j": pa.array(out["j"].to_numpy().astype(np.int64)),
            "sum_micros": pa.array(out["sum_micros"].to_numpy().astype(np.int64)),
        }
    )


def pca_fit(gram: pa.Table, n_components: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(components (k, dim), mean (dim,), explained_variance (k,)) from an
    AUGMENTED gram table (emb_gram_micros with augment=True).

    Assembles the centered covariance from the integer micros, symmetrizes
    the upper triangle, eigendecomposes with eigh, and pins each
    component's sign (largest-|loading| coordinate positive)."""
    if gram.num_rows == 0:
        raise ValueError("pca_fit needs at least 2 vectors (empty gram table)")
    i = gram["i"].to_numpy()
    j = gram["j"].to_numpy()
    s = gram["sum_micros"].to_numpy().astype(np.int64)
    d_aug = int(j.max()) + 1
    dim = d_aug - 1
    full = np.zeros((d_aug, d_aug), dtype=np.float64)
    full[i, j] = s.astype(np.float64)
    full = full + full.T - np.diag(np.diag(full))
    # augmented-layout check: the (dim, dim) cell is the count, n * 1e6
    # exactly (each row contributes floor(1*1*1e6 + 0.5)); a gram built
    # with augment=False lands sum(x_last^2) micros here and would
    # silently yield a wrong mean/covariance
    count_cell = int(s[(i == dim) & (j == dim)][0]) if ((i == dim) & (j == dim)).any() else -1
    if count_cell < 0 or count_cell % MICROS != 0:
        raise ValueError(
            "pca_fit requires an AUGMENTED gram table "
            "(emb_gram_micros with augment=True)"
        )
    n = count_cell // MICROS
    if n <= 1:
        raise ValueError("pca_fit needs at least 2 vectors")
    sums = full[:dim, dim] / MICROS
    mean = sums / n
    cov = full[:dim, :dim] / MICROS / n - np.outer(mean, mean)
    if not (1 <= n_components <= dim):
        raise ValueError(f"n_components must be in [1, {dim}]")
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T.copy()  # (k, dim)
    # sign pinning: largest-|loading| coordinate positive (ties -> lowest idx)
    for r in range(len(comps)):
        lead = int(np.argmax(np.abs(comps[r])))
        if comps[r, lead] < 0:
            comps[r] = -comps[r]
    return comps, mean, np.maximum(evals[order], 0.0)


class PcaProjector:
    """Actor-pool stage: components/mean broadcast once per actor via
    constructor kwargs; batches of embeddings project to (vec_id, proj)."""

    def __init__(self, components: np.ndarray, mean: np.ndarray,
                 column: str = "embedding", id_column: str = "vec_id"):
        self.c = np.asarray(components, dtype=np.float64)
        self.mean = np.asarray(mean, dtype=np.float64)
        self.column = column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.column).astype(np.float64)
        if len(m) == 0:
            return pa.table(
                {
                    self.id_column: pa.array([], pa.int64()),
                    "proj": pa.array([], pa.list_(pa.float64())),
                }
            )
        proj = (m - self.mean) @ self.c.T
        return pa.table(
            {
                self.id_column: batch[self.id_column],
                "proj": pa.array(list(proj), pa.list_(pa.float64())),
            }
        )


def pca_project(
    ds: ray.data.Dataset,
    components: np.ndarray,
    mean: np.ndarray,
    column: str = "embedding",
    id_column: str = "vec_id",
    concurrency: int | tuple = 2,
) -> ray.data.Dataset:
    return ds.map_batches(
        PcaProjector,
        fn_constructor_kwargs=dict(
            components=components, mean=mean, column=column, id_column=id_column
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
