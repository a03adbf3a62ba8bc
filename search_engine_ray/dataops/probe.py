"""Supervised linear probe (ridge regression) over an embedding column —
the quality-classifier-fit step of modern curation pipelines (FineWeb-Edu
scores pages with a linear head over embeddings; DSIR/DoReMi fit similar
lightweight models before the expensive passes).

Fit is via NORMAL EQUATIONS with distributed exact sufficient statistics:
the one data-sized pass reuses ``pca.emb_gram_micros`` over the extended
vector ``[x, y, 1]``, so the augmented integer-micros Gram table carries
X'X, X'y, sum x, sum y, y.y and n all at once — a single
(dim+2)^2/2-row exchange, partition-invariant and SQL-bit-reproducible
(gate q:`probe_gram`).  The (dim+1)x(dim+1) solve and the corpus scoring
pass are float (LAPACK) — deliberately OUTSIDE the exactness boundary,
exactly like ``pca_fit``/kmeans — so the end-to-end gate self-checks the
distributed fit and the actor-pool scoring against driver-side recomputes
instead of SQL (the pca_project convention).

Scale shape: suffstats exchange is O(dim^2) regardless of row count;
weights broadcast once per scoring actor via constructor kwargs; scoring
is one stateless vectorized matmul pass, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .pca import MICROS, emb_gram_micros
from .similarity import _batch_matrix


def probe_gram_micros(
    ds: ray.data.Dataset,
    column: str = "embedding",
    label_column: str = "label",
) -> pa.Table:
    """Augmented Gram of ``[x, y, 1]`` in exact integer micros: rows
    (i, j, sum_micros), j >= i, over dim+2 coordinates.  Layout:
    coordinates 0..dim-1 are the embedding, dim is the label, dim+1 the
    bias constant."""

    def with_label(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, column).astype(np.float64)
        y = np.asarray(batch[label_column], dtype=np.float64)
        if len(m):
            m = np.concatenate([m, y[:, None]], axis=1)
        return pa.table({"_xy": pa.array(list(m), pa.list_(pa.float64()))})

    return emb_gram_micros(
        ds.map_batches(with_label, batch_format="pyarrow"),
        column="_xy",
        augment=True,
    )


def probe_fit(gram: pa.Table, ridge: float = 1e-6) -> tuple[np.ndarray, float]:
    """(weights (dim,), bias) from a probe_gram_micros table: solve
    ``(M + ridge * I') w_aug = rhs`` where M = [[X'X, sum x],[sum x', n]],
    rhs = [X'y, sum y], and I' leaves the bias unregularized."""
    if gram.num_rows == 0:
        raise ValueError("probe_fit needs at least 2 rows (empty gram table)")
    i = gram["i"].to_numpy()
    j = gram["j"].to_numpy()
    s = gram["sum_micros"].to_numpy().astype(np.int64)
    d_aug = int(j.max()) + 1  # dim + 2
    dim = d_aug - 2
    if dim < 1:
        raise ValueError("probe_fit needs at least 1 embedding coordinate")
    full = np.zeros((d_aug, d_aug), dtype=np.float64)
    full[i, j] = s.astype(np.float64)
    full = full + full.T - np.diag(np.diag(full))
    count_cell = full[d_aug - 1, d_aug - 1]
    if count_cell <= 0 or int(count_cell) % MICROS != 0:
        raise ValueError(
            "probe_fit requires a probe_gram_micros table "
            "([x, y, 1] layout with the bias constant last)"
        )
    n = int(count_cell) // MICROS
    if n <= 1:
        raise ValueError("probe_fit needs at least 2 vectors")
    # design-matrix coordinates = embedding + bias (label column excluded)
    keep = list(range(dim)) + [d_aug - 1]
    m = full[np.ix_(keep, keep)] / MICROS
    rhs = full[keep, dim] / MICROS
    reg = np.eye(dim + 1) * float(ridge)
    reg[dim, dim] = 0.0
    w_aug = np.linalg.solve(m + reg, rhs)
    return w_aug[:dim].copy(), float(w_aug[dim])


class ProbeScorer:
    """Actor-pool stage: weights/bias broadcast once per actor via
    constructor kwargs; batches score to (id_column, score)."""

    def __init__(self, weights: np.ndarray, bias: float,
                 column: str = "embedding", id_column: str = "vec_id"):
        self.w = np.asarray(weights, dtype=np.float64)
        self.b = float(bias)
        self.column = column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.column).astype(np.float64)
        if len(m) == 0:
            return pa.table(
                {
                    self.id_column: pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                self.id_column: batch[self.id_column],
                "score": pa.array(m @ self.w + self.b, pa.float64()),
            }
        )


def probe_score(
    ds: ray.data.Dataset,
    weights: np.ndarray,
    bias: float,
    column: str = "embedding",
    id_column: str = "vec_id",
    concurrency: int | tuple = 2,
) -> ray.data.Dataset:
    return ds.map_batches(
        ProbeScorer,
        fn_constructor_kwargs=dict(
            weights=weights, bias=bias, column=column, id_column=id_column
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
