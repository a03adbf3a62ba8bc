"""Signed random projection (Johnson–Lindenstrauss / Achlioptas 2003).

The cheap JL transform: project dim-d embeddings onto k pseudo-random
±1 directions.  Distances are preserved in expectation (E[<v,s><w,s>] =
<v,w> for Rademacher s), so the k-dim sketch supports approximate
similarity / clustering at k/d the bandwidth — the classic dimensionality
shrink before an ANN build or a crawl-scale clustering pass.

Exactness design: unlike PCA (whose projection is LAPACK-float), this
entire operator is INTEGER —

    proj[c] = sum_i sign(c, i) * floor(x_i * 1e6 + 0.5)

with sign(c, i) = +1 iff md5be("rp:{c}:{i}") is odd (the repo's
SQL-reproducible hash kind, dedup.py:60).  Component values are exact
int64 micros, partition- and batch-size-invariant, and a DuckDB oracle
reproduces every cell.  No fit step, no shuffle: one stateless
map_batches pass; the (k × d) sign matrix is rebuilt per actor from the
hash (cheaper than broadcasting it).

int64 bound: |proj| <= d * max|x| * 1e6 — unit-scale embeddings at
d = 4096 stay under 1e11; the output, not the input, is data-sized.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from .similarity import _batch_matrix

MICROS = 1_000_000


def sign_matrix(n_components: int, dim: int) -> np.ndarray:
    """(k, d) int64 ±1 matrix: +1 iff md5be('rp:{c}:{i}') is odd."""
    out = np.empty((n_components, dim), dtype=np.int64)
    for c in range(n_components):
        for i in range(dim):
            h = int.from_bytes(
                hashlib.md5(f"rp:{c}:{i}".encode()).digest()[:8], "big"
            )
            out[c, i] = 1 if h & 1 else -1
    return out


class _Projector:
    """Actor-pool stage: sign matrix built once per actor in __init__."""

    def __init__(self, n_components: int, dim: int, column: str, id_column: str):
        self.s = None  # lazily sized on first batch when dim is unknown
        self.n_components = n_components
        self.dim = dim
        self.column = column
        self.id_column = id_column
        if dim:
            self.s = sign_matrix(n_components, dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.column).astype(np.float64)
        if len(m) == 0:  # keep a lazily-sized actor usable after an empty block
            return pa.table(
                {
                    self.id_column: pa.array([], pa.int64()),
                    "comp": pa.array([], pa.int64()),
                    "proj_micros": pa.array([], pa.int64()),
                }
            )
        if self.s is None:
            self.s = sign_matrix(self.n_components, m.shape[1])
        if m.shape[1] != self.s.shape[1]:
            raise ValueError(
                f"embedding dim {m.shape[1]} != sign matrix dim {self.s.shape[1]}"
            )
        vm = np.floor(m * MICROS + 0.5).astype(np.int64)
        proj = vm @ self.s.T  # exact int64 matmul
        k = self.s.shape[0]
        n = len(vm)
        return pa.table(
            {
                self.id_column: pa.array(
                    np.repeat(
                        np.asarray(batch[self.id_column].to_numpy(), np.int64), k
                    )
                ),
                "comp": pa.array(np.tile(np.arange(k, dtype=np.int64), n)),
                "proj_micros": pa.array(proj.reshape(-1)),
            }
        )


def random_projection(
    ds: ray.data.Dataset,
    n_components: int = 16,
    dim: int | None = None,
    column: str = "embedding",
    id_column: str = "vec_id",
    concurrency: int | tuple = 2,
) -> ray.data.Dataset:
    """Long-format (id, comp, proj_micros) exact signed projection.

    Pass ``dim`` when known to build the sign matrix in __init__; otherwise
    each actor sizes it from its first batch (ragged inputs fail loud)."""
    if n_components < 1:
        raise ValueError(f"n_components must be >= 1, got {n_components}")
    return ds.map_batches(
        _Projector,
        fn_constructor_kwargs=dict(
            n_components=n_components,
            dim=dim or 0,
            column=column,
            id_column=id_column,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
