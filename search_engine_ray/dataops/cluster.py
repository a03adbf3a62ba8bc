"""Distributed k-means clustering over an embedding column.

Ray-Data-first shape for the iterative workload a curation pipeline needs
(topic bucketing, diversity sampling, IVF coarse quantizers):

- assignment is a stateless vectorized ``map_batches`` pass against the
  CURRENT centroids, broadcast once per iteration via ``ray.put`` (never
  re-shipped per batch: the actual matrix rides in the object store, the
  closure only carries the ObjectRef);
- the centroid update never funnels vectors to the driver: each batch
  emits k partial (cluster, sum_vec, count) rows, one native groupby
  per-cluster ``map_groups`` folds the ~n_batches partials per cluster,
  and ONLY the k folded rows (k x dim floats) reach the driver;
- iterations are driver-side Python over k-row tables — the corpus is
  re-streamed per iteration, exactly how an out-of-core Lloyd's must run
  at 100 TB (no materialized intermediate grows with the input).

Determinism: init is the k lowest-id vectors (no RNG); assignment argmin
ties break to the lowest cluster id.  Partial-sum fold order can differ
across runs by float ulps; with real data the inter-centroid margins are
many orders of magnitude above ulp noise, so assignments are stable (the
pytest oracle asserts exact assignment equality vs a single-machine numpy
Lloyd's).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _matrix(batch: pa.Table, column: str) -> np.ndarray:
    col = batch[column]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = np.asarray(col.values, dtype=np.float64)
    return flat.reshape(batch.num_rows, -1)


def _assign(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    # squared L2 via the expansion; argmin ties -> lowest cluster id
    # (np.argmin returns the first minimal index)
    d2 = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ cents.T) + (cents * cents).sum(axis=1)[None, :]
    return np.argmin(d2, axis=1).astype(np.int32)


def kmeans_assign(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    column: str = "embedding",
    id_column: str = "vec_id",
) -> ray.data.Dataset:
    """(id, cluster) assignment of every vector to its nearest centroid.

    The centroid matrix is broadcast once (``ray.put``); each batch is one
    matmul.  SQL-checkable: with given centroids the argmin of squared L2
    is reproducible in DuckDB (ties -> lowest cluster id)."""
    cents_ref = ray.put(np.ascontiguousarray(centroids, dtype=np.float64))

    def assign_batch(batch: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        a = _assign(_matrix(batch, column), cents)
        return pa.table(
            {
                id_column: batch[id_column],
                "cluster": pa.array(a, pa.int32()),
            }
        )

    return ds.map_batches(assign_batch, batch_format="pyarrow")


def _init_centroids(
    ds: ray.data.Dataset, k: int, column: str, id_column: str
) -> np.ndarray:
    """Deterministic init: the k vectors with the LOWEST ids, via the
    distributed ascending top-k (never a driver-side scan)."""
    from .sample import topk_by

    head = topk_by(
        ds.select_columns([id_column, column]),
        value_column=id_column,
        k=k,
        ascending=True,
        id_column=id_column,
    )
    m = _matrix(head, column)
    if len(m) < k:
        raise ValueError(f"kmeans: k={k} but only {len(m)} vectors")
    return m


def kmeans_fit(
    ds: ray.data.Dataset,
    k: int = 8,
    n_iter: int = 5,
    column: str = "embedding",
    id_column: str = "vec_id",
) -> tuple[np.ndarray, ray.data.Dataset]:
    """Lloyd's iterations; returns (centroids (k, dim), assignment Dataset).

    Per iteration: broadcast centroids -> per-batch partial (cluster,
    sum_vec, count) -> groupby(cluster).map_groups fold -> k rows to the
    driver -> update.  An empty cluster keeps its previous centroid (no
    resampling — deterministic)."""
    cents = _init_centroids(ds, k, column, id_column)
    dim = cents.shape[1]

    for _ in range(n_iter):
        cents_ref = ray.put(cents)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(cents_ref)
            m = _matrix(batch, column)
            a = _assign(m, c)
            # per-dim bincount beats np.add.at (element-wise fancy-index
            # scatter) by an order of magnitude at typical batch sizes
            sums = np.stack(
                [np.bincount(a, weights=m[:, j], minlength=k) for j in range(dim)],
                axis=1,
            )
            counts = np.bincount(a, minlength=k).astype(np.int64)
            nz = np.flatnonzero(counts)
            return pa.table(
                {
                    "cluster": pa.array(nz.astype(np.int32)),
                    "psum": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums[nz].ravel()), dim
                    ),
                    "pcount": pa.array(counts[nz]),
                }
            )

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            s = np.sum(np.stack(g["psum"].to_numpy()), axis=0)
            return pd.DataFrame(
                {
                    "cluster": [g["cluster"].iloc[0]],
                    "psum": [s],
                    "pcount": [int(g["pcount"].sum())],
                }
            )

        folded = (
            ds.map_batches(partials, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(fold, batch_format="pandas")
            .to_pandas()  # k rows — the ONLY driver materialization
        )
        new = cents.copy()
        for _, row in folded.iterrows():
            if row["pcount"] > 0:
                new[int(row["cluster"])] = np.asarray(row["psum"]) / row["pcount"]
        cents = new

    return cents, kmeans_assign(ds, cents, column=column, id_column=id_column)


def semantic_dedup(
    ds: ray.data.Dataset,
    k: int = 8,
    tau: float = 0.85,
    n_iter: int = 0,
    column: str = "embedding",
    id_column: str = "vec_id",
    max_cluster: int = 100_000,
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster
    the embedding space, then within each cluster DROP every vector with
    cosine >= ``tau`` to any LOWER-id vector of the same cluster — one
    representative survives per semantic-duplicate set.  The drop
    predicate references the ORIGINAL cluster membership only (never the
    kept set), so the decision is order- and partition-independent and,
    with ``n_iter=0`` (centroids = the k lowest-id vectors, the repo's
    deterministic k-means init), fully SQL-reproducible.

    Shape: centroids broadcast once; assignment is one streaming matmul
    pass; the pairwise stage is ``groupby(cluster).map_groups`` — the
    only stage that co-locates vectors, inherent to SemDeDup — with a
    BLOCKED in-cluster matmul (1024-row strips, never an O(c^2) sim
    matrix in memory).  Clusters beyond ``max_cluster`` keep their
    overflow unexamined (kept, with a warning): at real scale k must
    grow with n precisely so clusters stay bounded — the paper uses
    ~0.1% of n.  Returns a streaming (id, cluster, keep) Dataset."""
    if not 0.0 < tau <= 1.0:
        raise ValueError("tau must be in (0, 1]")
    if n_iter > 0:
        cents, _ = kmeans_fit(ds, k=k, n_iter=n_iter, column=column, id_column=id_column)
    else:
        cents = _init_centroids(ds, k, column, id_column)
    cents_ref = ray.put(np.ascontiguousarray(cents, dtype=np.float64))

    def assign_batch(batch: pa.Table) -> pa.Table:
        a = _assign(_matrix(batch, column), ray.get(cents_ref))
        return batch.select([id_column, column]).append_column(
            "cluster", pa.array(a, pa.int32())
        )

    assigned = ds.map_batches(assign_batch, batch_format="pyarrow")

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_column, ignore_index=True)
        n = len(g)
        lim = min(n, max_cluster)
        if n > max_cluster:
            import warnings

            warnings.warn(
                f"semantic_dedup: cluster {int(g['cluster'].iloc[0])} has {n} "
                f"vectors > max_cluster={max_cluster}; overflow kept unexamined "
                f"(raise k so clusters stay bounded)"
            )
        m = np.stack(g[column].to_numpy()[:lim]).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        # zero vectors have undefined cosine: define it 0 (never >= tau > 0)
        mn = m / np.where(norms == 0.0, 1.0, norms)[:, None]
        drop = np.zeros(n, dtype=bool)
        cols = np.arange(lim)[None, :]
        for s in range(0, lim, 1024):
            e = min(s + 1024, lim)
            sims = mn[s:e] @ mn.T  # (strip, lim)
            hit = (sims >= tau) & (cols > np.arange(s, e)[:, None])
            drop[:lim] |= hit.any(axis=0)
        return pd.DataFrame(
            {
                id_column: g[id_column],
                "cluster": g["cluster"].astype("int32"),
                "keep": ~drop,
            }
        )

    return assigned.groupby("cluster").map_groups(dedup_group, batch_format="pandas")


def grouped_vector_sums(
    ds: ray.data.Dataset,
    label_column: str = "label",
    vec_column: str = "embedding",
) -> pa.Table:
    """Per-label centroid SUMS in exact integer micros — long format
    (label, dim, sum_micros, n): each vector component floored ONCE to
    ``floor(x * 10^6 + 0.5)`` int64 (after an exact float32->float64
    widening, the identical expression a SQL oracle evaluates), then
    summed — the class-prototype / per-cluster-mean building block with
    order/partition/libm-invariant results.  The true centroid is
    ``sum_micros / (n * 10^6)`` in whatever precision the consumer wants.

    Scale shape: per-batch ``np.add.at`` partials over (label x dim)
    matrices -> one groupby-sum of (n_labels x dim)-sized rows; the
    corpus never shuffles."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                label_column: pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "sum_micros": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        import pyarrow.compute as pc

        labels = np.asarray(batch[label_column], dtype=np.int64)
        col = batch[vec_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # list_flatten honors offsets (plain .values would leak slack
        # from sliced arrays); lengths must be UNIFORM — divisibility
        # alone would let ragged rows reshape into misaligned vectors
        lens = np.unique(np.asarray(pc.list_value_length(col), dtype=np.int64))
        if len(lens) != 1:
            raise ValueError(
                f"{vec_column}: ragged vector lengths {lens[:5].tolist()}"
            )
        flat = np.asarray(pc.list_flatten(col), dtype=np.float64)
        d = int(lens[0])
        mat = flat.reshape(len(labels), d)
        micros = np.floor(mat * 1_000_000.0 + 0.5).astype(np.int64)
        ul, inv = np.unique(labels, return_inverse=True)
        g = len(ul)
        sums = np.zeros((g, d), dtype=np.int64)
        np.add.at(sums, inv, micros)
        counts = np.bincount(inv, minlength=g).astype(np.int64)
        return pa.table(
            {
                label_column: pa.array(np.repeat(ul, d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), g)),
                "sum_micros": pa.array(sums.reshape(-1)),
                "n": pa.array(np.repeat(counts, d)),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([label_column, "dim"])
        .aggregate(
            Sum("sum_micros", alias_name="sum_micros"), Sum("n", alias_name="n")
        )
        .sort([label_column, "dim"])
        .to_pandas()
    )
    return pa.table(
        {
            label_column: pa.array(out[label_column].astype(np.int64)),
            "dim": pa.array(out["dim"].astype(np.int64)),
            "sum_micros": pa.array(out["sum_micros"].astype(np.int64)),
            "n": pa.array(out["n"].astype(np.int64)),
        }
    )
