"""Similarity search over an embedding column (list<float>).

- knn_brute_force: exact cosine top-k — the baseline.  The query matrix is
  broadcast ONCE via ray.put; each map_batches task does one numpy matmul
  per batch (zero per-row Python), emits its per-batch top-k partials, and
  a final tiny per-query reduction merges them.  At cluster scale this is
  embarrassingly parallel over batches with an O(Q*k*batches) combine.
- lsh_buckets / knn_lsh: random-hyperplane LSH — the scale path.  Vectors
  shuffle once by bucket signature; queries probe only their own (and
  optionally neighboring) buckets.  Approximate; recall measured in tests.
- embedding_near_dup_pairs: cosine >= threshold pairs via LSH blocking +
  exact verification inside buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _batch_matrix(batch: pa.Table, column: str) -> np.ndarray:
    col = batch[column].combine_chunks() if isinstance(batch[column], pa.ChunkedArray) else batch[column]
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type) or pa.types.is_fixed_size_list(col.type):
        flat = np.asarray(col.flatten(), dtype=np.float64)
        return flat.reshape(n, -1)
    # Ray tensor-extension arrays (from_pandas of ndarray columns)
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype == object:
        arr = np.stack(arr)
    return np.asarray(arr, dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_brute_force(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    column: str = "embedding",
    id_column: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k for each query row; returns
    (query_id, vec_id, cos_sim) ranked desc, ties by ascending vec_id."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)

    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        emb = _normalize(_batch_matrix(batch, column))
        ids = np.asarray(batch[id_column], dtype=np.int64)
        sims = emb @ q.T  # (n, Q)
        n, nq = sims.shape
        kk = min(k, n)
        out_q, out_id, out_s = [], [], []
        for qi in range(nq):
            s = sims[:, qi]
            # partial top-k with (score desc, id asc) tie order
            idx = np.lexsort((ids, -s))[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_id.append(ids[idx])
            out_s.append(s[idx])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_id)),
                "cos_sim": pa.array(np.concatenate(out_s)),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow", batch_size=4096)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos_sim", "vec_id"], ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1)
        return g

    merged = partials.groupby("query_id").map_groups(merge, batch_format="pandas")
    batches = list(merged.iter_batches(batch_size=None, batch_format="pyarrow"))
    out = pa.concat_tables([pa.table(b) for b in batches]) if batches else None
    if out is None:
        return pa.table({"query_id": [], "vec_id": [], "cos_sim": [], "rank": []})
    return out.sort_by([("query_id", "ascending"), ("rank", "ascending")])


class LshBucketer:
    """Random-hyperplane signature per vector (one shuffle key for ANN)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 5, column: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.column = column

    def signature(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0
        return (bits.astype(np.uint64) << np.arange(bits.shape[1], dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.column)
        sig = self.signature(m) if len(m) else np.empty(0, np.uint64)
        return batch.append_column("bucket", pa.array(sig.astype(np.int64)))


class LshCandidateFilter:
    """Actor-pool stage: keep rows matching ANY of L hash tables' probe sets
    (query bucket plus hamming-1 neighbors) — one pass over the corpus."""

    def __init__(self, dim: int, probes: list[set[int]], n_planes: int, seed: int, column: str):
        self.bucketers = [
            LshBucketer(dim=dim, n_planes=n_planes, seed=seed + 101 * t, column=column)
            for t in range(len(probes))
        ]
        self.probe_arrays = [pa.array(sorted(p), pa.int64()) for p in probes]
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, self.column)
        keep = np.zeros(len(batch), dtype=bool)
        for bucketer, probe in zip(self.bucketers, self.probe_arrays):
            sig = pa.array(bucketer.signature(m).astype(np.int64))
            keep |= np.asarray(pa.compute.is_in(sig, value_set=probe))
        return batch.filter(pa.array(keep))


def knn_lsh(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 4,
    column: str = "embedding",
    id_column: str = "vec_id",
    seed: int = 5,
) -> pa.Table:
    """Approximate top-k: L independent hyperplane tables; probe each query's
    bucket plus hamming-1 neighbors in every table.  Each table halves the
    corpus ~2^-p; recall grows as 1-(1-p_hit)^L (measured in tests)."""
    q = np.asarray(queries, dtype=np.float64)
    qn = _normalize(q)
    probes: list[set[int]] = []
    for t in range(n_tables):
        bucketer = LshBucketer(dim=q.shape[1], n_planes=n_planes, seed=seed + 101 * t, column=column)
        probe: set[int] = set()
        for s in bucketer.signature(qn):
            probe.add(int(s))
            for bit in range(n_planes):
                probe.add(int(s) ^ (1 << bit))
        probes.append(probe)

    candidates = ds.map_batches(
        LshCandidateFilter,
        fn_constructor_kwargs=dict(
            dim=q.shape[1], probes=probes, n_planes=n_planes, seed=seed, column=column
        ),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return knn_brute_force(candidates, queries, k=k, column=column, id_column=id_column)


def train_ivf_centroids(
    ds: ray.data.Dataset,
    n_centroids: int = 16,
    column: str = "embedding",
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 11,
) -> np.ndarray:
    """Coarse quantizer for IVF: k-means over a bounded sample (Lloyd's, on
    the driver — the sample is the broadcast-small side; at cluster scale
    the sample stays fixed-size regardless of corpus size)."""
    sample = ds.limit(sample_rows).to_pandas()
    m = _normalize(np.stack([np.asarray(e, dtype=np.float64) for e in sample[column]]))
    rng = np.random.default_rng(seed)
    cents = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(len(cents)):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def knn_ivf(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    column: str = "embedding",
    id_column: str = "vec_id",
    seed: int = 11,
) -> pa.Table:
    """IVF approximate top-k: vectors partition by nearest centroid (one
    broadcast matmul per batch); each query probes its `nprobe` nearest
    lists, so ~nprobe/n_centroids of the corpus is scanned per query."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    cents = train_ivf_centroids(ds, n_centroids, column, seed=seed)
    cents_ref = ray.put(cents)
    probe_lists = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    probe_set = pa.array(sorted({int(c) for row in probe_lists for c in row}), pa.int64())

    def keep_probed(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        m = _normalize(_batch_matrix(batch, column))
        assign = np.argmax(m @ c.T, axis=1) if len(m) else np.empty(0, np.int64)
        mask = pa.compute.is_in(pa.array(assign.astype(np.int64)), value_set=probe_set)
        return batch.filter(mask)

    candidates = ds.map_batches(keep_probed, batch_format="pyarrow")
    return knn_brute_force(candidates, queries, k=k, column=column, id_column=id_column)


def embedding_near_dup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    n_planes: int = 6,
    column: str = "embedding",
    id_column: str = "vec_id",
    seed: int = 5,
    dim: int | None = None,
) -> ray.data.Dataset:
    """Pairs with cosine >= threshold: LSH-bucket blocking, exact cosine
    verification within each bucket (the one shuffle)."""
    if dim is None:
        first = ds.take(1)
        dim = len(first[0][column])
    bucketed = ds.map_batches(
        LshBucketer,
        fn_constructor_kwargs=dict(dim=dim, n_planes=n_planes, seed=seed, column=column),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cos_sim": []})
        g = g.sort_values(id_column)
        ids = g[id_column].to_numpy()
        m = _normalize(np.stack(g[column].to_numpy()))
        sims = m @ m.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sims[ii, jj] >= threshold
        return pd.DataFrame(
            {"a": ids[ii][keep], "b": ids[jj][keep], "cos_sim": sims[ii, jj][keep]}
        )

    from ray.data.aggregate import Max

    pairs = bucketed.groupby("bucket").map_groups(verify, batch_format="pandas")
    # a pair seen in multiple buckets has the same exact cosine
    return pairs.groupby(["a", "b"]).aggregate(Max("cos_sim", alias_name="cos_sim"))
