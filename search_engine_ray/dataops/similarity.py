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
        # drop_duplicates: a candidate set from a multi-table LSH probe can
        # contain the same vector twice (identical score — keep one)
        g = (
            g.sort_values(["cos_sim", "vec_id"], ascending=[False, True])
            .drop_duplicates("vec_id")
            .head(k)
        )
        g["rank"] = np.arange(1, len(g) + 1)
        return g

    merged = partials.groupby("query_id").map_groups(merge, batch_format="pandas")
    batches = list(merged.iter_batches(batch_size=None, batch_format="pyarrow"))
    out = pa.concat_tables([pa.table(b) for b in batches]) if batches else None
    if out is None:
        return pa.table({"query_id": [], "vec_id": [], "cos_sim": [], "rank": []})
    return out.sort_by([("query_id", "ascending"), ("rank", "ascending")])


class LshBucketer:
    """Random-hyperplane signature per vector (one shuffle key for ANN).

    ``dim=None`` defers plane generation to the first batch: every actor
    derives the SAME planes from (seed, row width), so no driver-side
    ``take(1)`` is ever needed to discover the embedding dimension."""

    def __init__(self, dim: int | None, n_planes: int = 12, seed: int = 5, column: str = "embedding"):
        self.n_planes = n_planes
        self.seed = seed
        self.planes = self._make_planes(dim) if dim is not None else None
        self.column = column

    def _make_planes(self, dim: int) -> np.ndarray:
        return np.random.default_rng(self.seed).standard_normal((dim, self.n_planes))

    def signature(self, m: np.ndarray) -> np.ndarray:
        if self.planes is None:
            self.planes = self._make_planes(m.shape[1])
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
    """Approximate top-k WITHOUT a persisted index: ONE filtered pass over
    the corpus (each batch recomputes its signatures and keeps rows matching
    any table's probe set).  Right for ad-hoc single-shot queries; for
    repeated queries at scale use build_lsh_index()/knn_lsh_probe(), which
    shuffle the vectors once into bucket-partitioned parquet and then read
    ONLY the probed buckets.  L independent hyperplane tables; probe =
    query bucket + hamming-1 neighbors; recall grows as 1-(1-p_hit)^L."""
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
    """IVF approximate top-k WITHOUT a persisted index: trains centroids and
    makes ONE filtered pass over the corpus (each batch recomputes its
    assignment and keeps rows in the queries' probe lists).  Right for
    ad-hoc single-shot queries; for repeated queries at scale use
    build_ivf_index()/knn_ivf_probe(), which assign once, write inverted
    lists partitioned by centroid, and read ONLY the nprobe probed
    partitions."""
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


# --------------------------------------------------------------------------
# persisted, partitioned ANN indexes (the 100-TB path): build once, probe
# with PRUNED reads — a probe touches nprobe/n_centroids (IVF) or the probed
# bucket directories (LSH) of the corpus, never a full scan.
# --------------------------------------------------------------------------

def _parquet_files(dirs) -> list[str]:
    """Flatten partition directories into their parquet files (read_parquet
    wants file paths when given a list)."""
    import os

    out: list[str] = []
    for d in dirs:
        if os.path.isdir(d):
            out.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            )
    return out


def build_ivf_index(
    ds: ray.data.Dataset,
    index_dir: str,
    n_centroids: int = 16,
    column: str = "embedding",
    id_column: str = "vec_id",
    sample_rows: int = 10_000,
    seed: int = 11,
) -> dict:
    """Persist an IVF index: k-means centroids (trained once on a bounded
    sample) + inverted lists as parquet PARTITIONED BY centroid id, so a
    probe reads only its partitions' files.  Output layout::

        index_dir/centroids.npy        (n_centroids, dim) float64
        index_dir/meta.json            {n_centroids, dim, column, id_column}
        index_dir/lists/centroid=K/    the vectors assigned to list K

    Returns the meta dict."""
    import json
    import os

    cents = train_ivf_centroids(ds, n_centroids, column, sample_rows=sample_rows, seed=seed)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        m = _normalize(_batch_matrix(batch, column))
        a = np.argmax(m @ c.T, axis=1) if len(m) else np.empty(0, np.int64)
        return batch.append_column("centroid", pa.array(a.astype(np.int32)))

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "lists"), partition_cols=["centroid"]
    )
    np.save(os.path.join(index_dir, "centroids.npy"), cents)
    meta = {
        "n_centroids": int(len(cents)),
        "dim": int(cents.shape[1]),
        "column": column,
        "id_column": id_column,
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def knn_ivf_probe(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
) -> pa.Table:
    """Probe a persisted IVF index: read ONLY the union of the queries'
    nprobe nearest inverted lists (pruned parquet read over the partition
    directories), then exact cosine top-k over those candidates."""
    import json
    import os

    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probe_lists = np.argsort(-(q @ cents.T), axis=1)[:, : min(nprobe, len(cents))]
    probe = sorted({int(c) for row in probe_lists for c in row})
    paths = _parquet_files(
        os.path.join(index_dir, "lists", f"centroid={c}") for c in probe
    )
    if not paths:
        # every probed list is empty (heavily clustered corpus): no candidates
        return pa.table({"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                         "cos_sim": pa.array([], pa.float64()), "rank": pa.array([], pa.int64())})
    cand = ray.data.read_parquet(paths, columns=[meta["id_column"], meta["column"]])
    return knn_brute_force(cand, queries, k=k, column=meta["column"], id_column=meta["id_column"])


def _train_pq_codebooks(
    sample: np.ndarray,
    m_subspaces: int,
    n_codes: int,
    iters: int = 10,
    seed: int = 17,
) -> np.ndarray:
    """Per-subspace k-means codebooks (Jégou et al. 2011 product
    quantization, public).  Driver-side over a bounded sample — like the
    coarse quantizer, the training set stays fixed-size at any corpus
    scale.  Returns (m_subspaces, n_codes, sub_dim)."""
    n, dim = sample.shape
    sub = dim // m_subspaces
    rng = np.random.default_rng(seed)
    books = np.empty((m_subspaces, n_codes, sub), dtype=np.float64)
    for s in range(m_subspaces):
        x = sample[:, s * sub : (s + 1) * sub]
        k = min(n_codes, len(x))
        cb = x[rng.choice(len(x), size=k, replace=False)]
        for _ in range(iters):
            # L2 assignment: argmin ||x - c||^2 == argmax (x.c - ||c||^2/2)
            scores = x @ cb.T - 0.5 * np.einsum("ij,ij->i", cb, cb)
            assign = np.argmax(scores, axis=1)
            sums = np.zeros((k, sub))
            np.add.at(sums, assign, x)
            counts = np.bincount(assign, minlength=k).astype(np.float64)
            nonempty = counts > 0
            cb[nonempty] = sums[nonempty] / counts[nonempty, None]
        if k < n_codes:  # tiny sample: pad with repeats so codes stay uint8-dense
            cb = np.vstack([cb, np.repeat(cb[:1], n_codes - k, axis=0)])
        books[s] = cb
    return books


def _pq_encode(resid: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Residuals (n, dim) -> uint8 codes (n, m_subspaces), vectorized per
    subspace (one matmul against the 256-entry codebook each)."""
    m, n_codes, sub = books.shape
    codes = np.empty((len(resid), m), dtype=np.uint8)
    for s in range(m):
        x = resid[:, s * sub : (s + 1) * sub]
        cb = books[s]
        scores = x @ cb.T - 0.5 * np.einsum("ij,ij->i", cb, cb)
        codes[:, s] = np.argmax(scores, axis=1).astype(np.uint8)
    return codes


def build_ivfpq_index(
    ds: ray.data.Dataset,
    index_dir: str,
    n_centroids: int = 16,
    m_subspaces: int = 8,
    n_codes: int = 256,
    column: str = "embedding",
    id_column: str = "vec_id",
    sample_rows: int = 10_000,
    seed: int = 11,
) -> dict:
    """Persist an IVF-PQ (IVFADC) index: coarse centroids + shared
    per-subspace residual codebooks + inverted lists holding ONLY
    ``(id, m-byte code)`` rows — the memory-bounded ANN path.

    Scale story: at 10^10 x 128-d float32 the raw vectors are ~5 TB; m=8
    PQ codes are ~80 GB — inverted lists small enough to pin hot in the
    cluster object store while probes stay pruned to nprobe partitions.
    Training (coarse + codebooks) runs driver-side on a bounded sample;
    encoding is one streaming map_batches pass (two matmuls per batch).

    Layout::

        index_dir/centroids.npy    (n_centroids, dim)
        index_dir/codebooks.npy    (m_subspaces, n_codes, dim/m_subspaces)
        index_dir/meta.json
        index_dir/lists/centroid=K/   rows (id, code: m-byte binary)
    """
    import json
    import os

    sample = ds.limit(sample_rows).to_pandas()
    mat = _normalize(np.stack([np.asarray(e, dtype=np.float64) for e in sample[column]]))
    dim = mat.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    cents = train_ivf_centroids(ds, n_centroids, column, sample_rows=sample_rows, seed=seed)
    assign0 = np.argmax(mat @ cents.T, axis=1)
    books = _train_pq_codebooks(mat - cents[assign0], m_subspaces, n_codes, seed=seed + 6)
    cents_ref = ray.put(cents)
    books_ref = ray.put(books)

    def encode(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        b = ray.get(books_ref)
        m = _normalize(_batch_matrix(batch, column))
        if not len(m):
            return pa.table(
                {id_column: pa.array([], pa.int64()),
                 "code": pa.array([], pa.binary()),
                 "cent": pa.array([], pa.int32()),
                 "centroid": pa.array([], pa.int32())}
            )
        a = np.argmax(m @ c.T, axis=1)
        codes = _pq_encode(m - c[a], b)
        n, mb = codes.shape
        offsets = np.arange(0, (n + 1) * mb, mb, dtype=np.int32)
        code_arr = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(codes.tobytes())],
        )
        # "cent" duplicates the partition key INSIDE the data so probes can
        # reconstruct q.centroid per row after a path-pruned read (hive
        # partition columns vanish when reading file lists directly)
        return pa.table(
            {
                id_column: batch[id_column],
                "code": code_arr,
                "cent": pa.array(a.astype(np.int32)),
                "centroid": pa.array(a.astype(np.int32)),
            }
        )

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(encode, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "lists"), partition_cols=["centroid"]
    )
    np.save(os.path.join(index_dir, "centroids.npy"), cents)
    np.save(os.path.join(index_dir, "codebooks.npy"), books)
    meta = {
        "n_centroids": int(len(cents)),
        "m_subspaces": int(m_subspaces),
        "n_codes": int(n_codes),
        "dim": int(dim),
        "column": column,
        "id_column": id_column,
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def knn_ivfpq_probe(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
) -> pa.Table:
    """Probe a persisted IVF-PQ index with asymmetric distance computation:
    read only the probed lists' (id, code) rows, score each candidate as
    q.centroid + sum_s ADC_table[s, code_s] (two table lookups per byte —
    no decompression), partial top-k per batch, tiny final merge.

    Returns (query_id, vec_id, score, rank) — ``score`` is the PQ-
    approximate cosine; rerank against raw vectors upstream if exact
    scores are needed."""
    import json
    import os

    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    books = np.load(os.path.join(index_dir, "codebooks.npy"))
    m_sub, n_codes, sub = books.shape
    q = _normalize(np.asarray(queries, dtype=np.float64))
    n_q = len(q)
    # ADC tables (n_q, m_subspaces, n_codes): one inner product per
    # (query, subspace, code) — computed ONCE, broadcast to every task
    adc = np.einsum("qmd,mcd->qmc", np.ascontiguousarray(q.reshape(n_q, m_sub, sub)), books)
    q_cent = q @ cents.T  # (n_q, n_centroids)

    probe_lists = np.argsort(-q_cent, axis=1)[:, : min(nprobe, len(cents))]
    probe = sorted({int(c) for row in probe_lists for c in row})
    empty = pa.table(
        {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
         "score": pa.array([], pa.float64()), "rank": pa.array([], pa.int64())}
    )
    paths = _parquet_files(
        os.path.join(index_dir, "lists", f"centroid={c}") for c in probe
    )
    if not paths:
        return empty

    id_col = meta["id_column"]
    adc_ref = ray.put(adc)
    qcent_ref = ray.put(q_cent)

    def score_batch(batch: pa.Table) -> pa.Table:
        a = ray.get(adc_ref)
        qc = ray.get(qcent_ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        if not len(ids):
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        code_col = batch["code"].combine_chunks() if isinstance(batch["code"], pa.ChunkedArray) else batch["code"]
        codes = np.frombuffer(b"".join(code_col.to_pylist()), dtype=np.uint8).reshape(len(ids), m_sub)
        cent = np.asarray(batch["cent"], dtype=np.int64)
        # every query scores the union of probed lists (a superset of its
        # own probes — only helps recall); score = q.centroid + ADC sum
        sc = qc[:, cent]  # (n_q, n)
        for s in range(m_sub):
            sc = sc + a[:, s, :][:, codes[:, s]]
        kk = min(k, len(ids))
        out_q, out_id, out_s = [], [], []
        for qi in range(len(a)):
            idx = np.lexsort((ids, -sc[qi]))[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_id.append(ids[idx])
            out_s.append(sc[qi][idx])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_id)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    cand = ray.data.read_parquet(paths, columns=[id_col, "code", "cent"])
    partials = cand.map_batches(score_batch, batch_format="pyarrow", batch_size=8192)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.sort_values(["score", "vec_id"], ascending=[False, True])
            .drop_duplicates("vec_id")
            .head(k)
        )
        g["rank"] = np.arange(1, len(g) + 1)
        return g

    merged = partials.groupby("query_id").map_groups(merge, batch_format="pandas")
    batches = list(merged.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        return empty
    out = pa.concat_tables([pa.table(b) for b in batches])
    return out.sort_by([("query_id", "ascending"), ("rank", "ascending")])


def build_lsh_index(
    ds: ray.data.Dataset,
    index_dir: str,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 2,
    column: str = "embedding",
    id_column: str = "vec_id",
    seed: int = 5,
) -> dict:
    """Persist an LSH index: vectors written once per hash table, parquet
    PARTITIONED BY (table, bucket); a probe reads only the probed bucket
    directories.  Storage is n_tables x the corpus — the standard LSH
    recall/space trade."""
    import json
    import os

    bucketers = [
        LshBucketer(dim=dim, n_planes=n_planes, seed=seed + 101 * t, column=column)
        for t in range(n_tables)
    ]

    def tag(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, column)
        parts = []
        for t, bk in enumerate(bucketers):
            sig = bk.signature(m) if len(m) else np.empty(0, np.uint64)
            parts.append(
                batch.append_column("table", pa.array(np.full(len(batch), t, np.int32)))
                .append_column("bucket", pa.array(sig.astype(np.int64)))
            )
        return pa.concat_tables(parts)

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "buckets"), partition_cols=["table", "bucket"]
    )
    meta = {
        "n_planes": n_planes,
        "n_tables": n_tables,
        "dim": dim,
        "seed": seed,
        "column": column,
        "id_column": id_column,
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def knn_lsh_probe(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    hamming: int = 1,
) -> pa.Table:
    """Probe a persisted LSH index: for each table read the queries' bucket
    directories (plus hamming<=1 neighbors), union candidates, exact cosine
    top-k.  A vector found in several tables is deduplicated before
    ranking."""
    import json
    import os

    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    paths = []
    for t in range(meta["n_tables"]):
        bk = LshBucketer(
            dim=meta["dim"], n_planes=meta["n_planes"],
            seed=meta["seed"] + 101 * t, column=meta["column"],
        )
        probe: set[int] = set()
        for s in bk.signature(q):
            probe.add(int(s))
            if hamming >= 1:
                for bit in range(meta["n_planes"]):
                    probe.add(int(s) ^ (1 << bit))
        paths.extend(
            _parquet_files(
                os.path.join(index_dir, "buckets", f"table={t}", f"bucket={b}")
                for b in sorted(probe)
            )
        )
    id_col, col = meta["id_column"], meta["column"]
    if not paths:
        return pa.table({"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                         "cos_sim": pa.array([], pa.float64()), "rank": pa.array([], pa.int64())})
    cand = ray.data.read_parquet(paths, columns=[id_col, col])
    return knn_brute_force(cand, queries, k=k, column=col, id_column=id_col)


def embedding_near_dup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    n_planes: int = 6,
    column: str = "embedding",
    id_column: str = "vec_id",
    seed: int = 5,
    dim: int | None = None,
    max_bucket: int = 20_000,
) -> ray.data.Dataset:
    """Pairs with cosine >= threshold: LSH-bucket blocking, exact cosine
    verification within each bucket (the one shuffle).

    Buckets larger than ``max_bucket`` are dropped with a warning — the
    same skew guard as ``dedup.minhash_lsh_pairs``: a degenerate bucket of
    near-identical embeddings is O(m^2) pairs and would stall one worker at
    corpus scale; run exact dedup first.  ``dim`` is only needed to
    pre-build the hyperplanes; when omitted the bucketer derives it from
    the first batch (no driver-side ``take``)."""
    bucketed = ds.map_batches(
        LshBucketer,
        fn_constructor_kwargs=dict(dim=dim, n_planes=n_planes, seed=seed, column=column),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    import logging

    log = logging.getLogger(__name__)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cos_sim": []})
        if len(g) > max_bucket:
            log.warning(
                "embedding_near_dup: dropped LSH bucket of %d rows > max_bucket=%d "
                "(degenerate near-identical cluster; run exact dedup first)",
                len(g), max_bucket,
            )
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
    out = pairs.groupby(["a", "b"]).aggregate(Max("cos_sim", alias_name="cos_sim"))
    # schema-stable even when NO pairs clear the threshold (an aggregate of
    # an empty dataset loses its schema otherwise)
    empty = ray.data.from_arrow(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                  "cos_sim": pa.array([], pa.float64())})
    )
    return out.union(empty)


# --------------------------------------------------------------------------
# MMR diversity re-ranking
# --------------------------------------------------------------------------


def mmr_rerank(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    lam: float = 0.5,
    n_candidates: int = 100,
    column: str = "embedding",
    id_column: str = "vec_id",
) -> pa.Table:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick k of the top-``n_candidates`` cosine hits,
    trading relevance against redundancy —
    ``argmax lam*sim(q,d) - (1-lam)*max_{s in picked} sim(d,s)``.
    ``lam=1`` degenerates to the plain cosine ranking; smaller ``lam``
    spreads picks across clusters (the RAG context-diversification /
    search-result-diversification step).

    Scale shape: candidate retrieval is the distributed exact top-n
    (``knn_brute_force`` — broadcast query, per-batch partial top-k);
    candidate vectors come back in ONE filtered streaming pass
    (vectorized ``isin`` against the broadcast id set).  Only the greedy
    loop — inherently sequential, k iterations over an
    (n_candidates x n_candidates) sim matrix — runs on the driver, over
    a bounded n_candidates x dim slice, never the corpus.  Ties break by
    ascending id; with float sims equal only on identical vectors, the
    result is partition-invariant."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"mmr_rerank: lam must be in [0, 1] (got {lam})")
    if k < 1 or n_candidates < k:
        raise ValueError(
            f"mmr_rerank: need 1 <= k <= n_candidates (got k={k}, "
            f"n_candidates={n_candidates})"
        )
    q = np.asarray(query, dtype=np.float64).reshape(1, -1)
    cand = knn_brute_force(ds, q, k=n_candidates, column=column, id_column=id_column)
    cand_ids = np.asarray(cand[id_column], dtype=np.int64)
    if len(cand_ids) == 0:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                id_column: pa.array([], pa.int64()),
                "mmr_score": pa.array([], pa.float64()),
            }
        )
    ids_ref = ray.put(np.sort(cand_ids))

    def fetch(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        ids = np.asarray(batch[id_column], dtype=np.int64)
        pos = np.searchsorted(wanted, ids)
        pos[pos >= len(wanted)] = 0
        mask = wanted[pos] == ids
        return batch.filter(pa.array(mask)).select([id_column, column])

    rows = ds.map_batches(fetch, batch_format="pyarrow").take_all()
    got_ids = np.asarray([r[id_column] for r in rows], dtype=np.int64)
    emb = _normalize(
        np.stack([np.asarray(r[column], dtype=np.float64) for r in rows])
    )
    # align to candidate rank order (knn output is (score desc, id asc))
    order = {int(v): i for i, v in enumerate(got_ids)}
    emb = emb[[order[int(v)] for v in cand_ids]]
    qn = _normalize(q)[0]
    sim_q = emb @ qn
    pair = emb @ emb.T
    n = len(cand_ids)
    picked: list[int] = []
    picked_scores: list[float] = []
    max_red = np.full(n, -np.inf)
    alive = np.ones(n, dtype=bool)
    for _ in range(min(k, n)):
        if picked:
            score = lam * sim_q - (1.0 - lam) * max_red
        else:
            # empty picked set: redundancy term is 0, so the first score
            # is lam*sim_q — SAME SCALE as every later rank (argmax over
            # lam*sim is argmax over sim, so the pick is the cosine top-1
            # either way)
            score = lam * sim_q
        score[~alive] = -np.inf
        # argmax; score ties break toward relevance, then ascending id
        # (keeps the first pick = cosine top-1 even at lam=0)
        sq = np.where(alive, sim_q, -np.inf)
        best = np.lexsort((cand_ids, -sq, -score))[0]
        picked.append(best)
        picked_scores.append(float(score[best]))
        alive[best] = False
        np.maximum(max_red, pair[:, best], out=max_red)
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(picked) + 1, dtype=np.int64)),
            id_column: pa.array(cand_ids[picked]),
            "mmr_score": pa.array(np.asarray(picked_scores, dtype=np.float64)),
        }
    )


def hard_negatives(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_labels: np.ndarray,
    k: int = 10,
    column: str = "embedding",
    id_column: str = "vec_id",
    label_column: str = "label",
) -> pa.Table:
    """Hard-negative mining for contrastive training: for each anchor,
    the exact cosine top-k among vectors whose label DIFFERS from the
    anchor's.  Same distributed shape as knn_brute_force — anchors
    broadcast once via ray.put, per-batch vectorized partial top-k (the
    label mask is one extra compare per batch), per-anchor merge bounded
    at k rows per batch per anchor.  Returns (query_id, vec_id, cos_sim,
    rank) ranked desc, ties ascending vec_id."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    ql = np.asarray(query_labels)
    if len(qn) != len(ql):
        raise ValueError(
            f"queries ({len(qn)}) and query_labels ({len(ql)}) disagree"
        )
    q_ref = ray.put((qn, ql))

    def partial_topk(batch: pa.Table) -> pa.Table:
        q, labels_q = ray.get(q_ref)
        emb = _normalize(_batch_matrix(batch, column))
        ids = np.asarray(batch[id_column], dtype=np.int64)
        labels = np.asarray(batch[label_column])
        sims = emb @ q.T  # (n, Q)
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[1]):
            neg = labels != labels_q[qi]
            if not neg.any():
                continue
            s = sims[neg, qi]
            nid = ids[neg]
            idx = np.lexsort((nid, -s))[: min(k, len(nid))]
            out_q.append(np.full(len(idx), qi, dtype=np.int64))
            out_id.append(nid[idx])
            out_s.append(s[idx])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cos_sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_id)),
                "cos_sim": pa.array(np.concatenate(out_s)),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow", batch_size=4096)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.sort_values(["cos_sim", "vec_id"], ascending=[False, True])
            .drop_duplicates("vec_id")
            .head(k)
        )
        g["rank"] = np.arange(1, len(g) + 1)
        return g

    merged = partials.groupby("query_id").map_groups(merge, batch_format="pandas")
    batches = list(merged.iter_batches(batch_size=None, batch_format="pyarrow"))
    out = pa.concat_tables([pa.table(b) for b in batches]) if batches else None
    if out is None:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cos_sim": pa.array([], pa.float64()),
                "rank": pa.array([], pa.int64()),
            }
        )
    return out.sort_by([("query_id", "ascending"), ("rank", "ascending")])


def quantize_embeddings(
    ds: ray.data.Dataset,
    column: str = "embedding",
    id_column: str = "vec_id",
    scale: float = 127.0,
    out_column: str = "q",
) -> ray.data.Dataset:
    """Symmetric int8 scalar quantization (the SQ8 vector-compression
    storage path: 4x smaller than float32, the standard ANN-index
    companion): per component ``clamp(floor(x * scale + 0.5), -127,
    127)`` — float32 widened exactly to float64 first, so the expression
    is bit-reproducible by a SQL oracle.  One stateless vectorized
    ``map_batches`` pass; output keeps (id, quantized list<int8>)."""

    def run(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(pc.list_flatten(col), dtype=np.float64)
        q = np.clip(np.floor(flat * scale + 0.5), -127, 127).astype(np.int8)
        # rebuild offsets from lengths (col.offsets of a SLICED array
        # reference the unsliced values buffer and would misalign)
        lens = np.asarray(pc.list_value_length(col), dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        return pa.table(
            {
                id_column: batch[id_column].cast(pa.int64()),
                out_column: pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()), pa.array(q, pa.int8())
                ),
            }
        )

    return ds.map_batches(run, batch_format="pyarrow")


def knn_self_join(
    ds: ray.data.Dataset,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    column: str = "embedding",
    id_column: str = "vec_id",
    seed: int = 11,
    max_bucket: int = 50_000,
) -> ray.data.Dataset:
    """Approximate k nearest neighbors for EVERY row — the all-rows ANN
    join behind semantic dedup and hard-negative mining — without the
    N^2 pass: IVF-bucketed.

    Each row enters the exchange twice-ish: once as the OWNER of its
    nearest-centroid bucket, and once per PROBE bucket (its nprobe
    nearest centroids; the first probe coincides with ownership, so a
    row moves nprobe rows total).  Within a bucket the probe x owner
    similarity is one vectorized matmul with per-probe top-k
    (score desc, id asc); ONE id-keyed groupby then merges per-bucket
    partials into global top-k.  Every candidate pair is scored in
    exactly one bucket (the owner's), so results are
    partition-invariant.  Buckets above ``max_bucket`` are dropped with
    a warning (skew cap, same policy as the LSH/minhash stages).
    Output: streaming Dataset (query_id, vec_id, cos_sim, rank)."""
    if nprobe < 1 or nprobe > n_centroids:
        raise ValueError("need 1 <= nprobe <= n_centroids")
    cents = train_ivf_centroids(ds, n_centroids, column, seed=seed)
    cents_ref = ray.put(cents)

    def explode(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        m = _normalize(_batch_matrix(batch, column))
        ids = np.asarray(batch[id_column], dtype=np.int64)
        if len(ids) == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "qid": pa.array([], pa.int64()),
                    "own": pa.array([], pa.bool_()),
                    "vec": pa.array([], pa.list_(pa.float64())),
                }
            )
        sims = m @ c.T
        order = np.argsort(-sims, axis=1)[:, :nprobe]  # (n, nprobe)
        buckets, qids, owns, vec_idx = [], [], [], []
        for j in range(order.shape[1]):
            buckets.append(order[:, j].astype(np.int64))
            qids.append(ids)
            owns.append(np.full(len(ids), j == 0))
            vec_idx.append(np.arange(len(ids)))
        vecs = pa.array(list(m), pa.list_(pa.float64()))
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(buckets)),
                "qid": pa.array(np.concatenate(qids)),
                "own": pa.array(np.concatenate(owns)),
                "vec": vecs.take(pa.array(np.concatenate(vec_idx))),
            }
        )

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "vec_id": pd.Series([], dtype=np.int64),
                "cos_sim": pd.Series([], dtype=np.float64),
            }
        )
        if len(g) < 2:
            return empty
        if len(g) > max_bucket:
            import logging

            logging.getLogger(__name__).warning(
                "knn_self_join bucket %s exceeds max_bucket=%d (%d rows) — dropped",
                g["bucket"].iloc[0], max_bucket, len(g),
            )
            return empty
        own_mask = g["own"].to_numpy(bool)
        owners = g[own_mask]
        if len(owners) == 0:
            return empty
        o_ids = owners["qid"].to_numpy(np.int64)
        o_m = np.stack(owners["vec"].to_numpy())
        p_ids = g["qid"].to_numpy(np.int64)
        p_m = np.stack(g["vec"].to_numpy())
        out_q, out_id, out_s = [], [], []
        kk = min(k, len(o_ids))
        # chunk the probe side so the similarity matrix stays ~128 MB even
        # at the bucket cap (a 50k x 50k float64 matmul would be 20 GB)
        chunk = max(1, (1 << 24) // max(len(o_ids), 1))
        for c0 in range(0, len(p_ids), chunk):
            sims = p_m[c0 : c0 + chunk] @ o_m.T  # (chunk, O)
            for ci in range(sims.shape[0]):
                pi = c0 + ci
                s = sims[ci]
                not_self = o_ids != p_ids[pi]
                cand_ids, cand_s = o_ids[not_self], s[not_self]
                if len(cand_ids) == 0:
                    continue
                idx = np.lexsort((cand_ids, -cand_s))[:kk]
                out_q.append(np.full(len(idx), p_ids[pi], dtype=np.int64))
                out_id.append(cand_ids[idx])
                out_s.append(cand_s[idx])
        if not out_q:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "vec_id": np.concatenate(out_id),
                "cos_sim": np.concatenate(out_s),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.sort_values(["cos_sim", "vec_id"], ascending=[False, True])
            .drop_duplicates("vec_id")
            .head(k)
        )
        out = pd.DataFrame(
            {
                "query_id": g["query_id"].to_numpy(np.int64),
                "vec_id": g["vec_id"].to_numpy(np.int64),
                "cos_sim": g["cos_sim"].to_numpy(np.float64),
            }
        )
        out["rank"] = np.arange(1, len(out) + 1)
        return out

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )
