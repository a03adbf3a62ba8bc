"""Deduplication operators for large-scale training-data pipelines.

All operators are Ray-Data-first: vectorized `map_batches` per-batch
kernels followed by the ONE shuffle each needs (hash-keyed groupby).
Nothing materializes the corpus on the driver.

- exact_dedup      : content-hash (md5) partial per batch -> groupby(hash)
                     -> keep min doc_id + count (hash-partition + first).
- minhash_lsh      : word-shingle -> vectorized 64-perm MinHash ->
                     banded LSH -> bucket groupby -> signature-verified
                     near-dup pairs (shingle->minhash->band->bucket groupby).
- simhash          : 64-bit SimHash per doc (vectorized bit-count kernel).
- ngram_jaccard    : exact n-gram Jaccard similar pairs via shingle
                     explode + co-occurrence counting (bounded by shingle
                     document frequency to stay skew-safe).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_MERSENNE = np.uint64((1 << 61) - 1)


def _token_lists(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat token hashes uint64, doc offsets) — whitespace tokens."""
    lists = pc.split_pattern_regex(pc.fill_null(texts, ""), pattern=r"\s+")
    flat = pc.list_flatten(lists)
    flat = flat.filter(pc.greater(pc.binary_length(flat), 0))
    # cheap 64-bit token hash: FNV-1a over utf-8, vectorized via python loop
    # on the *dictionary* (unique tokens) only
    denc = pc.dictionary_encode(flat)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    uniq = denc.dictionary.to_pylist()
    uh = np.fromiter(
        (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little") for t in uniq),
        dtype=np.uint64,
        count=len(uniq),
    )
    codes = np.asarray(denc.indices, dtype=np.int64)
    tok_hash = uh[codes] if len(codes) else np.empty(0, np.uint64)

    # recompute doc boundaries post-filter
    lens_pre = np.asarray(pc.list_value_length(lists), dtype=np.int64)
    # count empties per doc to subtract
    flat_all = pc.list_flatten(lists)
    empty = np.asarray(pc.equal(pc.binary_length(flat_all), 0))
    doc_idx_all = np.repeat(np.arange(len(lens_pre)), lens_pre)
    empties_per_doc = np.bincount(doc_idx_all[empty], minlength=len(lens_pre)) if empty.any() else np.zeros(len(lens_pre), np.int64)
    lens = lens_pre - empties_per_doc
    offsets = np.concatenate(([0], np.cumsum(lens)))
    return tok_hash, offsets


def _shingle_hashes(tok_hash: np.ndarray, offsets: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Distinct rolling k-gram shingle hashes per doc — fully vectorized
    over the whole batch: one k-pass rolling hash over the flat token
    array, a boundary mask dropping windows that span documents, and a
    lexsort+unique pass replacing any per-doc Python loop."""
    n_docs = len(offsets) - 1
    n = len(tok_hash)
    mult = np.uint64(0x9E3779B97F4A7C15)
    doc_lens = np.diff(offsets)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), doc_lens)

    parts_doc = []
    parts_hash = []
    if n >= k:
        with np.errstate(over="ignore"):
            acc = tok_hash[: n - k + 1].copy()
            for j in range(1, k):
                acc = acc * mult + tok_hash[j : n - k + 1 + j]
        # a window starting at i is valid iff it stays inside one doc
        valid = doc_idx[: n - k + 1] == doc_idx[k - 1 :]
        parts_doc.append(doc_idx[: n - k + 1][valid])
        parts_hash.append(acc[valid])

    # docs shorter than k get one fallback shingle (xor of tokens * mult;
    # empty docs get 0) — same values the scalar version produced
    short = np.flatnonzero(doc_lens < k)
    if len(short):
        with np.errstate(over="ignore"):
            fallback = np.zeros(len(short), dtype=np.uint64)
            nonempty = doc_lens[short] > 0
            if nonempty.any():
                idx = short[nonempty]
                # short docs are rare (< k tokens); a tiny per-doc loop is fine
                xors = np.asarray(
                    [np.bitwise_xor.reduce(tok_hash[offsets[d] : offsets[d + 1]]) for d in idx],
                    dtype=np.uint64,
                )
                fallback[nonempty] = xors * mult
        parts_doc.append(short)
        parts_hash.append(fallback)

    if not parts_hash:
        return np.empty(0, np.uint64), np.zeros(n_docs + 1, dtype=np.int64)

    all_doc = np.concatenate(parts_doc)
    all_hash = np.concatenate(parts_hash)
    order = np.lexsort((all_hash, all_doc))
    d_sorted = all_doc[order]
    h_sorted = all_hash[order]
    keep = np.empty(len(order), dtype=bool)
    keep[0] = True
    np.logical_or(
        d_sorted[1:] != d_sorted[:-1], h_sorted[1:] != h_sorted[:-1], out=keep[1:]
    )
    d_u = d_sorted[keep]
    h_u = h_sorted[keep]
    sh_lens = np.bincount(d_u, minlength=n_docs)
    return h_u, np.concatenate(([0], np.cumsum(sh_lens)))


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def add_content_hash(batch: pa.Table, text_column: str = "text") -> pa.Table:
    texts = batch[text_column].to_pylist()
    hashes = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column("dup_key", pa.array(hashes, pa.string()))


def exact_dedup(ds: ray.data.Dataset, text_column: str = "text", id_column: str = "doc_id") -> ray.data.Dataset:
    """One row per distinct content: (dup_key, keep_doc_id=min id, n_copies).

    Native groupby aggregates (no per-group Python) — hash-partition +
    min/count is the whole operator."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        add_content_hash, fn_kwargs=dict(text_column=text_column), batch_format="pyarrow"
    ).select_columns(["dup_key", id_column])
    agg = hashed.groupby("dup_key").aggregate(
        Min(id_column, alias_name="keep_doc_id"),
        Count(alias_name="n_copies"),
    )
    return agg


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------

class MinHasher:
    """Actor-pool stage: per batch emit (band, band_hash, doc_id, sig...)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3, text_column: str = "text", id_column: str = "doc_id", seed: int = 13):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.text_column = text_column
        self.id_column = id_column

    def signatures(self, texts: pa.Array) -> np.ndarray:
        tok, offs = _token_lists(texts)
        sh, sh_offs = _shingle_hashes(tok, offs, self.shingle_k)
        n_docs = len(sh_offs) - 1
        sigs = np.full((n_docs, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        if len(sh):
            with np.errstate(over="ignore"):
                hashed = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
            nonempty = np.flatnonzero(np.diff(sh_offs) > 0)
            starts = sh_offs[nonempty]
            mins = np.minimum.reduceat(hashed, starts, axis=1)
            sigs[nonempty] = mins.T
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].combine_chunks() if isinstance(batch[self.text_column], pa.ChunkedArray) else batch[self.text_column]
        ids = np.asarray(batch[self.id_column], dtype=np.int64)
        sigs = self.signatures(texts)
        n = len(ids)
        r = self.rows_per_band
        rows = {
            "band": np.repeat(np.arange(self.bands, dtype=np.int32), n),
            "band_hash": np.empty(self.bands * n, dtype=np.uint64),
            "doc_id": np.tile(ids, self.bands),
        }
        sig_bytes = []
        for bd in range(self.bands):
            seg = sigs[:, bd * r: (bd + 1) * r]
            with np.errstate(over="ignore"):
                bh = np.bitwise_xor.reduce(seg * np.uint64(0xC2B2AE3D27D4EB4F), axis=1)
            rows["band_hash"][bd * n: (bd + 1) * n] = bh
        for i in range(n):
            sig_bytes.append(sigs[i].tobytes())
        return pa.table(
            {
                "band": pa.array(rows["band"]),
                "band_hash": pa.array(rows["band_hash"].astype(np.int64)),
                "doc_id": pa.array(rows["doc_id"]),
                "sig": pa.array(sig_bytes * self.bands, pa.binary()),
            }
        )


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.7,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """Near-dup candidate pairs verified by signature-estimated Jaccard.

    shingle -> minhash -> band -> bucket groupby; each bucket yields pairs,
    verified by the full signatures carried with the rows.  Buckets are the
    only shuffle; pair output is deduplicated downstream by (a, b) groupby.
    """
    from ray.data.aggregate import Count, Max

    banded = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, bands=bands, shingle_k=shingle_k,
            text_column=text_column, id_column=id_column,
        ),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    # two consumers below (bucket counts + pair extraction) — pin the banded
    # rows once instead of recomputing the signatures per consumer
    banded = banded.materialize()

    # Most buckets are singletons: count per bucket natively, broadcast the
    # small >=2 key set, and run the per-group pair kernel only on survivors
    # (avoids per-group Python over millions of empty buckets).
    counts = banded.groupby(["band", "band_hash"]).aggregate(Count(alias_name="n"))
    hot = counts.filter(expr="n >= 2").select_columns(["band", "band_hash"]).to_pandas()
    hot_keys = set(zip(hot["band"].tolist(), hot["band_hash"].tolist()))
    hot_ref = ray.put(hot_keys)

    def keep_hot(batch: pa.Table) -> pa.Table:
        keys = ray.get(hot_ref)
        b = batch["band"].to_pylist()
        h = batch["band_hash"].to_pylist()
        mask = pa.array([(bi, hi) in keys for bi, hi in zip(b, h)])
        return batch.filter(mask)

    banded = banded.map_batches(keep_hot, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        ids = g["doc_id"].to_numpy()
        sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in g["sig"]])
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            eq = (sigs[i + 1:] == sigs[i]).mean(axis=1)
            keep = np.flatnonzero(eq >= threshold)
            for kk in keep:
                out_a.append(int(ids[i]))
                out_b.append(int(ids[i + 1 + kk]))
                out_j.append(float(eq[kk]))
        return pd.DataFrame({"a": out_a, "b": out_b, "est_jaccard": out_j})

    pairs = banded.groupby(["band", "band_hash"]).map_groups(bucket_pairs, batch_format="pandas")
    # a pair found in several bands carries the same signature estimate
    return pairs.groupby(["a", "b"]).aggregate(Max("est_jaccard", alias_name="est_jaccard"))


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash_batch(batch: pa.Table, text_column: str = "text", id_column: str = "doc_id") -> pa.Table:
    texts = batch[text_column].combine_chunks() if isinstance(batch[text_column], pa.ChunkedArray) else batch[text_column]
    tok, offs = _token_lists(texts)
    n_docs = len(offs) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(tok):
        bits = np.unpackbits(tok.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        signed = bits.astype(np.int32) * 2 - 1  # (n_tokens, 64) in {-1, +1}
        doc_sums = np.add.reduceat(signed, offs[:-1], axis=0)
        doc_sums[np.diff(offs) == 0] = 0
        bitvals = (doc_sums > 0).astype(np.uint64)
        out = (bitvals << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    return pa.table(
        {
            "doc_id": batch[id_column],
            "simhash": pa.array(out.astype(np.int64)),
        }
    )


def simhash(ds: ray.data.Dataset, text_column: str = "text", id_column: str = "doc_id") -> ray.data.Dataset:
    return ds.map_batches(
        simhash_batch, fn_kwargs=dict(text_column=text_column, id_column=id_column), batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard pairs
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int = 256,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """Exact word-n-gram Jaccard >= threshold pairs.

    Explode distinct shingles -> groupby(shingle) -> within-group pairs
    (groups larger than max_shingle_df are dropped and logged as too common
    to be discriminative — the skew guard) -> groupby(pair) count ->
    jaccard = co / (|A| + |B| - co).
    """

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch[text_column].combine_chunks() if isinstance(batch[text_column], pa.ChunkedArray) else batch[text_column]
        ids = np.asarray(batch[id_column], dtype=np.int64)
        tok, offs = _token_lists(texts)
        sh, sh_offs = _shingle_hashes(tok, offs, n)
        lens = np.diff(sh_offs)
        return pa.table(
            {
                "shingle": pa.array(sh.astype(np.int64)),
                "doc_id": pa.array(np.repeat(ids, lens)),
                "set_size": pa.array(np.repeat(lens, lens).astype(np.int64)),
            }
        )

    shingles = ds.map_batches(explode, batch_format="pyarrow")

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2 or len(g) > max_shingle_df:
            return pd.DataFrame({"a": [], "b": [], "size_a": [], "size_b": []})
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sizes = g["set_size"].to_numpy()
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame(
            {"a": ids[ii], "b": ids[jj], "size_a": sizes[ii], "size_b": sizes[jj]}
        )

    from ray.data.aggregate import Count, Min

    pairs = shingles.groupby("shingle").map_groups(group_pairs, batch_format="pandas")
    co = pairs.groupby(["a", "b"]).aggregate(
        Count(alias_name="co"),
        Min("size_a", alias_name="sa"),
        Min("size_b", alias_name="sb"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["co"], dtype=np.float64)
        sa = np.asarray(batch["sa"], dtype=np.int64)
        sb = np.asarray(batch["sb"], dtype=np.int64)
        j = c / (sa + sb - c)
        keep = j >= threshold
        return pa.table(
            {
                "a": pa.array(np.asarray(batch["a"], dtype=np.int64)[keep]),
                "b": pa.array(np.asarray(batch["b"], dtype=np.int64)[keep]),
                "jaccard": pa.array(j[keep]),
            }
        )

    return co.map_batches(finish, batch_format="pyarrow")
