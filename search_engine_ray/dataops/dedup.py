"""Deduplication operators for large-scale training-data pipelines.

All operators are Ray-Data-first: vectorized `map_batches` per-batch
kernels followed by the ONE shuffle each needs (hash-keyed groupby).
Nothing materializes the corpus on the driver.

- exact_dedup         : content-hash (md5) partial per batch -> groupby
                        -> keep min doc_id + count (hash-partition + first).
- exact_dedup_apply   : survivor corpus via native left_semi join.
- minhash_signatures /
  minhash_lsh_pairs   : word-shingle -> vectorized 64-perm MinHash ->
                        payload-free banded LSH (one ~20 B/row shuffle) ->
                        coarse-key vectorized bucket groups (max_bucket
                        skew cap) -> candidate pairs verified against the
                        persisted/pinned signature table via two native
                        hash-joins.
- near_dup_filter     : greedy (anti-join pair drop) or exact (connected
                        components) survivor reduction.
- connected_components: iterative min-label propagation over a pair graph
                        (join+groupby rounds ~ diameter).
- simhash             : 64-bit SimHash per doc (vectorized bit kernel;
                        md5be token hash — SQL-reproducible).
- ngram_jaccard       : exact n-gram Jaccard pairs via shingle explode +
                        co-occurrence counting (bounded by shingle
                        document frequency to stay skew-safe).
- paragraph_dedup     : corpus-wide paragraph-level exact dedup (explode +
                        md5 + ONE native groupby min/count) — the
                        boilerplate killer document dedup misses.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..text.ws import WS_RE

_MERSENNE = np.uint64((1 << 61) - 1)


def _join_parts(requested: int) -> int:
    """Cap hash-join partition count by cluster CPUs: each `Dataset.join`
    reserves ~num_partitions aggregator actors, and a pipeline with two
    concurrent joins deadlocks when their combined reservation exceeds the
    cluster (observed at num_cpus=4 with 16+16).  Half the CPUs per join
    keeps two joins schedulable; at real cluster scale the requested count
    wins."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(requested, cpus // 2))


def _token_lists(texts: pa.Array, hash_kind: str = "blake2b") -> tuple[np.ndarray, np.ndarray]:
    """(flat token hashes uint64, doc offsets) — whitespace tokens.

    hash_kind "blake2b" (default, fastest) or "md5be" (first 8 md5 bytes,
    big-endian — SQL-reproducible: ``('0x' || substr(md5(t),1,16))::UBIGINT``
    in DuckDB; used by simhash so its output is oracle-checkable)."""
    lists = pc.split_pattern_regex(pc.fill_null(texts, ""), pattern=WS_RE)
    flat = pc.list_flatten(lists)
    flat = flat.filter(pc.greater(pc.binary_length(flat), 0))
    # cheap 64-bit token hash, vectorized via python loop on the
    # *dictionary* (unique tokens) only
    denc = pc.dictionary_encode(flat)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    uniq = denc.dictionary.to_pylist()
    if hash_kind == "md5be":
        gen = (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") for t in uniq)
    else:
        gen = (
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
            for t in uniq
        )
    uh = np.fromiter(gen, dtype=np.uint64, count=len(uniq))
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


def _shingle_hashes(
    tok_hash: np.ndarray, offsets: np.ndarray, k: int, short_mode: str = "drop"
) -> tuple[np.ndarray, np.ndarray]:
    """Distinct rolling k-gram shingle hashes per doc — fully vectorized
    over the whole batch: one k-pass rolling hash over the flat token
    array, a boundary mask dropping windows that span documents, and a
    lexsort+unique pass replacing any per-doc Python loop.

    ``short_mode`` controls docs with fewer than k tokens (ADVICE r1 — the
    old xor fallback was order-insensitive and reported permuted/empty short
    docs as jaccard-1.0 dups):

    - "drop": they contribute NO shingles (matches the SQL n-gram
      semantics, which generates no windows for short docs);
    - "whole": each nonempty short doc gets ONE shingle — the same rolling
      hash over all its tokens (order- and multiplicity-sensitive), so
      MinHash still covers short docs; empty docs always contribute nothing.
    """
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

    if short_mode == "whole":
        # nonempty docs shorter than k: one order-sensitive rolling hash
        # over all their tokens (short docs are rare; tiny per-doc loop)
        short = np.flatnonzero((doc_lens < k) & (doc_lens > 0))
        if len(short):
            with np.errstate(over="ignore"):
                vals = np.empty(len(short), dtype=np.uint64)
                for i, d in enumerate(short):
                    seg = tok_hash[offsets[d] : offsets[d + 1]]
                    acc1 = seg[0]
                    for t in seg[1:]:
                        acc1 = acc1 * mult + t
                    vals[i] = acc1
            parts_doc.append(short)
            parts_hash.append(vals)
    elif short_mode != "drop":
        raise ValueError(f"unknown short_mode {short_mode!r}")

    if not parts_hash:
        return np.empty(0, np.uint64), np.zeros(n_docs + 1, dtype=np.int64)

    all_doc = np.concatenate(parts_doc)
    all_hash = np.concatenate(parts_hash)
    if len(all_hash) == 0:
        # n >= k overall but every window crossed a doc boundary (all docs
        # shorter than k under short_mode="drop")
        return np.empty(0, np.uint64), np.zeros(n_docs + 1, dtype=np.int64)
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
    """Append dup_key = md5 hex of the UTF-8 text.  The md5 runs directly
    over memoryview slices of the Arrow value buffer — no Python-string
    materialization or re-encoding (the bytes already sit UTF-8 in the
    buffer); hashing cost itself is irreducible in pure Python."""
    col = batch[text_column]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    col = pc.fill_null(col, "")
    if col.type == pa.large_string():
        col = col.cast(pa.string())
    # value offsets honour the array's own slice offset
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32, count=len(col) + 1 + col.offset)[
        col.offset :
    ]
    mv = memoryview(col.buffers()[2])
    hashes = [hashlib.md5(mv[s:e]).hexdigest() for s, e in zip(offs[:-1], offs[1:])]
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


def latest_per_key(
    ds: ray.data.Dataset,
    key_column: str,
    ts_column: str,
    id_column: str = "doc_id",
    join_partitions: int = 16,
) -> ray.data.Dataset:
    """Newest capture per key — the Common-Crawl "latest version per url"
    pre-stage (a crawl holds many captures of one url; training corpora
    keep the most recent, ties broken by the highest id).

    Returns one row per key: (key_column, ts_column = max ts,
    keep_<id_column> = max id among the rows carrying that max ts).

    Shape: argmax is not a native Ray aggregate, so it decomposes into
    two native aggregates and one inner hash-join, all over KEY-sized
    projections (never the payload):

      1. ``groupby(key, ts).Max(id)`` — collapses same-instant captures;
         rows out = distinct (key, ts) pairs.
      2. ``groupby(key).Max(ts)`` over (1) — one row per key.
      3. inner join (1) x (2) on (key, ts) — keeps exactly the max-ts row
         per key.  Both sides are aggregate outputs, so both get the
         documented Ray-2.49 materialize+repartition workaround
         (schema-less empty blocks crash the hash join).

    SQL equivalent: ``QUALIFY row_number() OVER (PARTITION BY key
    ORDER BY ts DESC, id DESC) = 1``.  Feed the result's ids to a
    ``left_semi`` join (see :func:`latest_per_key_apply`) for the
    surviving rows.  ``ts_column`` must be an orderable numeric column —
    pass timestamps as their int64 epoch-micros view."""
    proj = ds.select_columns([key_column, ts_column, id_column])
    from ray.data.aggregate import Max

    keep_col = f"keep_{id_column}"
    per_ts = (
        proj.groupby([key_column, ts_column])
        .aggregate(Max(id_column, alias_name=keep_col))
        .materialize()
    )
    jp = _join_parts(join_partitions)
    per_ts = per_ts.repartition(max(1, per_ts.count() // 500_000 + 1))
    max_ts = (
        per_ts.select_columns([key_column, ts_column])
        .groupby(key_column)
        .aggregate(Max(ts_column, alias_name=ts_column))
        .materialize()
    )
    max_ts = max_ts.repartition(max(1, max_ts.count() // 500_000 + 1))
    return per_ts.join(
        max_ts, "inner", jp, on=(key_column, ts_column)
    ).select_columns([key_column, ts_column, keep_col])


def latest_per_key_apply(
    ds: ray.data.Dataset,
    key_column: str,
    ts_column: str,
    id_column: str = "doc_id",
    join_partitions: int = 16,
) -> ray.data.Dataset:
    """The surviving corpus after :func:`latest_per_key`: full rows of the
    newest capture per key, via one ``left_semi`` join on the id (the
    exact_dedup_apply shape — payload moves once, in the final join)."""
    from ..ioutil import nonempty_blocks

    keep = latest_per_key(
        ds, key_column, ts_column, id_column, join_partitions
    ).select_columns([f"keep_{id_column}"])
    # the keep set comes OUT of a hash join: sanitize its schema-less
    # empty partitions before they feed the semi join (Ray 2.49 wart)
    keep = nonempty_blocks(keep.materialize())
    if keep is None:
        return ds.limit(0)
    return ds.join(
        keep, "left_semi", _join_parts(join_partitions), on=(id_column,),
        right_on=(f"keep_{id_column}",),
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------

class MinHasher:
    """Actor-pool stage: one row per doc — (doc_id, sig, has_shingles).

    Signatures (num_perm x uint64, ~0.5 KiB/doc) are the pipeline's ONLY
    per-doc state; band rows derived from them later carry no payload, so
    the LSH shuffle moves ~20 bytes/band-row instead of the full signature
    (the round-1 shape duplicated ~8 KiB/doc through the exchange)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, text_column: str = "text", id_column: str = "doc_id", seed: int = 13, hash_kind: str = "blake2b"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.text_column = text_column
        self.id_column = id_column
        # "md5be" makes the whole MinHash+LSH pipeline SQL-reproducible
        # (see __ray_entry__._minhash_sql); "blake2b" is the fast default
        self.hash_kind = hash_kind

    def signatures(self, texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        """(sigs (n, num_perm) uint64, has_shingles bool) per doc.  Docs
        with no shingles (empty) keep the all-max sentinel signature and are
        excluded from banding — an all-empty corpus must not form one
        degenerate O(m^2) bucket (ADVICE r1)."""
        tok, offs = _token_lists(texts, hash_kind=self.hash_kind)
        sh, sh_offs = _shingle_hashes(tok, offs, self.shingle_k, short_mode="whole")
        n_docs = len(sh_offs) - 1
        sigs = np.full((n_docs, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        has = np.diff(sh_offs) > 0
        if len(sh):
            with np.errstate(over="ignore"):
                hashed = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
            nonempty = np.flatnonzero(has)
            starts = sh_offs[nonempty]
            mins = np.minimum.reduceat(hashed, starts, axis=1)
            sigs[nonempty] = mins.T
        return sigs, has

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_column]
        texts = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        ids = np.asarray(batch[self.id_column], dtype=np.int64)
        sigs, has = self.signatures(texts)
        sig_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(8 * self.num_perm), len(ids), [None, pa.py_buffer(sigs.tobytes())]
        )
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "sig": sig_arr.cast(pa.binary()),
                "has_shingles": pa.array(has),
            }
        )


def minhash_signatures(
    ds: ray.data.Dataset,
    num_perm: int = 64,
    shingle_k: int = 3,
    text_column: str = "text",
    id_column: str = "doc_id",
    seed: int = 13,
    hash_kind: str = "blake2b",
) -> ray.data.Dataset:
    """(doc_id, sig, has_shingles) — one row per doc."""
    return ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, shingle_k=shingle_k,
            text_column=text_column, id_column=id_column, seed=seed,
            hash_kind=hash_kind,
        ),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def _band_rows(batch: pa.Table, bands: int, rows_per_band: int, n_groups: int) -> pa.Table:
    """Payload-free band rows (gkey, band, band_hash, doc_id) from stored
    signatures; docs without shingles emit nothing.  ``gkey`` coarsens the
    bucket key so the downstream map_groups runs ~n_groups vectorized group
    calls instead of one Python call per (mostly singleton) LSH bucket."""
    keep = np.asarray(batch["has_shingles"])
    ids = np.asarray(batch["doc_id"], dtype=np.int64)[keep]
    n = len(ids)
    if n == 0:
        return pa.table(
            {
                "gkey": pa.array([], pa.int32()),
                "band": pa.array([], pa.int32()),
                "band_hash": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
            }
        )
    from ..engine.codec import _concat_binary_bytes

    sig_col = batch["sig"].combine_chunks() if isinstance(batch["sig"], pa.ChunkedArray) else batch["sig"]
    flat = np.frombuffer(
        _concat_binary_bytes(sig_col.filter(pa.array(keep))), dtype=np.uint64
    )  # zero-copy: fixed-width values are contiguous in the arrow buffer
    sigs = flat.reshape(n, bands * rows_per_band)
    band_hash = np.empty((bands, n), dtype=np.uint64)
    with np.errstate(over="ignore"):
        mixed = sigs * np.uint64(0xC2B2AE3D27D4EB4F)
        for bd in range(bands):
            band_hash[bd] = np.bitwise_xor.reduce(
                mixed[:, bd * rows_per_band : (bd + 1) * rows_per_band], axis=1
            )
        gkey = (
            (band_hash ^ (np.arange(bands, dtype=np.uint64)[:, None] * np.uint64(0x9E3779B9)))
            % np.uint64(n_groups)
        ).astype(np.int32)
    return pa.table(
        {
            "gkey": pa.array(gkey.ravel()),
            "band": pa.array(np.repeat(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(band_hash.ravel().astype(np.int64)),
            "doc_id": pa.array(np.tile(ids, bands)),
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
    max_bucket: int = 256,
    n_groups: int = 1024,
    join_partitions: int = 16,
    sig_dir: str | None = None,
    seed: int = 13,
    hash_kind: str = "blake2b",
) -> ray.data.Dataset:
    """Near-dup pairs (a, b, est_jaccard) with est >= threshold.

    Scale-safe shape (round-2 rebuild):

    1. signatures: one (doc_id, sig) row per doc — persisted to ``sig_dir``
       (resumable parquet) when given, else pinned once in the object store
       (~0.5 KiB/doc, the minimal working state; nothing corpus-sized ever
       reaches the driver).
    2. banding: payload-free (gkey, band, band_hash, doc_id) rows — the ONE
       LSH shuffle moves ~20 B/band-row, not signatures.
    3. bucket pairs: groupby(gkey) over ~n_groups coarse groups; inside each
       group a vectorized run-length pass finds real (band, band_hash)
       buckets.  Buckets larger than ``max_bucket`` are dropped and counted
       (logged) — the skew guard against degenerate O(N^2) buckets: a
       bucket of N identical docs is better handled by exact_dedup first.
    4. distinct candidate pairs via native groupby count.
    5. verification: two native hash-joins (``Dataset.join``) attach sig_a /
       sig_b by doc_id; est_jaccard = matching-lane fraction, vectorized.
    """
    import logging

    from ray.data.aggregate import Count

    assert num_perm % bands == 0
    rows_per_band = num_perm // bands

    sigs = minhash_signatures(
        ds, num_perm=num_perm, shingle_k=shingle_k,
        text_column=text_column, id_column=id_column, seed=seed,
        hash_kind=hash_kind,
    )
    if sig_dir is not None:
        # the signature table is a DERIVED artifact: always overwrite —
        # appending to a prior run's files would duplicate every doc_id and
        # poison the bucket/verify stages.  Refuse remote URIs (we cannot
        # reliably clear them here) and fail LOUDLY on a local clear error
        # instead of silently appending (r2 review findings).
        import os as _os
        import shutil as _shutil

        if "://" in sig_dir:
            raise ValueError(
                "sig_dir must be a local path (remote URIs cannot be safely "
                "cleared before the overwrite); pass a local scratch dir"
            )
        if _os.path.exists(sig_dir):
            _shutil.rmtree(sig_dir)
        sigs.write_parquet(sig_dir)
        sigs = ray.data.read_parquet(sig_dir)
    else:
        # consumed twice (banding + verification): pin the minimal state
        sigs = sigs.materialize()

    banded = sigs.map_batches(
        _band_rows,
        fn_kwargs=dict(bands=bands, rows_per_band=rows_per_band, n_groups=n_groups),
        batch_format="pyarrow",
    )

    log = logging.getLogger(__name__)

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band", "band_hash", "doc_id"], kind="stable")
        band = g["band"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g["doc_id"].to_numpy()
        change = np.empty(len(g), dtype=bool)
        change[0] = True
        np.logical_or(band[1:] != band[:-1], bh[1:] != bh[:-1], out=change[1:])
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, len(g)))
        dropped = int((sizes > max_bucket).sum())
        if dropped:
            log.warning(
                "minhash_lsh: dropped %d buckets larger than max_bucket=%d "
                "(degenerate near-identical clusters; run exact_dedup first)",
                dropped, max_bucket,
            )
        out_a, out_b = [], []
        for s, sz in zip(starts, sizes):
            if 2 <= sz <= max_bucket:
                # dedupe ids within the bucket: a doc appearing twice in its
                # own bucket (duplicated input rows) must not emit the
                # self-pair (id, id) — near_dup_filter would then drop every
                # such doc as its own near-duplicate
                seg = np.unique(ids[s : s + sz])
                if len(seg) < 2:
                    continue
                ii, jj = np.triu_indices(len(seg), k=1)
                out_a.append(seg[ii])
                out_b.append(seg[jj])
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"a": np.concatenate(out_a), "b": np.concatenate(out_b)})

    pairs = banded.groupby("gkey").map_groups(group_pairs, batch_format="pandas")
    cand = pairs.groupby(["a", "b"]).aggregate(Count(alias_name="n_bands"))

    # Ray 2.49's hash join tolerates empty partitions but NOT a fully empty
    # left dataset (ArrowInvalid "no match for key field").  The candidate
    # set is output-sized (orders below the corpus), so materializing it to
    # learn emptiness is scale-safe — and zero candidates short-circuits
    # the verification joins entirely.
    cand = cand.materialize()
    empty_pairs = ray.data.from_arrow(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                  "est_jaccard": pa.array([], pa.float64())})
    )
    if cand.count() == 0:
        return empty_pairs
    # merge away the aggregate's schema-less empty partition blocks before
    # they reach a join: repartition concatenates blocks, so every output
    # block is typed (map_batches can NOT fix this: Ray skips the UDF on
    # empty blocks and forwards them with unknown schema).  Block count
    # scales with the candidate volume so a high-duplication corpus does
    # not funnel through one worker.
    cand = cand.repartition(max(1, cand.count() // 100_000 + 1))

    sig_only = sigs.select_columns(["doc_id", "sig"])
    # partitions sized by the BIG join side (the signature table, known row
    # count since it is materialized): ~128 MiB per partition, capped by the
    # caller's request and cluster CPUs.  Tiny corpora then pay 2 aggregator
    # actors per join instead of cpus//2 (fixed startup dominated the sf0.1
    # bench); 100-TB corpora get the full requested width.
    sig_bytes = sigs.count() * (8 * num_perm + 24)
    jp = _join_parts(min(join_partitions, sig_bytes // (128 << 20) + 2))
    half = cand.join(
        sig_only, "inner", jp, on=("a",), right_on=("doc_id",), right_suffix="_a"
    )
    # materialize + single-block repartition between the joins (the
    # half-joined table is pair-sized, far below corpus scale): a join can
    # emit schema-less blocks for its empty partitions, and feeding one
    # into the next join crashes pyarrow with "no match for key field"
    # (Ray 2.49 behavior, found by test).  repartition(1) concatenates
    # them away; at larger pair volumes bump this to jp typed blocks.
    half = half.materialize()
    if half.count() == 0:
        return empty_pairs
    half = half.repartition(max(1, min(jp, half.count() // 100_000 + 1)))
    joined = half.join(
        sig_only, "inner", jp, on=("b",), right_on=("doc_id",), right_suffix="_b"
    )

    def verify(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "est_jaccard": pa.array([], pa.float64())}
            )
        from ..engine.codec import _concat_binary_bytes

        names = batch.column_names
        col_a = "sig_a" if "sig_a" in names else "sig"
        col_b = "sig_b" if "sig_b" in names else [c for c in names if c.startswith("sig")][-1]

        def sig_matrix(col) -> np.ndarray:
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            return np.frombuffer(_concat_binary_bytes(col), dtype=np.uint64).reshape(n, num_perm)

        sa = sig_matrix(batch[col_a])
        sb = sig_matrix(batch[col_b])
        est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {
                "a": pa.array(np.asarray(batch["a"], dtype=np.int64)[keep]),
                "b": pa.array(np.asarray(batch["b"], dtype=np.int64)[keep]),
                "est_jaccard": pa.array(est[keep]),
            }
        )

    out = joined.map_batches(verify, batch_format="pyarrow")
    # a doc_id duplicated in the INPUT has duplicate signature rows, which
    # multiply the verification-join matches — collapse to one row per
    # (a, b); est_jaccard is identical across copies (same signatures)
    from ray.data.aggregate import Max

    out = out.groupby(["a", "b"]).aggregate(Max("est_jaccard", alias_name="est_jaccard"))
    # schema-stable even when zero candidates survive verification
    return out.union(empty_pairs)


# --------------------------------------------------------------------------
# dedup APPLY stages — anti/semi-join the corpus down to survivors
# --------------------------------------------------------------------------

def exact_dedup_apply(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str = "doc_id",
    join_partitions: int = 16,
) -> ray.data.Dataset:
    """The surviving corpus after exact dedup: the min-id row per distinct
    content.  groupby(dup_key) -> keep ids -> native left_semi hash-join
    back onto the corpus (two shuffles, both native; nothing driver-side).

    SQL equivalent: ``QUALIFY row_number() OVER (PARTITION BY md5(text)
    ORDER BY doc_id) = 1``."""
    keep = exact_dedup(ds, text_column=text_column, id_column=id_column).select_columns(
        ["keep_doc_id"]
    )
    return ds.join(
        keep, "left_semi", _join_parts(join_partitions), on=(id_column,),
        right_on=("keep_doc_id",),
    )


def near_dup_filter(
    ds: ray.data.Dataset,
    pairs: ray.data.Dataset,
    id_column: str = "doc_id",
    join_partitions: int = 16,
    mode: str = "greedy",
) -> ray.data.Dataset:
    """Reduce the corpus to near-dup survivors.

    - ``mode="greedy"`` (one anti-join): drop the HIGHER-id member of every
      pair (a < b by construction).  The minimum id of each cluster never
      appears as ``b``, so one representative always survives; a cluster
      whose pair graph is not transitively closed may keep extra members
      (e.g. pairs (1,6),(5,6) keep both 1 and 5).
    - ``mode="exact"``: connected components over the pair graph (iterative
      min-label propagation); keep EXACTLY the min-id member per cluster.
      Costs ~diameter rounds of join+groupby over the (output-sized) pair
      node set."""
    jp = _join_parts(join_partitions)
    if mode == "exact":
        labels = connected_components(pairs, join_partitions=join_partitions)

        def non_min(batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch["doc_id"], dtype=np.int64)
            comp = np.asarray(batch["component"], dtype=np.int64)
            return pa.table({"drop_id": pa.array(ids[ids != comp])})

        drops = labels.map_batches(non_min, batch_format="pyarrow").materialize()
        if drops.count() == 0:
            return ds
        return ds.join(drops, "left_anti", jp, on=(id_column,), right_on=("drop_id",))
    if mode != "greedy":
        raise ValueError(f"unknown mode {mode!r}")
    # materialize + repartition: the aggregate emits schema-less blocks for
    # its empty partitions and Ray 2.49's hash join crashes on them ("no
    # match for key field b") — same workaround as the exact path / the
    # verification joins.  drops is output-sized (docs to drop), scale-safe.
    drops = (
        pairs.select_columns(["b"]).groupby("b").count().select_columns(["b"]).materialize()
    )
    if drops.count() == 0:
        return ds
    drops = drops.repartition(max(1, drops.count() // 500_000 + 1))
    return ds.join(drops, "left_anti", jp, on=(id_column,), right_on=("b",))


def connected_components(
    pairs: ray.data.Dataset,
    max_iters: int = 25,
    join_partitions: int = 8,
) -> ray.data.Dataset:
    """(doc_id, component) for every doc in ``pairs`` (columns a, b);
    component = the MIN doc_id reachable through the pair graph.

    Iterative min-label propagation — the canonical distributed CC:
    each round joins labels onto edges and takes the per-node min of
    neighbor labels; rounds needed ~ graph diameter (near-dup clusters
    are shallow, typically <= 5).  Convergence is detected by the global
    label sum (strictly decreasing until fixpoint).  All steps are native
    joins/groupbys — nothing graph-sized reaches the driver."""
    from ray.data.aggregate import Min, Sum

    # undirected edge list, both directions
    def both_dirs(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"], dtype=np.int64)
        b = np.asarray(batch["b"], dtype=np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "component": pa.array([], pa.int64())})
        )
    edges = edges.repartition(max(1, edges.count() // 500_000 + 1))

    # label(n) starts as min(n, min direct neighbor)
    labels = (
        edges.groupby("src").aggregate(Min("dst", alias_name="nbr_min"))
        .map_batches(
            lambda b: pa.table(
                {
                    "doc_id": b["src"].combine_chunks().cast(pa.int64()),
                    "component": pa.array(
                        np.minimum(
                            np.asarray(b["src"], dtype=np.int64),
                            np.asarray(b["nbr_min"], dtype=np.int64),
                        )
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    jp = _join_parts(join_partitions)
    prev_sum = labels.aggregate(Sum("component"))["sum(component)"]
    for _ in range(max_iters):
        # propagate: candidate label for dst = label[src]
        prop = (
            edges.join(labels, "inner", jp, on=("src",), right_on=("doc_id",))
            .groupby("dst")
            .aggregate(Min("component", alias_name="nbr_label"))
        )
        # materialize + size-typed repartition: the aggregate's empty
        # partitions are schema-less (see above) and must not reach a join;
        # block count scales with the propagation volume
        prop = prop.materialize()
        prop = prop.repartition(max(1, prop.count() // 500_000 + 1))
        labels = (
            labels.join(prop, "left_outer", jp, on=("doc_id",), right_on=("dst",))
            .map_batches(
                lambda b: pa.table(
                    {
                        "doc_id": b["doc_id"].combine_chunks().cast(pa.int64()),
                        "component": pa.array(
                            np.minimum(
                                np.asarray(b["component"], dtype=np.int64),
                                np.asarray(
                                    pa.compute.fill_null(
                                        b["nbr_label"].combine_chunks()
                                        if isinstance(b["nbr_label"], pa.ChunkedArray)
                                        else b["nbr_label"],
                                        np.iinfo(np.int64).max,
                                    ),
                                    dtype=np.int64,
                                ),
                            )
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        labels = labels.repartition(max(1, labels.count() // 500_000 + 1))
        cur_sum = labels.aggregate(Sum("component"))["sum(component)"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        # a pair graph with diameter > max_iters (a long near-dup chain)
        # would leave labels partially propagated; callers treating the
        # result as exact (near_dup_filter mode='exact') must know
        raise RuntimeError(
            f"connected_components did not converge in max_iters={max_iters} "
            "rounds (graph diameter exceeds the iteration budget); raise "
            "max_iters — each extra round is one join+groupby"
        )
    return labels


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash_batch(
    batch: pa.Table,
    text_column: str = "text",
    id_column: str = "doc_id",
    hash_kind: str = "md5be",
) -> pa.Table:
    """64-bit SimHash per doc.  Default token hash is md5be so the output is
    EXACTLY reproducible in SQL (see __ray_entry__.oracle_sql()['simhash'])."""
    texts = batch[text_column].combine_chunks() if isinstance(batch[text_column], pa.ChunkedArray) else batch[text_column]
    tok, offs = _token_lists(texts, hash_kind=hash_kind)
    n_docs = len(offs) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(tok):
        bits = np.unpackbits(tok.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        signed = bits.astype(np.int32) * 2 - 1  # (n_tokens, 64) in {-1, +1}
        # reduceat only over docs WITH tokens: a trailing token-less doc
        # would otherwise put len(tok) into the index list (IndexError),
        # and clamping would steal the previous doc's last token instead.
        nonempty = np.flatnonzero(np.diff(offs) > 0)
        doc_sums = np.zeros((n_docs, 64), dtype=np.int64)
        doc_sums[nonempty] = np.add.reduceat(signed, offs[:-1][nonempty], axis=0)
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


def _popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount over a uint64 array (numpy<2 has no bitwise_count)."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def simhash_hamming_pairs(
    ds: ray.data.Dataset,
    max_dist: int = 3,
    text_column: str = "text",
    id_column: str = "doc_id",
    max_bucket: int = 20_000,
) -> ray.data.Dataset:
    """All doc pairs with SimHash Hamming distance <= ``max_dist`` — the
    classic web-crawl near-dup detector (Manku/Jain/Sarma, WWW'07), as a
    banded-pigeonhole dataflow rather than all-pairs:

    split each 64-bit SimHash into ``max_dist+1`` equal bit-bands; any
    pair within ``max_dist`` agrees EXACTLY on at least one band, so only
    band-value buckets need within-bucket verification.  One exploded
    pass emits ``max_dist+1`` rows per doc keyed by a combined
    (band, band_value) int64; ONE native groupby; within-bucket pairing
    is vectorized (triu indices + SWAR popcount), bounded by the
    ``max_bucket`` skew cap (oversized buckets — e.g. a sea of empty
    docs hashing to 0 — are dropped with a warning, like the MinHash and
    embedding near-dup stages).  A pair is emitted ONLY from its FIRST
    agreeing band (lower bands checked vectorized), so no cross-band
    dedup shuffle is needed.  Output: (a, b, dist) with a < b."""
    if max_dist < 0 or max_dist > 15:
        raise ValueError("max_dist must be in [0, 15]")
    n_bands = max_dist + 1
    band_bits = 64 // n_bands
    mask = np.uint64((1 << band_bits) - 1) if band_bits < 64 else np.uint64(2**64 - 1)

    sh = simhash(ds, text_column=text_column, id_column=id_column)

    def explode(batch: pa.Table) -> pa.Table:
        h = np.asarray(batch["simhash"], dtype=np.int64).view(np.uint64)
        ids = np.asarray(batch[id_column], dtype=np.int64)
        keys, out_ids, out_h = [], [], []
        for b in range(n_bands):
            val = (h >> np.uint64(b * band_bits)) & mask
            # combined key: band index in the high bits, band value low —
            # unique because val < 2^band_bits
            keys.append((np.uint64(b) << np.uint64(band_bits)) | val)
            out_ids.append(ids)
            out_h.append(h)
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(keys).view(np.int64)),
                "doc_id": pa.array(np.concatenate(out_ids)),
                "simhash": pa.array(np.concatenate(out_h).view(np.int64)),
            }
        )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        m = len(group)
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype=np.int64),
                "b": pd.Series([], dtype=np.int64),
                "dist": pd.Series([], dtype=np.int64),
            }
        )
        if m < 2:
            return empty
        if m > max_bucket:
            import logging

            logging.getLogger(__name__).warning(
                "simhash band bucket %d exceeds max_bucket=%d (%d rows) — dropped",
                int(group["bucket"].iloc[0]),
                max_bucket,
                m,
            )
            return empty
        band = int(np.int64(group["bucket"].iloc[0]).view(np.uint64) >> np.uint64(band_bits))
        order = np.argsort(group["doc_id"].to_numpy(np.int64), kind="stable")
        ids = group["doc_id"].to_numpy(np.int64)[order]
        h = group["simhash"].to_numpy(np.int64).view(np.uint64)[order]
        # slab the triu enumeration: at the bucket cap a full triu would
        # allocate C(m,2) ~ 2e8-entry index arrays (multi-GB); slabs keep
        # peak pair count ~4M (~128 MB of working arrays)
        parts_a, parts_b, parts_d = [], [], []
        slab = max(1, 4_000_000 // max(m, 1))
        for s0 in range(0, m - 1, slab):
            s1 = min(s0 + slab, m - 1)
            rows = np.arange(s0, s1)
            cnt = m - 1 - rows
            ai = np.repeat(rows, cnt)
            total = int(cnt.sum())
            cum = np.cumsum(cnt) - cnt
            bi = np.arange(total) - np.repeat(cum, cnt) + np.repeat(rows + 1, cnt)
            x = h[ai] ^ h[bi]
            d = _popcount64(x)
            keep = d <= max_dist
            # emit only from the FIRST agreeing band: if any band j < band
            # also agrees for this pair, that bucket already emitted it
            for j in range(band):
                bj = np.uint64(j * band_bits)
                keep &= ((x >> bj) & mask) != 0
            parts_a.append(ids[ai[keep]])
            parts_b.append(ids[bi[keep]])
            parts_d.append(d[keep])
        if not parts_a:
            return empty
        return pd.DataFrame(
            {
                "a": np.concatenate(parts_a),
                "b": np.concatenate(parts_b),
                "dist": np.concatenate(parts_d),
            }
        )

    return (
        sh.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard pairs
# --------------------------------------------------------------------------

def pair_bucket_hash(a: np.ndarray, b: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic bucket of an (a, b) int64 pair — the shared key of the
    bucketed pair-count folds here and in weblinks.cocitation_pairs (every
    occurrence of a pair lands in one bucket, so within-bucket vectorized
    counting is exact)."""
    au = np.asarray(a, dtype=np.int64).view(np.uint64)
    bu = np.asarray(b, dtype=np.int64).view(np.uint64)
    h = (
        au * np.uint64(0x9E3779B97F4A7C15) + bu * np.uint64(0xC2B2AE3D27D4EB4F)
    ) % np.uint64(n_buckets)
    return h.astype(np.int64)


def _shingle_pair_counts(
    ds: ray.data.Dataset,
    n: int,
    max_shingle_df: int,
    text_column: str,
    id_column: str,
) -> ray.data.Dataset:
    """(a, b, co, sa, sb) for every doc pair sharing >=1 distinct word
    n-gram: explode distinct shingles -> groupby(shingle) -> within-group
    pairs (groups larger than max_shingle_df are dropped as too common to
    be discriminative — the skew guard) -> groupby(pair) count.  The
    shared engine under Jaccard and containment pair mining."""

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

    # ONE groupby over hash BUCKETS of shingles (4096 Python calls total),
    # not one map_groups call per distinct shingle (token-scale Python
    # dispatch — 260 s at sf0.1 before this): within a bucket, rows sort
    # by (shingle, doc) and ALL intra-shingle pairs come from one
    # vectorized ragged-range expansion.
    n_buckets = 4096

    def add_bucket(batch: pa.Table) -> pa.Table:
        sh = np.asarray(batch["shingle"], dtype=np.int64)
        b = (sh.view(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
        return batch.append_column("_bucket", pa.array(b))

    def bucket_pairs(g: pa.Table) -> pa.Table:
        # arrow in / arrow out: pandas-format pair blocks made the
        # downstream hash aggregate convert per block (2-10x slower)
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "size_a": pa.array([], pa.int64()),
                "size_b": pa.array([], pa.int64()),
            }
        )
        if g.num_rows < 2:
            return empty
        sh = np.asarray(g["shingle"], dtype=np.int64)
        ids = np.asarray(g["doc_id"], dtype=np.int64)
        sizes = np.asarray(g["set_size"], dtype=np.int64)
        order = np.lexsort((ids, sh))
        sh, ids, sizes = sh[order], ids[order], sizes[order]
        n = len(sh)
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        np.not_equal(sh[1:], sh[:-1], out=new_grp[1:])
        grp_id = np.cumsum(new_grp) - 1
        starts = np.flatnonzero(new_grp)
        grp_sizes = np.diff(np.append(starts, n))
        # skew cap: shingles shared by too many docs are undiscriminative
        keep_grp = grp_sizes <= max_shingle_df
        pos = np.arange(n) - starts[grp_id]  # position within the group
        row_pairs = np.where(keep_grp[grp_id], pos, 0)  # each row pairs with all earlier
        total = int(row_pairs.sum())
        if total == 0:
            return empty
        second = np.repeat(np.arange(n), row_pairs)
        cum = np.cumsum(row_pairs) - row_pairs
        first = (
            np.arange(total)
            - np.repeat(cum, row_pairs)
            + np.repeat(starts[grp_id], row_pairs)
        )
        # within a group ids ascend, so first < second means a < b
        return pa.table(
            {
                "a": pa.array(ids[first]),
                "b": pa.array(ids[second]),
                "size_a": pa.array(sizes[first]),
                "size_b": pa.array(sizes[second]),
            }
        )

    pairs = (
        shingles.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )

    # co-occurrence fold with the SAME bucket trick: every occurrence of a
    # pair hashes to one bucket, so the fold is 4096 vectorized groups
    # instead of a pair-cardinality hash aggregate (which dominated the
    # wall time — 40 s of 56 s at sf0.1 — at millions of distinct groups).
    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        h = pair_bucket_hash(np.asarray(batch["a"]), np.asarray(batch["b"]), n_buckets)
        return batch.append_column("_pb", pa.array(h))

    def fold_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "co": pa.array([], pa.int64()),
                "sa": pa.array([], pa.int64()),
                "sb": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        a = np.asarray(g["a"], dtype=np.int64)
        b = np.asarray(g["b"], dtype=np.int64)
        sa = np.asarray(g["size_a"], dtype=np.int64)
        sb = np.asarray(g["size_b"], dtype=np.int64)
        order = np.lexsort((b, a))
        a, b, sa, sb = a[order], b[order], sa[order], sb[order]
        new = np.empty(len(a), dtype=bool)
        new[0] = True
        np.logical_or(a[1:] != a[:-1], b[1:] != b[:-1], out=new[1:])
        starts = np.flatnonzero(new)
        co = np.diff(np.append(starts, len(a)))
        return pa.table(
            {
                "a": pa.array(a[starts]),
                "b": pa.array(b[starts]),
                "co": pa.array(co),
                "sa": pa.array(sa[starts]),
                "sb": pa.array(sb[starts]),
            }
        )

    return (
        pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(fold_pairs, batch_format="pyarrow")
    )


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int = 256,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """Exact word-n-gram Jaccard >= threshold pairs:
    jaccard = co / (|A| + |B| - co) over _shingle_pair_counts."""
    co = _shingle_pair_counts(ds, n, max_shingle_df, text_column, id_column)

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

    out = co.map_batches(finish, batch_format="pyarrow")
    empty = ray.data.from_arrow(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                  "jaccard": pa.array([], pa.float64())})
    )
    return out.union(empty)


def ngram_containment_pairs(
    ds: ray.data.Dataset,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int = 256,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """DIRECTED near-dup pairs by shingle containment — the asymmetric
    measure Jaccard misses: a short page quoted wholesale inside a long
    one has containment(short -> long) = |A∩B| / |A| near 1 while its
    Jaccard stays tiny.  (Broder's resemblance-vs-containment distinction,
    'On the resemblance and containment of documents', 1997.)

    Same distributed shape as Jaccard (shared _shingle_pair_counts: one
    shingle groupby with the max_shingle_df skew cap, one pair groupby);
    the finish emits each direction independently when co/|src| >=
    threshold.  Output (src, dst, containment): src's shingle set is
    contained in dst's to that degree.  Both divisions are single IEEE
    ops, so a SQL oracle matches bit-for-bit."""
    co = _shingle_pair_counts(ds, n, max_shingle_df, text_column, id_column)

    def finish(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["co"], dtype=np.float64)
        a = np.asarray(batch["a"], dtype=np.int64)
        b = np.asarray(batch["b"], dtype=np.int64)
        sa = np.asarray(batch["sa"], dtype=np.int64)
        sb = np.asarray(batch["sb"], dtype=np.int64)
        cab = c / sa  # a contained in b
        cba = c / sb  # b contained in a
        ka, kb = cab >= threshold, cba >= threshold
        return pa.table(
            {
                "src": pa.array(np.concatenate([a[ka], b[kb]])),
                "dst": pa.array(np.concatenate([b[ka], a[kb]])),
                "containment": pa.array(np.concatenate([cab[ka], cba[kb]])),
            }
        )

    out = co.map_batches(finish, batch_format="pyarrow")
    empty = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
                  "containment": pa.array([], pa.float64())})
    )
    return out.union(empty)


# --------------------------------------------------------------------------
# paragraph-level exact dedup
# --------------------------------------------------------------------------

_PARA_IDX_LIMIT = 1_000_000


def paragraph_dedup(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str = "doc_id",
    sep: str = "\n",
) -> ray.data.Dataset:
    """Corpus-wide paragraph-level exact dedup: one row per DISTINCT
    paragraph — (para_key, keep_doc_id, keep_para_idx, n_copies), where the
    keeper is the lexicographically first (doc_id, para_idx) occurrence.

    The workhorse against boilerplate (headers, footers, licence blocks)
    that exact document dedup misses.  Shape mirrors ``exact_dedup``:
    vectorized explode (split + md5 per paragraph) inside ``map_batches``,
    then ONE native groupby Min/Count — the min is taken over the combined
    key ``doc_id * 1e6 + para_idx`` so no per-group Python runs even for a
    paragraph repeated across millions of docs (the realistic skew case).
    Docs with >= 1e6 paragraphs would corrupt the combined key, so the
    explode raises loudly instead.

    Empty paragraphs (consecutive separators, leading/trailing newlines)
    are skipped — they carry no content and one empty-string group would
    otherwise dominate the shuffle.

    SQL equivalent (the driver oracle): explode paragraphs with ordinality,
    ``GROUP BY md5(para)`` with ``min(doc_id*1e6 + idx)`` decoded back.
    """

    def explode(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_column], "")
        lists = pc.split_pattern(texts, pattern=sep)
        flat = pc.list_flatten(lists)
        lens = np.asarray(pc.list_value_length(lists), dtype=np.int64)
        if (lens >= _PARA_IDX_LIMIT).any():
            raise ValueError(
                f"paragraph_dedup: a document has >= {_PARA_IDX_LIMIT} paragraphs; "
                "the combined min-key encoding would overflow"
            )
        ids = np.repeat(np.asarray(batch[id_column], dtype=np.int64), lens)
        # para_idx counts ALL split slots (1-based), including empty ones,
        # so the index is derivable in SQL via unnest ordinality; one
        # global-arange-minus-doc-start pass, no per-doc loop
        total = int(lens.sum())
        starts = np.concatenate(([0], np.cumsum(lens)[:-1])) if len(lens) else np.empty(0, np.int64)
        idx = np.arange(1, total + 1) - np.repeat(starts, lens)
        nonempty = np.asarray(pc.greater(pc.binary_length(flat), 0))
        paras = flat.filter(pa.array(nonempty)).to_pylist()
        keys = [hashlib.md5(p.encode("utf-8")).hexdigest() for p in paras]
        combined = ids[nonempty] * _PARA_IDX_LIMIT + idx[nonempty]
        return pa.table(
            {
                "para_key": pa.array(keys, pa.string()),
                "combined": pa.array(combined, pa.int64()),
            }
        )

    from ray.data.aggregate import Count, Min

    agg = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("para_key")
        .aggregate(Min("combined", alias_name="keep"), Count(alias_name="n_copies"))
    )

    def decode(batch: pa.Table) -> pa.Table:
        keep = np.asarray(batch["keep"], dtype=np.int64)
        return pa.table(
            {
                "para_key": batch["para_key"],
                "keep_doc_id": pa.array(keep // _PARA_IDX_LIMIT),
                "keep_para_idx": pa.array(keep % _PARA_IDX_LIMIT),
                "n_copies": batch["n_copies"].combine_chunks().cast(pa.int64()),
            }
        )

    return agg.map_batches(decode, batch_format="pyarrow")


# --------------------------------------------------------------------------
# incremental dedup against a persisted hash store
# --------------------------------------------------------------------------


def _store_bucket(keys: pa.Array) -> pa.Array:
    """The hash store's on-disk partition key: first 2 hex chars of the
    content md5 (256 buckets).  ONE definition — the store layout is a
    contract between build, pruned reads and appends."""
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    return pc.utf8_slice_codeunits(keys, 0, 2)


def build_hash_store(
    ds: ray.data.Dataset,
    store_dir: str,
    text_column: str = "text",
) -> int:
    """Persist the corpus's DISTINCT content hashes as a hash-bucketed
    parquet directory (``bucket=XX/`` partitions keyed on the first md5
    byte) — the standing state an incremental-ingest pipeline dedups
    daily batches against.  Hash-only rows (~40 B each): the store for a
    10^10-doc corpus is a few hundred GB of parquet, read as a streaming
    join side, never a driver object.  Returns the distinct-hash count.

    The partition layout is the scale contract: a small new batch prunes
    its read to the buckets it actually touches (``dedup_against_store``)
    and appends survivors as NEW FILES in existing partitions — no
    rewrite of standing state, resumable by construction."""
    from ray.data.aggregate import Count

    hashed = ds.map_batches(
        add_content_hash, fn_kwargs=dict(text_column=text_column), batch_format="pyarrow"
    ).select_columns(["dup_key"])
    distinct = hashed.groupby("dup_key").aggregate(Count(alias_name="_n"))

    def with_bucket(batch: pa.Table) -> pa.Table:
        keys = batch["dup_key"]
        return pa.table({"dup_key": keys, "bucket": _store_bucket(keys)})

    distinct = distinct.materialize()
    n = distinct.count()
    distinct.map_batches(with_bucket, batch_format="pyarrow").write_parquet(
        store_dir, partition_cols=["bucket"]
    )
    return n


def dedup_against_store(
    new_ds: ray.data.Dataset,
    store_dir: str,
    text_column: str = "text",
    id_column: str = "doc_id",
    update_store: bool = False,
    join_partitions: int = 16,
) -> ray.data.Dataset:
    """Survivors of a NEW batch against the standing hash store: rows
    whose content is unseen both in the store AND earlier (lower id)
    within the batch itself.  The incremental-ingest shape: the corpus
    is never re-read — only hash rows move.

    Read pruning: the new batch's distinct bucket set (<= 256 ids, a tiny
    driver list) selects which store partitions are read at all, so a
    small daily batch joins against a fraction of the standing state.
    With ``update_store=True`` the survivors' hashes append as new files
    into their partitions (APPEND mode — standing files untouched)."""
    import os

    from .. import ioutil

    hashed = new_ds.map_batches(
        add_content_hash, fn_kwargs=dict(text_column=text_column), batch_format="pyarrow"
    )
    hashed = hashed.materialize()  # hashed once, reused by three consumers

    # intra-batch winners: min id per content
    from ray.data.aggregate import Min

    keep = (
        hashed.select_columns(["dup_key", id_column])
        .groupby("dup_key")
        .aggregate(Min(id_column, alias_name="_keep"))
    )
    keep = keep.materialize()
    if keep.count() == 0:
        return hashed.limit(0).drop_columns(["dup_key"])
    keep = keep.repartition(max(1, keep.count() // 100_000 + 1))
    jp = _join_parts(join_partitions)
    intra = hashed.join(
        keep,
        "inner",
        jp,
        on=("dup_key", id_column),
        right_on=("dup_key", "_keep"),
    )

    # store-side pruned anti-join: only the buckets this batch touches.
    # Distinct buckets are computed DISTRIBUTED (<= 256 rows per batch
    # partial) — never the hash column itself on the driver.
    def bucket_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"bucket": pc.unique(_store_bucket(batch["dup_key"]))})

    buckets = sorted(
        {
            v
            for b in hashed.select_columns(["dup_key"])
            .map_batches(bucket_partial, batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow")
            for v in pa.table(b)["bucket"].to_pylist()
        }
    )
    part_dirs = [
        os.path.join(store_dir, f"bucket={b}")
        for b in buckets
        if os.path.isdir(os.path.join(store_dir, f"bucket={b}"))
    ]
    # ray.data.read_parquet accepts ONE directory or a list of FILES —
    # expand the pruned partitions to their parquet files
    part_dirs = [
        os.path.join(d, f)
        for d in part_dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    # (intra is never empty here: hashed is non-empty, so keep has >= 1
    # group and every group's min row inner-joins back)
    intra = intra.materialize()
    intra = intra.repartition(max(1, intra.count() // 100_000 + 1))
    if part_dirs:
        store = ioutil.read_parquet_clean(part_dirs, columns=["dup_key"])
        out = intra.join(
            store, "left_anti", jp, on=("dup_key",), right_on=("dup_key",)
        )
    else:
        out = intra
    out = out.materialize()

    if update_store and out.count() > 0:

        def with_bucket(batch: pa.Table) -> pa.Table:
            keys = batch["dup_key"]
            return pa.table({"dup_key": keys, "bucket": _store_bucket(keys)})

        out.select_columns(["dup_key"]).map_batches(
            with_bucket, batch_format="pyarrow"
        ).write_parquet(store_dir, partition_cols=["bucket"])
    return out.drop_columns(["dup_key"])


def remove_domain_boilerplate(
    ds: ray.data.Dataset,
    threshold: tuple[int, int] = (1, 2),
    min_docs: int = 3,
    text_column: str = "text",
    id_column: str = "doc_id",
    group_column: str = "source",
    sep: str = "\n",
    max_boiler: int = 2_000_000,
    n_buckets: int = 64,
    pair_batch_size: int | None = None,
) -> ray.data.Dataset:
    """Domain-conditional boilerplate strip (the CCNet / RefinedWeb step
    global paragraph dedup can't express): a paragraph is boilerplate
    WITHIN its group (domain/source) when it appears in >= min_docs docs
    AND in >= num/den of the group's documents — headers, footers, nav
    bars, licence blocks that are common *per site* but rare globally.
    Returns ``(doc_id, clean_text, n_kept)``: surviving non-empty
    paragraphs re-joined by ``sep`` in original order.  Docs whose
    paragraphs are all removed (or all empty) are absent — the SQL
    GROUP-BY-survivors semantics.

    ``threshold`` is a RATIONAL (num, den): the gate compares
    ``n_docs_with_para * den >= num * group_total`` in exact integers, so
    the decision is SQL-bit-reproducible on any libm.

    Scale shape: per-(group, paragraph) DISTINCT doc counts are exact
    regardless of batching — a per-batch pre-dedup shrinks the exchange,
    then one groupby over the composite ``group|md5|doc`` key establishes
    global distinctness and one groupby over ``group|md5`` counts docs
    (two pair-bounded exchanges; ``pair_batch_size`` exists so tests can
    force straddled batches); group doc totals are a
    group-cardinality-sized collect (the facets convention); the
    boilerplate key set is BROADCAST once (``ray.put``) into a stateless
    filter pass while it fits in ``max_boiler`` keys (it is bounded by
    domains x common-paragraphs-per-domain, orders smaller than the
    corpus); beyond the cap the strip switches to a native left_anti
    join whose right side never touches the driver, using the same
    materialize+repartition empty-partition workaround as
    ``near_dup_filter`` — both paths produce identical survivors (test-
    pinned); reassembly hash-buckets docs
    and finishes each bucket in one vectorized lexsort + LargeList
    offsets + binary_join kernel (the journey_strings shape).  ONE
    paragraph-text exchange total: the reassembly bucket shuffle.

    A ``group_column`` value containing ``|`` or NUL would corrupt the
    combined key and fails loud (the sketch.py convention)."""
    num, den = int(threshold[0]), int(threshold[1])
    if num < 0 or den <= 0:
        raise ValueError(f"threshold must be a nonneg/pos rational, got {threshold}")
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")

    def explode(batch: pa.Table) -> pa.Table:
        groups_arr = batch[group_column].cast(pa.string())
        gl = groups_arr.to_pylist()
        for g in gl:
            if g is None or "|" in g or "\x00" in g:
                raise ValueError(
                    f"remove_domain_boilerplate: group value {g!r} contains "
                    "'|' or NUL (or is null) — the combined key would corrupt"
                )
        texts = pc.fill_null(batch[text_column], "")
        lists = pc.split_pattern(texts, pattern=sep)
        flat = pc.list_flatten(lists)
        lens = np.asarray(pc.list_value_length(lists), dtype=np.int64)
        if (lens >= _PARA_IDX_LIMIT).any():
            raise ValueError(
                f"remove_domain_boilerplate: a document has >= {_PARA_IDX_LIMIT} "
                "paragraphs; the para_idx encoding would overflow"
            )
        ids = np.repeat(np.asarray(batch[id_column], dtype=np.int64), lens)
        grp = np.repeat(np.asarray(gl, dtype=object), lens)
        total = int(lens.sum())
        starts = (
            np.concatenate(([0], np.cumsum(lens)[:-1])) if len(lens) else np.empty(0, np.int64)
        )
        idx = np.arange(1, total + 1) - np.repeat(starts, lens)
        nonempty = np.asarray(pc.greater(pc.binary_length(flat), 0))
        paras_arr = flat.filter(pa.array(nonempty))
        # md5 only the UNIQUE paragraphs (dictionary-encode first — the
        # _token_lists trick): boilerplate is by definition highly repeated,
        # so this collapses the Python-loop hash cost by the dup factor
        denc = paras_arr.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        uniq_keys = [
            hashlib.md5(p.encode("utf-8")).hexdigest()
            for p in denc.dictionary.to_pylist()
        ]
        codes = np.asarray(denc.indices, dtype=np.int64)
        keys = (
            np.asarray(uniq_keys, dtype=object)[codes]
            if len(codes)
            else np.empty(0, object)
        )
        grp_arr = pa.array(grp[nonempty].tolist(), pa.string())
        ck = pc.binary_join_element_wise(
            grp_arr, pa.array(keys, pa.string()), "|"
        )
        return pa.table(
            {
                "doc_id": pa.array(ids[nonempty]),
                "para_idx": pa.array(idx[nonempty]),
                "para": paras_arr,
                "grp": grp_arr,
                "ck": ck,
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    # per-(group, paragraph) DISTINCT doc counts: per-batch dedup is
    # globally exact because explode is row-local (one doc = one batch)
    def pair_partial(batch: pa.Table) -> pa.Table:
        # local pre-dedup only SHRINKS the exchange; global distinctness
        # comes from the (paragraph, doc) groupby below — batch locality
        # is never assumed (a doc's exploded rows CAN straddle the
        # runtime's re-chunked batches)
        df = pa.table(
            {"ck": batch["ck"], "doc_id": batch["doc_id"]}
        ).to_pandas().drop_duplicates()
        ckd = (df["ck"] + "|" + df["doc_id"].astype(str)).to_numpy(dtype=object)
        return pa.table({"ckd": pa.array(ckd, pa.string())})

    def strip_doc(batch: pa.Table) -> pa.Table:
        cks = [c.rsplit("|", 1)[0] for c in batch["ckd"].to_pylist()]
        return pa.table({"ck": pa.array(cks, pa.string())})

    from ray.data.aggregate import Count

    para_counts = (
        exploded.map_batches(
            pair_partial, batch_format="pyarrow", batch_size=pair_batch_size
        )
        .groupby("ckd")
        .count()  # one row per DISTINCT (group, paragraph, doc) — exact
        .map_batches(strip_doc, batch_format="pyarrow")
        .groupby("ck")
        .aggregate(Count(alias_name="nd"))
    )

    # group doc totals: group-cardinality-sized (the facets convention)
    totals_tbl = pa.concat_tables(
        pa.table(b)
        for b in ds.select_columns([group_column])
        .groupby(group_column)
        .count()
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    totals = dict(
        zip(
            totals_tbl[group_column].to_pylist(),
            totals_tbl["count()"].to_pylist(),
        )
    )
    totals_ref = ray.put(totals)
    _min_docs = min_docs

    class BoilerFilter:
        def __init__(self):
            self.totals = ray.get(totals_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"ck": pa.array([], pa.string())})
            cks = batch["ck"].to_pylist()
            nd = np.asarray(batch["nd"], dtype=np.int64)
            tot = np.asarray(
                [self.totals[c.split("|", 1)[0]] for c in cks], dtype=np.int64
            )
            keep = (nd >= _min_docs) & (nd * den >= num * tot)
            return pa.table(
                {"ck": pa.array([c for c, k in zip(cks, keep) if k], pa.string())}
            )

    # autoscaling (min 1) actor pools: a FIXED pool size can deadlock the
    # streaming executor on a small cluster when this pipeline's two
    # all-to-all stages hold most CPU slots (observed at num_cpus=4)
    boiler = para_counts.map_batches(
        BoilerFilter, concurrency=(1, 2), batch_format="pyarrow"
    ).materialize()  # boilerplate-key-sized; decides broadcast vs join below

    n_boiler = boiler.count()
    if n_boiler <= max_boiler:
        # small-side fast path: ONE driver-mediated broadcast of the key
        # set, zero extra exchanges on the paragraph stream
        boiler_keys: list[str] = []
        for b in boiler.iter_batches(batch_size=None, batch_format="pyarrow"):
            boiler_keys.extend(pa.table(b)["ck"].to_pylist())
        bset_ref = ray.put(frozenset(boiler_keys))

        class DropBoiler:
            def __init__(self):
                self.bset = ray.get(bset_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                keep = pa.array(
                    [c not in self.bset for c in batch["ck"].to_pylist()]
                )
                return batch.filter(keep).drop_columns(["grp", "ck"])

        survivors = exploded.map_batches(
            DropBoiler, concurrency=(1, 2), batch_format="pyarrow"
        )
    else:
        # beyond-cap path: native left_anti join — the key set never
        # touches the driver.  Same empty-partition workaround as
        # near_dup_filter: the aggregate upstream of `boiler` emits
        # schema-less blocks for empty partitions and Ray 2.49's hash
        # join crashes on them, so repartition the materialized
        # (boiler-key-sized) right side down to nonempty blocks.
        from ..ioutil import nonempty_blocks

        right = boiler.repartition(max(1, n_boiler // 500_000 + 1))
        joined = exploded.join(
            right,
            "left_anti",
            _join_parts(n_buckets),
            on=("ck",),
            right_on=("ck",),
        )
        # join output feeds the reassembly groupby -> sanitize zero-column
        # empty blocks before the next shuffle (Ray 2.49 Acero wart)
        survivors = nonempty_blocks(joined.materialize()).map_batches(
            lambda t: t.drop_columns(["grp", "ck"]), batch_format="pyarrow"
        )
    return reassemble_paragraphs(survivors, sep=sep, n_buckets=n_buckets)


def reassemble_paragraphs(
    survivors: ray.data.Dataset,
    sep: str = "\n",
    n_buckets: int = 64,
    text_name: str = "clean_text",
    count_name: str = "n_kept",
) -> ray.data.Dataset:
    """Ordered per-doc paragraph reassembly shared by the paragraph-level
    cleaning operators (domain boilerplate strip, jusText-lite content
    extraction): input rows (doc_id, para_idx, para), output one row per
    surviving doc — paragraphs re-joined by ``sep`` in para_idx order.

    ONE doc-bucketed shuffle; each bucket finishes in one vectorized
    lexsort + LargeList offsets + binary_join kernel (the journey_strings
    shape) — never a per-doc Python call."""
    from .window_fns import _bucket_of

    def bucketize(batch: pa.Table) -> pa.Table:
        b = _bucket_of(np.asarray(batch["doc_id"], dtype=np.int64), n_buckets)
        return batch.append_column("_bucket", pa.array(b.astype(np.int64)))

    def per_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    text_name: pa.array([], pa.string()),
                    count_name: pa.array([], pa.int64()),
                }
            )
        d = np.asarray(group["doc_id"], dtype=np.int64)
        ix = np.asarray(group["para_idx"], dtype=np.int64)
        perm = np.lexsort((ix, d))
        ds_sorted = d[perm]
        paras = group["para"].combine_chunks() if isinstance(
            group["para"], pa.ChunkedArray
        ) else group["para"]
        paras = paras.take(pa.array(perm))
        boundary = np.empty(len(ds_sorted), dtype=bool)
        boundary[0] = True
        np.not_equal(ds_sorted[1:], ds_sorted[:-1], out=boundary[1:])
        starts = np.flatnonzero(boundary)
        offsets = np.concatenate([starts, [len(ds_sorted)]]).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets), pc.cast(paras, pa.large_string())
        )
        joined = pc.cast(
            pc.binary_join(lists, pa.scalar(sep, pa.large_string())), pa.string()
        )
        return pa.table(
            {
                "doc_id": pa.array(ds_sorted[starts]),
                text_name: joined,
                count_name: pa.array(np.diff(offsets)),
            }
        )

    return (
        survivors.map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def dedup_representatives(
    ds: ray.data.Dataset,
    pairs: ray.data.Dataset,
    priority_column: str,
    id_column: str = "doc_id",
    join_partitions: int = 8,
) -> ray.data.Dataset:
    """Best-doc-per-near-dup-cluster selection — curation keeps the
    HIGHEST-priority member of each duplicate cluster (quality score,
    length, freshness...), not the arbitrary min-id one.

    Composition: connected_components over the pair graph labels every
    clustered doc; the cluster argmax reuses the latest_per_key
    decomposition (two native aggregates + one join) with priority as
    the ordering column (ties -> max id, the latest_per_key convention);
    docs in NO cluster are their own representatives and pass through
    via a left_anti join against the clustered set.  Output: the
    representative (id_column, priority_column) rows."""
    from ..ioutil import nonempty_blocks

    jp = _join_parts(join_partitions)
    prio = ds.select_columns([id_column, priority_column])
    cc = connected_components(pairs, join_partitions=join_partitions)
    cc = nonempty_blocks(cc.materialize())
    if cc is None:
        return prio
    labeled = nonempty_blocks(
        cc.join(
            prio, "inner", jp, on=(id_column,), right_on=(id_column,)
        ).materialize()
    )
    if labeled is None:
        # the pair graph references no doc present in ds (stale/foreign
        # pair table): every doc is its own representative
        return prio
    reps_keep = latest_per_key(
        labeled, "component", priority_column, id_column=id_column,
        join_partitions=join_partitions,
    ).select_columns([f"keep_{id_column}"])
    reps_keep = nonempty_blocks(reps_keep.materialize())
    rep_rows = prio.join(
        reps_keep, "left_semi", jp, on=(id_column,),
        right_on=(f"keep_{id_column}",),
    )
    unclustered = prio.join(
        cc, "left_anti", jp, on=(id_column,), right_on=(id_column,)
    )
    return rep_rows.union(unclustered)
