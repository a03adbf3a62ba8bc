"""Hashing-trick feature extraction (Weinberger et al., ICML 2009).

The feature step of the linear-model training wing (pca.py / rproj.py /
linear_probe): map each document's whitespace tokens into a fixed
``dim``-bucket sparse vector with a signed hash, the standard
"HashingVectorizer" construction — bucket from one 64-bit token hash,
sign from its low bit, value = sum of signs per (doc, bucket).  Signed
folding keeps collision noise zero-mean (the paper's key property), and
the fixed dimensionality means NO vocabulary pass: the operator is one
stateless ``map_batches`` over the corpus — no shuffle, no driver state,
embarrassingly parallel at any scale.

Exactness: tokens hash with the md5be convention (first 8 md5 bytes,
big-endian — ``('0x' || substr(md5(t), 1, 16))::UBIGINT`` in DuckDB), so
every output cell is integer-exact against a SQL oracle.  Tokenization
is the pinned whitespace class (text/ws.py) shared by every WS-tokenized
dataops operator.

Output is the sparse COO form (doc_id, bucket, value) with zero-sum
buckets dropped — the layout knn/pca/probe stages consume, and the one
that stays bounded when dim is large.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _token_lists


def feature_hash(
    ds,
    dim: int = 1024,
    text_column: str = "text",
    id_column: str = "doc_id",
):
    """Dataset(doc_id, text) -> Dataset(doc_id, bucket, value): signed
    hashed token counts, one sparse row per nonzero bucket.

    ``bucket = (md5be(token) >> 1) % dim``; ``sign = +1`` when the hash's
    low bit is 0 else ``-1``; ``value = sum(sign)`` over the doc's tokens
    in that bucket (zero sums dropped).  Docs are never split across
    batches, so the fold is in-batch and the pipeline has no exchange.
    """
    if dim < 1:
        raise ValueError(f"feature_hash: dim must be >= 1 (got {dim})")

    def fold(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_column: pa.array(
                    [],
                    batch[id_column].type
                    if id_column in batch.column_names
                    else pa.int64(),
                ),
                "bucket": pa.array([], pa.int64()),
                "value": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        texts = batch[text_column].combine_chunks()
        tok, offs = _token_lists(texts, hash_kind="md5be")
        if len(tok) == 0:
            return empty
        bucket = ((tok >> np.uint64(1)) % np.uint64(dim)).astype(np.int64)
        sign = np.where((tok & np.uint64(1)) == 0, 1, -1).astype(np.int64)
        lens = np.diff(offs)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        # fold per (doc, bucket): combined key fits int64 for any batch
        key = doc_idx * dim + bucket
        uniq, inv = np.unique(key, return_inverse=True)
        val = np.bincount(inv, weights=sign).astype(np.int64)
        keep = val != 0
        uniq, val = uniq[keep], val[keep]
        out_doc = batch[id_column].take(pa.array(uniq // dim))
        return pa.table(
            {
                id_column: out_doc,
                "bucket": pa.array(uniq % dim),
                "value": pa.array(val),
            }
        )

    return ds.select_columns([id_column, text_column]).map_batches(
        fold, batch_format="pyarrow"
    )


def feature_hash_dense(
    ds,
    dim: int = 256,
    text_column: str = "text",
    id_column: str = "doc_id",
    keep_columns: tuple[str, ...] = (),
):
    """Dense variant: Dataset(doc_id, features list<int64> of length dim)
    — the layout the pca/rproj/probe Gram passes take directly.  Use only
    for small ``dim`` (the dense row costs 8*dim bytes/doc).

    ``keep_columns`` pass through untouched (e.g. a label column joined
    upstream — Acero joins reject list-typed payload columns, so join
    scalars BEFORE featurizing and carry them through here)."""
    if dim < 1 or dim > 65536:
        raise ValueError(f"feature_hash_dense: dim must be in [1, 65536] (got {dim})")

    def fold(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # keep the BATCH's own types (a hardcoded int64 here would
            # schema-split against non-empty blocks at materialize)
            def _t(c):
                return batch[c].type if c in batch.column_names else pa.int64()

            cols = {
                id_column: pa.array([], _t(id_column)),
                "features": pa.array([], pa.list_(pa.int64())),
            }
            for c in keep_columns:
                cols[c] = pa.array([], _t(c))
            return pa.table(cols)
        texts = batch[text_column].combine_chunks()
        tok, offs = _token_lists(texts, hash_kind="md5be")
        n = batch.num_rows
        mat = np.zeros((n, dim), dtype=np.int64)
        if len(tok):
            bucket = ((tok >> np.uint64(1)) % np.uint64(dim)).astype(np.int64)
            sign = np.where((tok & np.uint64(1)) == 0, 1, -1).astype(np.int64)
            lens = np.diff(offs)
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            np.add.at(mat, (doc_idx, bucket), sign)
        cols = {
            id_column: batch[id_column],
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1)), dim
            ).cast(pa.list_(pa.int64())),
        }
        for c in keep_columns:
            cols[c] = batch[c]
        return pa.table(cols)

    return ds.select_columns(
        [id_column, text_column, *keep_columns]
    ).map_batches(fold, batch_format="pyarrow")
