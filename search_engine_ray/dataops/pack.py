"""Sequence packing for LLM pretraining: assign every document a span in
the concatenated global token stream and the context-window bins it
lands in.

The packing model is the standard "concatenate documents in corpus order
and chunk every ``seq_len`` tokens" used by GPT-style pretraining
loaders: document d with token span [start, start+n) fills bins
``start // seq_len .. (start+n-1) // seq_len`` (documents cross bin
boundaries; a loader later splits at the boundary).  Output per doc:
``(doc_id, n_tokens, start_tok, first_bin, last_bin)``.

Scale shape (the same two-phase prefix sum the engine uses for global
docID assignment, engine/reader.py):

1. pass 1 — per-fragment token totals: each task reads ONE parquet
   row-group's text column, counts tokens with a single vectorized RE2
   kernel, and emits one (frag_id, total) row; the driver folds the
   fragment-ordered totals into exclusive token bases (a few thousand
   ints, metadata-sized).
2. pass 2 — per-fragment emission: re-read the fragment, exclusive
   cumsum within the fragment + the fragment's base = exact global
   offsets, all vectorized.  No shuffle at any point; both passes are
   embarrassingly parallel over fragments, and output order is free.

Corpus order = the deterministic fragment plan (files sorted, row groups
in file order), i.e. ascending global row position — identical to the
engine's docID order.  Token counting is whitespace runs (``\\S+``),
matching the driver-gate SQL oracle exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..engine.reader import Fragment, plan_fragments, read_fragment
from ..text.ws import NONWS_RE


def _ws_token_counts(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Whitespace-run token count per row, one vectorized kernel."""
    counts = pc.count_substring_regex(pc.fill_null(texts, ""), pattern=NONWS_RE)
    return np.asarray(counts, dtype=np.int64)


def _frag_of(batch, i: int) -> Fragment:
    return Fragment(
        int(batch["frag_id"][i]),
        str(batch["path"][i]),
        int(batch["row_group"][i]),
        int(batch["base"][i]),
        int(batch["n_rows"][i]),
    )


def pack_sequences(
    input_path: str | list[str],
    seq_len: int,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """-> Dataset(doc_id, n_tokens, start_tok, first_bin, last_bin) for
    every document with at least one token (empty docs occupy no span).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    frags = plan_fragments(input_path)
    frag_ds = ray.data.from_items([f.to_dict() for f in frags])

    def count(batch: dict) -> pa.Table:
        rows = []
        for i in range(len(batch["frag_id"])):
            f = _frag_of(batch, i)
            t = read_fragment(f, columns=[text_column])
            rows.append((f.frag_id, int(_ws_token_counts(t[text_column]).sum())))
        return pa.table(
            {
                "frag_id": pa.array([r[0] for r in rows], pa.int64()),
                "total": pa.array([r[1] for r in rows], pa.int64()),
            }
        )

    totals = frag_ds.map_batches(count, batch_size=1).to_pandas()
    totals = totals.sort_values("frag_id", ignore_index=True)
    bases = np.concatenate(([0], np.cumsum(totals["total"].to_numpy())[:-1]))
    base_by_frag = dict(zip(totals["frag_id"].astype(int), bases.astype(int)))
    bases_ref = ray.put(base_by_frag)

    def emit(batch: dict) -> pa.Table:
        base_map = ray.get(bases_ref)
        parts = []
        for i in range(len(batch["frag_id"])):
            f = _frag_of(batch, i)
            t = read_fragment(f, columns=[id_column, text_column])
            n = _ws_token_counts(t[text_column])
            start = base_map[f.frag_id] + np.concatenate(([0], np.cumsum(n)[:-1]))
            keep = n > 0
            n_k, start_k = n[keep], start[keep]
            parts.append(
                pa.table(
                    {
                        id_column: t[id_column].filter(pa.array(keep)),
                        "n_tokens": pa.array(n_k),
                        "start_tok": pa.array(start_k),
                        "first_bin": pa.array(start_k // seq_len),
                        "last_bin": pa.array((start_k + n_k - 1) // seq_len),
                    }
                )
            )
        return pa.concat_tables(parts)

    return frag_ds.map_batches(emit, batch_size=1)


def bin_fill_stats(packed: ray.data.Dataset, seq_len: int) -> ray.data.Dataset:
    """Per-bin fill statistics -> (bin, n_docs, n_tokens): how many docs
    touch each context window and how many of its tokens are used (the
    last global bin may be partial).  One explode bounded by
    ceil(n/seq_len)+1 bins per doc, then a native groupby-sum."""
    from ray.data.aggregate import Count, Sum

    def explode(batch: pa.Table) -> pa.Table:
        starts = np.asarray(batch["start_tok"], dtype=np.int64)
        ns = np.asarray(batch["n_tokens"], dtype=np.int64)
        first = starts // seq_len
        last = (starts + ns - 1) // seq_len
        reps = (last - first + 1).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(ns)), reps)
        bin_no = np.concatenate(
            [np.arange(f, l + 1) for f, l in zip(first, last)]
        ) if len(ns) else np.empty(0, np.int64)
        # tokens of this doc inside each touched bin
        bin_lo = bin_no * seq_len
        bin_hi = bin_lo + seq_len
        s, e = starts[doc_idx], (starts + ns)[doc_idx]
        used = np.minimum(e, bin_hi) - np.maximum(s, bin_lo)
        return pa.table(
            {"bin": pa.array(bin_no), "used": pa.array(used.astype(np.int64))}
        )

    return (
        packed.map_batches(explode, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Count(), Sum("used", alias_name="n_tokens"))
    )
