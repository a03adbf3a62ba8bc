"""Sketch-style operators: exact distributed heavy hitters.

``top_terms``-style global term counting shuffles the FULL vocabulary —
at 100 TB of web text that is 10^9+ distinct tokens through an
all-to-all exchange for an answer that only needs the few thousand
heaviest.  ``heavy_hitters`` returns the EXACT (term, count) set of all
terms with count * k >= N (i.e. frequency >= N/k) while moving only
candidate-sized rows:

pass 1 (candidates): one ``map_batches`` emits, per batch, the terms
    with ``batch_count * k >= batch_tokens`` — at most k rows per batch.
    The local-candidacy lemma makes this a lossless filter: if
    ``count(t) * k >= N`` then some batch has ``count_b(t) * k >= N_b``
    (otherwise summing the strict inequalities gives count * k < N).
    Batch token totals ride along as one extra row per batch, so the
    same pass also yields N.
pass 2 (exact recount): the deduplicated candidate set broadcasts via
    ``ray.put`` (bounded by k x n_batches before dedup, typically ~k
    after — Zipf heads recur in every batch); one stateless
    ``map_batches`` counts ONLY candidate terms per batch and a tiny
    groupby-sum folds the exact totals.  The integer cross-multiplied
    threshold then filters — no float division anywhere, so a SQL
    oracle (``HAVING count(*) * k >= total``) reproduces the result
    bit-exactly.

Unlike Misra-Gries / count-min sketches the output is exact, yet the
exchange volume matches theirs: nothing vocabulary-sized moves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..text.ws import ws_token_flat as _ws_token_flat


def heavy_hitters(
    ds: ray.data.Dataset,
    k: int = 50,
    text_column: str = "text",
) -> pa.Table:
    """Exact heavy hitters: every term with ``count * k >= total_tokens``
    -> (term, count), term ascending.  Whitespace tokens (the pinned
    explicit class, text/ws.py)."""
    from ray.data.aggregate import Sum

    if k < 1:
        raise ValueError("k must be >= 1")

    def candidates(batch: pa.Table) -> pa.Table:
        flat = _ws_token_flat(batch[text_column])
        n_b = len(flat)
        if n_b == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "count": pa.array([], pa.int64())}
            )
        denc = flat.dictionary_encode()
        codes = np.asarray(denc.indices, dtype=np.int64)
        counts = np.bincount(codes, minlength=len(denc.dictionary))
        keep = counts * k >= n_b  # integer local-candidacy test
        terms = denc.dictionary.take(pa.array(np.flatnonzero(keep)))
        # escape real terms with a "t" prefix so the per-batch total row
        # ("n") can never collide with a token, whatever bytes it holds
        esc = pc.binary_join_element_wise(
            pa.array(["t"] * len(terms), pa.string()), terms.cast(pa.string()), ""
        )
        out_terms = pa.concat_arrays([esc, pa.array(["n"], pa.string())])
        out_counts = np.append(counts[keep], n_b).astype(np.int64)
        return pa.table({"term": out_terms, "count": pa.array(out_counts)})

    cand = (
        ds.map_batches(candidates, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("count", alias_name="count"))
        .to_pandas()
    )
    if len(cand) == 0:
        return pa.table(
            {"term": pa.array([], pa.string()), "count": pa.array([], pa.int64())}
        )
    is_total = cand["term"] == "n"
    total = int(cand.loc[is_total, "count"].sum())
    cand_terms = np.asarray(
        [t[1:] for t in cand.loc[~is_total, "term"]], dtype=object
    )
    if total == 0 or len(cand_terms) == 0:
        return pa.table(
            {"term": pa.array([], pa.string()), "count": pa.array([], pa.int64())}
        )
    # pass 2: exact recount of candidates only (their pass-1 sums are
    # lower bounds — batches where the term fell below the local
    # threshold contributed nothing)
    cand_ref = ray.put(pa.array(sorted(cand_terms), pa.string()))

    def recount(batch: pa.Table) -> pa.Table:
        cand_arr = ray.get(cand_ref)
        flat = _ws_token_flat(batch[text_column])
        if len(flat) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "count": pa.array([], pa.int64())}
            )
        hit = flat.filter(pc.is_in(flat, value_set=cand_arr))
        if len(hit) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "count": pa.array([], pa.int64())}
            )
        denc = hit.dictionary_encode()
        counts = np.bincount(
            np.asarray(denc.indices, dtype=np.int64), minlength=len(denc.dictionary)
        )
        return pa.table(
            {
                "term": denc.dictionary.cast(pa.string()),
                "count": pa.array(counts.astype(np.int64)),
            }
        )

    exact = (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("count", alias_name="count"))
        .to_pandas()
    )
    keep = exact["count"].to_numpy(dtype=np.int64) * k >= total
    out = exact.loc[keep].sort_values("term", ignore_index=True)
    return pa.table(
        {
            "term": pa.array(out["term"], pa.string()),
            "count": pa.array(out["count"].astype(np.int64), pa.int64()),
        }
    )
