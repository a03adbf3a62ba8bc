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


def _hll_reg_rho(h1: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register, rho) per hash: register = top p bits of h1; rho = 1 +
    leading zeros of the remaining (64-p)-bit suffix (the HyperLogLog
    observable, Flajolet et al. 2007).  Bit positions come from a
    vectorized ``np.unpackbits`` over the big-endian byte view — never a
    float log2, whose rounding at 2^k boundaries would break the
    integer-exact SQL oracle (``64-p - length(bin(w)) + 1``)."""
    q = 64 - p
    reg = (h1 >> np.uint64(q)).astype(np.int64)
    w = h1 & np.uint64((1 << q) - 1)
    if len(w) == 0:
        return reg, np.empty(0, np.int64)
    bits = np.unpackbits(
        w.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1
    )  # column 0 = bit 63 (always 0 for w < 2^q when p >= 1)
    first_one = np.argmax(bits, axis=1)  # 0 when w == 0 -> guarded below
    rho = np.where(w == 0, q + 1, first_one - p + 1).astype(np.int64)
    return reg, rho


def hll_registers(
    ds: ray.data.Dataset,
    key_column: str,
    p: int = 6,
) -> pa.Table:
    """Distributed HyperLogLog register table: (reg, rho) with rho = the
    MAX observable per register over all keys — ascending reg, registers
    no key reached are absent (matching the SQL GROUP BY model).

    The sketch property that makes this scale: per-batch partials reduce
    each batch to <= 2^p rows before the shuffle, so counting distinct
    urls across 100 TB exchanges kilobytes.  Deterministic and
    partition-invariant because MAX commutes and the hash (md5be first
    half, non-strings via their decimal VARCHAR cast) is content-based —
    the register table is SQL-reproducible bit-for-bit, so the driver
    gate checks the REGISTERS; the float estimate stays lib-side."""
    from ray.data.aggregate import Max

    from .membership import md5_halves

    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")

    def partial(batch: pa.Table) -> pa.Table:
        h1, _ = md5_halves(batch[key_column])
        reg, rho = _hll_reg_rho(h1, p)
        if len(reg) == 0:
            return pa.table(
                {"reg": pa.array([], pa.int64()), "rho": pa.array([], pa.int64())}
            )
        regmax = np.zeros(1 << p, dtype=np.int64)
        np.maximum.at(regmax, reg, rho)
        hit = np.flatnonzero(regmax)
        return pa.table({"reg": pa.array(hit), "rho": pa.array(regmax[hit])})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("reg")
        .aggregate(Max("rho"))
        .sort("reg")
        .to_pandas()
    )
    return pa.table(
        {
            "reg": pa.array(out["reg"].to_numpy().astype(np.int64)),
            "rho": pa.array(out["max(rho)"].to_numpy().astype(np.int64)),
        }
    )


def hll_estimate(registers: pa.Table, p: int = 6) -> float:
    """Bias-corrected HLL cardinality estimate from a register table
    (absent registers count as rho=0), with the standard small-range
    linear-counting correction.  Float by nature — pytest-pinned against
    the 1.04/sqrt(m) error bound, never SQL-gated."""
    m = 1 << p
    rho = np.zeros(m, dtype=np.int64)
    reg = np.asarray(registers["reg"], dtype=np.int64)
    rho[reg] = np.asarray(registers["rho"], dtype=np.int64)
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    raw = alpha * m * m / np.sum(np.exp2(-rho.astype(np.float64)))
    zeros = int(np.count_nonzero(rho == 0))
    if raw <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))
    return float(raw)


def grouped_hll_registers(
    ds: ray.data.Dataset,
    key_column: str,
    group_column: str,
    p: int = 6,
) -> pa.Table:
    """Per-group HyperLogLog register table: (group, reg, rho), ascending
    (group, reg) — approximate distinct-keys-per-group (users per event
    type, urls per domain) at sketch cost.

    Same scale shape as the global ``hll_registers``: each batch folds to
    at most ``groups_in_batch * 2^p`` rows via ONE composite
    ``np.maximum.at`` (group code * m + reg), so the exchange is bounded
    by group cardinality x register count, never data-sized.  MAX commutes
    -> partition-invariant; md5be hash -> the register table is
    SQL-reproducible bit-for-bit (GROUP BY group added to the global
    oracle).  Null group keys fail loud (the grouped_heavy_hitters
    convention); estimates stay lib-side (``hll_estimate`` per group)."""
    from ray.data.aggregate import Max

    from .membership import md5_halves

    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        grp = batch[group_column]
        if grp.null_count:
            raise ValueError(
                f"grouped_hll_registers: null values in group column "
                f"{group_column!r}"
            )
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        h1, _ = md5_halves(batch[key_column])
        reg, rho = _hll_reg_rho(h1, p)
        if len(reg) == 0:
            return pa.table(
                {
                    group_column: pa.array([], grp.type),
                    "reg": pa.array([], pa.int64()),
                    "rho": pa.array([], pa.int64()),
                }
            )
        denc = pc.dictionary_encode(grp)
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        codes = np.asarray(denc.indices, dtype=np.int64)
        comp = codes * m + reg
        gm = np.zeros(len(denc.dictionary) * m, dtype=np.int64)
        np.maximum.at(gm, comp, rho)
        hit = np.flatnonzero(gm)
        return pa.table(
            {
                group_column: denc.dictionary.take(pa.array(hit // m)),
                "reg": pa.array(hit % m),
                "rho": pa.array(gm[hit]),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_column, "reg"])
        .aggregate(Max("rho"))
        .sort([group_column, "reg"])
        .to_pandas()
    )
    if group_column not in out.columns:  # all-empty blocks lose the schema
        gtype = ds.schema().base_schema.field(group_column).type
        return pa.table(
            {
                group_column: pa.array([], gtype),
                "reg": pa.array([], pa.int64()),
                "rho": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            group_column: pa.array(out[group_column]),
            "reg": pa.array(out["reg"].to_numpy().astype(np.int64)),
            "rho": pa.array(out["max(rho)"].to_numpy().astype(np.int64)),
        }
    )


def grouped_hll_estimates(
    registers: pa.Table, group_column: str, p: int = 6
) -> dict:
    """{group: float estimate} from a grouped register table — the
    lib-side float companion to ``grouped_hll_registers`` (same
    bias/small-range rules as ``hll_estimate``)."""
    df = registers.to_pandas()
    out: dict = {}
    for g, sub in df.groupby(group_column, sort=False):
        out[g] = hll_estimate(
            pa.table(
                {
                    "reg": pa.array(sub["reg"].to_numpy(np.int64)),
                    "rho": pa.array(sub["rho"].to_numpy(np.int64)),
                }
            ),
            p=p,
        )
    return out


def count_min_sketch(
    ds: ray.data.Dataset,
    text_column: str = "text",
    width: int = 1024,
    depth: int = 4,
) -> pa.Table:
    """Distributed Count-Min sketch over whitespace tokens (Cormode &
    Muthukrishnan 2005): a (depth x width) counter grid where row i
    bumps bucket ``(h1 + i*h2) mod width`` per token occurrence.

    Scale shape: each batch folds its tokens into ONE local (depth x
    width) ``np.add.at`` grid and emits only the nonzero cells, so the
    exchange is sketch-sized (<= depth*width rows per batch), never
    vocabulary-sized; a tiny groupby-sum folds the global grid.

    Everything is integer and the hash is the md5be/Kirsch-Mitzenmacher
    convention (membership.py), so the ENTIRE sketch — and any point
    estimate, which is just MIN over the term's depth cells — is
    SQL-reproducible bit-for-bit, unlike the float-noise sketches CM
    replaces.  Output: (row, bucket, count) ascending, zero cells
    absent (the SQL GROUP BY model)."""
    from ray.data.aggregate import Sum

    from .membership import bloom_positions, md5_halves

    if width < 1 or depth < 1:
        raise ValueError("width and depth must be >= 1")
    if width > 1 << 32:
        raise ValueError("width must be <= 2^32 (SQL-overflow-safe domain)")

    def partial(batch: pa.Table) -> pa.Table:
        flat = _ws_token_flat(batch[text_column])
        if len(flat) == 0:
            return pa.table(
                {
                    "row": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                    "count": pa.array([], pa.int64()),
                }
            )
        h1, h2 = md5_halves(flat)
        pos = bloom_positions(h1, h2, depth, width).astype(np.int64)  # (n, depth)
        grid = np.zeros((depth, width), dtype=np.int64)
        rows = np.broadcast_to(np.arange(depth, dtype=np.int64), pos.shape)
        np.add.at(grid, (rows.reshape(-1), pos.reshape(-1)), 1)
        r, b = np.nonzero(grid)
        return pa.table(
            {
                "row": pa.array(r.astype(np.int64)),
                "bucket": pa.array(b.astype(np.int64)),
                "count": pa.array(grid[r, b]),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["row", "bucket"])
        .aggregate(Sum("count", alias_name="count"))
        .sort(["row", "bucket"])
        .to_pandas()
    )
    return pa.table(
        {
            "row": pa.array(out["row"].to_numpy().astype(np.int64)),
            "bucket": pa.array(out["bucket"].to_numpy().astype(np.int64)),
            "count": pa.array(out["count"].to_numpy().astype(np.int64)),
        }
    )


def cm_estimate(sketch: pa.Table, terms: list[str], width: int, depth: int) -> pa.Table:
    """Point-frequency upper bounds from a Count-Min sketch table: per
    term, MIN over its depth cells (absent cell = 0).  Integer-exact and
    SQL-reproducible; CM guarantees estimate >= true count."""
    from .membership import bloom_positions, md5_halves

    grid = np.zeros((depth, width), dtype=np.int64)
    grid[
        np.asarray(sketch["row"], dtype=np.int64),
        np.asarray(sketch["bucket"], dtype=np.int64),
    ] = np.asarray(sketch["count"], dtype=np.int64)
    h1, h2 = md5_halves(pa.array(terms, pa.string()))
    pos = bloom_positions(h1, h2, depth, width).astype(np.int64)
    est = grid[np.arange(depth)[None, :], pos].min(axis=1)
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "est": pa.array(est.astype(np.int64)),
        }
    )


def grouped_heavy_hitters(
    ds: ray.data.Dataset,
    group_column: str,
    k: int = 50,
    text_column: str = "text",
) -> pa.Table:
    """Exact heavy hitters PER GROUP: every (group, term) with
    ``count * k >= group_total_tokens`` -> (group, term, count),
    (group, term) ascending.  The per-language / per-source head
    vocabulary, at the same candidate-sized exchange as the global op.

    The local-candidacy lemma holds per group unchanged: if
    ``count_g(t) * k >= N_g`` then some batch has
    ``count_{g,b}(t) * k >= N_{g,b}`` (sum the strict converses).  So
    pass 1 emits, per batch, at most k candidate rows per group present
    PLUS one exact total row per group (totals are never thresholded —
    pass-1 group totals are exact); pass 2 recounts only the broadcast
    candidate (group, term) pairs.  Group values compare as strings
    (the SQL VARCHAR grouping convention)."""
    from ray.data.aggregate import Sum

    from ..text.ws import ws_token_flat_with_row

    if k < 1:
        raise ValueError("k must be >= 1")

    def _empty() -> pa.Table:
        return pa.table(
            {
                "group": pa.array([], pa.string()),
                "term": pa.array([], pa.string()),
                "count": pa.array([], pa.int64()),
            }
        )

    def _esc_pairs(groups: pa.Array, terms: pa.Array) -> pa.Array:
        # combined (group NUL term) key: unambiguous because a NUL inside
        # a GROUP value would shift the split boundary — fail loud on it
        # (the '|' group-key convention from relational.py)
        if len(groups) and pc.any(
            pc.match_substring(groups, "\x00")
        ).as_py():
            raise ValueError(
                "grouped_heavy_hitters: group values must not contain NUL"
            )
        return pc.binary_join_element_wise(
            groups.cast(pa.string()), terms.cast(pa.string()), "\x00"
        )

    def candidates(batch: pa.Table) -> pa.Table:
        flat, rows = ws_token_flat_with_row(batch[text_column])
        gcol = batch[group_column]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        gcol = pc.fill_null(gcol.cast(pa.string()), "")
        if len(flat) == 0:
            return _empty()
        tok_groups = gcol.take(pa.array(rows))
        pair = _esc_pairs(tok_groups, flat)
        denc = pair.dictionary_encode()
        codes = np.asarray(denc.indices, dtype=np.int64)
        pair_counts = np.bincount(codes, minlength=len(denc.dictionary))
        # per-group batch totals, via the group of each distinct pair
        gden = tok_groups.dictionary_encode()
        gcodes = np.asarray(gden.indices, dtype=np.int64)
        g_tot = np.bincount(gcodes, minlength=len(gden.dictionary))
        # group code of each distinct PAIR: first occurrence index
        first_idx = np.zeros(len(denc.dictionary), dtype=np.int64)
        first_idx[codes[::-1]] = np.arange(len(codes) - 1, -1, -1)
        pair_g = gcodes[first_idx]
        keep = pair_counts * k >= g_tot[pair_g]
        kept = pa.array(np.flatnonzero(keep))
        pair_vals = denc.dictionary.take(kept).cast(pa.string())
        out_term = pc.binary_join_element_wise(
            pa.array(["t"] * len(pair_vals), pa.string()), pair_vals, ""
        )
        tot_vals = pc.binary_join_element_wise(
            pa.array(["n"] * len(gden.dictionary), pa.string()),
            gden.dictionary.cast(pa.string()),
            "",
        )
        return pa.table(
            {
                "term": pa.concat_arrays(
                    [out_term.combine_chunks() if isinstance(out_term, pa.ChunkedArray) else out_term,
                     tot_vals.combine_chunks() if isinstance(tot_vals, pa.ChunkedArray) else tot_vals]
                ),
                "count": pa.array(
                    np.concatenate([pair_counts[keep], g_tot]).astype(np.int64)
                ),
            }
        )

    cand = (
        ds.map_batches(candidates, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("count", alias_name="count"))
        .to_pandas()
    )
    if len(cand) == 0:
        return _empty()
    is_total = cand["term"].str.startswith("n")
    totals = {t[1:]: int(c) for t, c in
              zip(cand.loc[is_total, "term"], cand.loc[is_total, "count"])}
    cand_pairs = sorted(t[1:] for t in cand.loc[~is_total, "term"])
    if not cand_pairs or not totals:
        return _empty()
    cand_ref = ray.put(pa.array(cand_pairs, pa.string()))

    def recount(batch: pa.Table) -> pa.Table:
        cand_arr = ray.get(cand_ref)
        flat, rows = ws_token_flat_with_row(batch[text_column])
        if len(flat) == 0:
            return pa.table(
                {"pair": pa.array([], pa.string()), "count": pa.array([], pa.int64())}
            )
        gcol = batch[group_column]
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        gcol = pc.fill_null(gcol.cast(pa.string()), "")
        pair = _esc_pairs(gcol.take(pa.array(rows)), flat)
        if isinstance(pair, pa.ChunkedArray):
            pair = pair.combine_chunks()
        hit = pair.filter(pc.is_in(pair, value_set=cand_arr))
        if len(hit) == 0:
            return pa.table(
                {"pair": pa.array([], pa.string()), "count": pa.array([], pa.int64())}
            )
        denc = hit.dictionary_encode()
        counts = np.bincount(
            np.asarray(denc.indices, dtype=np.int64), minlength=len(denc.dictionary)
        )
        return pa.table(
            {
                "pair": denc.dictionary.cast(pa.string()),
                "count": pa.array(counts.astype(np.int64)),
            }
        )

    out = (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("count", alias_name="count"))
        .to_pandas()
    )
    if len(out) == 0:
        return _empty()
    groups, terms, counts = [], [], []
    for p, c in zip(out["pair"], out["count"]):
        g, t = p.split("\x00", 1)
        if int(c) * k >= totals.get(g, 0) and totals.get(g, 0) > 0:
            groups.append(g)
            terms.append(t)
            counts.append(int(c))
    order = sorted(range(len(groups)), key=lambda i: (groups[i], terms[i]))
    return pa.table(
        {
            "group": pa.array([groups[i] for i in order], pa.string()),
            "term": pa.array([terms[i] for i in order], pa.string()),
            "count": pa.array([counts[i] for i in order], pa.int64()),
        }
    )


def hist_quantiles(
    ds: ray.data.Dataset,
    column: str,
    q_pcts: tuple[int, ...] = (25, 50, 75, 90, 99),
    bins: int = 4096,
) -> pa.Table:
    """Approximate quantiles of a CONTINUOUS column via a fixed-depth
    histogram between the exact global min/max — the scale path where
    exact quantiles would need a full sort (the exact
    ``grouped_int_quantiles`` bounded-exchange trick needs a small
    distinct-value domain; doubles don't have one).

    Two bounded passes:
      1. exact global Min/Max (tiny commutative aggregate);
      2. per-batch bucket histogram ``floor((x - mn) / (mx - mn) * bins)``
         clamped to bins-1, nonzero cells emitted -> groupby-sum — the
         exchange is <= bins rows per batch, never data-sized, and the
         sums commute so the result is partition-invariant (tested).

    Rank convention: the answer for q% is the first bucket whose
    cumulative count reaches ``ceil(q * n / 100)`` (integer arithmetic);
    the estimate is that bucket's LOWER edge, so the error is at most one
    bucket width in value space (tested against exact quantiles).
    Bucketing and edges use only +,-,*,/ IEEE doubles in a fixed
    operation order — no libm calls — so a DuckDB oracle reproduces every
    row bit-for-bit (unlike ln/exp scores, which round differently across
    environments).

    Output: (q_pct, bucket, rank, cum_count, est) ascending by q_pct;
    NULLs are excluded on both sides.  Raises on an empty column.
    """
    from ray.data.aggregate import Max, Min, Sum

    if bins < 1:
        raise ValueError("bins must be >= 1")
    if not q_pcts or any(not (0 < q <= 100) for q in q_pcts):
        raise ValueError("q_pcts must be integers in (0, 100]")

    mm = ds.aggregate(
        Min(column, alias_name="mn"), Max(column, alias_name="mx")
    )  # Ray aggregates ignore nulls by default, matching the SQL MIN/MAX
    if mm["mn"] is None:
        raise ValueError(f"hist_quantiles: column {column!r} has no non-null values")
    mn, mx = float(mm["mn"]), float(mm["mx"])

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.drop_null(batch[column]).to_numpy(zero_copy_only=False).astype(np.float64)
        if len(x) == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "count": pa.array([], pa.int64())}
            )
        if mx == mn:
            b = np.zeros(len(x), dtype=np.int64)
        else:
            b = np.floor((x - mn) / (mx - mn) * bins).astype(np.int64)
            b = np.minimum(b, bins - 1)  # x == mx lands in the last bucket
        counts = np.bincount(b, minlength=0)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64)),
                "count": pa.array(counts[nz].astype(np.int64)),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("count", alias_name="count"))
        .sort("bucket")
        .to_pandas()
    )
    if len(hist) == 0:
        raise ValueError(f"hist_quantiles: column {column!r} has no non-null values")
    buckets = hist["bucket"].to_numpy().astype(np.int64)
    counts = hist["count"].to_numpy().astype(np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1])
    rows = {"q_pct": [], "bucket": [], "rank": [], "cum_count": [], "est": []}
    for q in sorted(q_pcts):
        rank = (q * n + 99) // 100  # ceil(q*n/100), pure integers
        i = int(np.searchsorted(cum, rank, side="left"))
        b = int(buckets[i])
        est = mn if mx == mn else mn + b * (mx - mn) / bins
        rows["q_pct"].append(int(q))
        rows["bucket"].append(b)
        rows["rank"].append(int(rank))
        rows["cum_count"].append(int(cum[i]))
        rows["est"].append(est)
    return pa.table(
        {
            "q_pct": pa.array(rows["q_pct"], pa.int64()),
            "bucket": pa.array(rows["bucket"], pa.int64()),
            "rank": pa.array(rows["rank"], pa.int64()),
            "cum_count": pa.array(rows["cum_count"], pa.int64()),
            "est": pa.array(rows["est"], pa.float64()),
        }
    )
