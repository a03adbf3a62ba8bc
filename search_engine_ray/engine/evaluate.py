"""TREC-style run evaluation — the trec_eval step downstream of the
reference's run writer (Program.cs:150-164 emits the 6-field lines
trec_eval consumes; this module computes the metrics themselves).

Per-topic metrics from a run table (topic, doc_id, rank) and a qrels
table (topic, doc_id):

- ``n_ret`` / ``n_rel`` / ``n_rel_ret`` — the trec_eval counting row
- ``hits_at_k`` — P@k numerator (integer; P@k = hits_at_k / k)
- ``first_rel_rank`` — rank of the first relevant doc, -1 if none
- ``rr_micros`` — floor(1e6 / first_rel_rank), 0 if none (MRR =
  mean over topics)
- ``sum_prec_micros`` — sum over relevant retrieved docs of
  floor(1e6 * cum_rel / rank) (AP = that / (1e6 * n_rel)): each
  precision term is FLOORED to integer micros BEFORE the sum, so the
  result is partition/order/libm-invariant and a SQL oracle
  reproduces it bit-for-bit — the unigram_lm/pagerank flooring
  convention.  nDCG needs log2 and stays out of the exact surface.

Scale shape: relevance tagging is ONE (topic, doc_id) hash join (both
sides topic-scale — never a broadcast); the per-topic fold is the
window_fns bucket pattern — topics hash into ``n_buckets`` groups, one
shuffle, and each bucket folds ALL its topics in one vectorized
lexsort + segmented pass (never a per-topic Python loop).  Qrel rows
ride the SAME shuffle as flagged rows, so n_rel needs no second
exchange.  Output is one row per topic appearing in run or qrels.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data

from ..dataops.dedup import _join_parts
from ..dataops.window_fns import _bucket_of

_M = 1_000_000

_OUT_FIELDS = (
    "topic",
    "n_ret",
    "n_rel",
    "n_rel_ret",
    "hits_at_k",
    "first_rel_rank",
    "rr_micros",
    "sum_prec_micros",
)


def _empty_out() -> pa.Table:
    return pa.table({f: pa.array([], pa.int64()) for f in _OUT_FIELDS})


def evaluate_run(
    run: ray.data.Dataset,
    qrels: ray.data.Dataset,
    k: int = 10,
    n_buckets: int = 256,
    join_partitions: int = 8,
) -> ray.data.Dataset:
    """Per-topic retrieval metrics.  ``run``: (topic, doc_id, rank) with
    rank 1-based and unique per topic; ``qrels``: (topic, doc_id)
    relevant pairs — duplicates are deduplicated first (trec_eval
    semantics; a duplicate would otherwise inflate every run-side
    metric through the join).  All int64.  Returns one row per topic
    with the integer metric columns documented in the module
    docstring."""
    if k < 1:
        raise ValueError(f"evaluate_run: k must be >= 1 (got {k})")

    # dedup qrels first (trec_eval does the same): a duplicate (topic,
    # doc_id) pair would fan the join out and silently inflate every
    # run-side metric.  One (pair-cardinality-bounded) exchange.
    from ray.data.aggregate import Count as _Count

    qrels = (
        qrels.select_columns(["topic", "doc_id"])
        .groupby(["topic", "doc_id"])
        .aggregate(_Count(alias_name="_n"))
        .select_columns(["topic", "doc_id"])
    )

    def flag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "rel", pa.array(np.ones(batch.num_rows, dtype=np.int64))
        )

    flagged = qrels.map_batches(flag, batch_format="pyarrow").materialize()
    run = run.select_columns(["topic", "doc_id", "rank"]).materialize()
    jp = _join_parts(join_partitions)
    tagged = run.join(
        flagged,
        "left_outer",
        jp,
        on=("topic", "doc_id"),
        right_on=("topic", "doc_id"),
    )

    def run_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = np.asarray(batch["topic"], dtype=np.int64)
        return pa.table(
            {
                "topic": pa.array(t),
                "rank": pa.array(np.asarray(batch["rank"], dtype=np.int64)),
                "rel": pa.array(
                    np.asarray(pc.fill_null(batch["rel"], 0), dtype=np.int64)
                ),
                "is_qrel": pa.array(np.zeros(len(t), dtype=np.int64)),
                "_bucket": pa.array(
                    _bucket_of(t, n_buckets).astype(np.int64)
                ),
            }
        )

    def qrel_rows(batch: pa.Table) -> pa.Table:
        t = np.asarray(batch["topic"], dtype=np.int64)
        return pa.table(
            {
                "topic": pa.array(t),
                "rank": pa.array(np.zeros(len(t), dtype=np.int64)),
                "rel": pa.array(np.ones(len(t), dtype=np.int64)),
                "is_qrel": pa.array(np.ones(len(t), dtype=np.int64)),
                "_bucket": pa.array(
                    _bucket_of(t, n_buckets).astype(np.int64)
                ),
            }
        )

    unioned = tagged.map_batches(run_rows, batch_format="pyarrow").union(
        qrels.map_batches(qrel_rows, batch_format="pyarrow")
    )

    def fold(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _empty_out()
        t = np.asarray(group["topic"], dtype=np.int64)
        rank = np.asarray(group["rank"], dtype=np.int64)
        rel = np.asarray(group["rel"], dtype=np.int64)
        is_q = np.asarray(group["is_qrel"], dtype=np.int64)

        topics = np.unique(t)
        seg_of = np.searchsorted(topics, t)  # topic -> dense output slot
        n = len(topics)

        # int64 np.add.at accumulators, not bincount weights (float64
        # would silently lose exactness above 2^53)
        n_rel = np.zeros(n, dtype=np.int64)
        np.add.at(n_rel, seg_of, is_q)

        rmask = is_q == 0
        rt, rr, rrel = seg_of[rmask], rank[rmask], rel[rmask]
        n_ret = np.bincount(rt, minlength=n).astype(np.int64)
        n_rel_ret = np.zeros(n, dtype=np.int64)
        np.add.at(n_rel_ret, rt, rrel)
        hits_at_k = np.zeros(n, dtype=np.int64)
        np.add.at(hits_at_k, rt, rrel * (rr <= k))

        first = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        hit = rrel == 1
        np.minimum.at(first, rt[hit], rr[hit])
        none = first == np.iinfo(np.int64).max
        rr_micros = np.where(none, 0, _M // np.maximum(first, 1))
        first = np.where(none, -1, first)

        # cum_rel along (topic, rank): sort run rows, segmented cumsum
        perm = np.lexsort((rr, rt))
        st, sr, srel = rt[perm], rr[perm], rrel[perm]
        boundary = np.empty(len(st), dtype=bool)
        if len(st):
            boundary[0] = True
            np.not_equal(st[1:], st[:-1], out=boundary[1:])
        cs = np.cumsum(srel)
        starts = np.flatnonzero(boundary)
        offs = np.zeros(len(starts), dtype=np.int64)
        if len(starts) > 1:
            offs[1:] = cs[starts[1:] - 1]
        seg = np.cumsum(boundary) - 1
        cum = cs - offs[seg] if len(st) else cs
        prec = np.where(srel == 1, (cum * _M) // np.maximum(sr, 1), 0)
        sum_prec = np.zeros(n, dtype=np.int64)
        np.add.at(sum_prec, st, prec)

        return pa.table(
            {
                "topic": pa.array(topics),
                "n_ret": pa.array(n_ret),
                "n_rel": pa.array(n_rel),
                "n_rel_ret": pa.array(n_rel_ret),
                "hits_at_k": pa.array(hits_at_k),
                "first_rel_rank": pa.array(first),
                "rr_micros": pa.array(rr_micros),
                "sum_prec_micros": pa.array(sum_prec),
            }
        )

    return unioned.groupby("_bucket").map_groups(fold, batch_format="pyarrow")


def ndcg_at_k(run: pa.Table, qrels: pa.Table, k: int = 10) -> pa.Table:
    """Per-topic nDCG@k from the same (topic, doc_id, rank) run and
    (topic, doc_id) binary qrels.  Float by nature (log2 discounts), so
    it stays OUT of the SQL-exact surface (pytest-pinned only) — the
    integer metric core lives in evaluate_run.  Driver-side: run tables
    are topic x k-sized; callers at corpus scale should aggregate
    evaluate_run's integer columns instead."""
    if k < 1:
        raise ValueError(f"ndcg_at_k: k must be >= 1 (got {k})")
    t = np.asarray(run["topic"], dtype=np.int64)
    r = np.asarray(run["rank"], dtype=np.int64)
    qt = np.asarray(qrels["topic"], dtype=np.int64)
    qd = np.asarray(qrels["doc_id"], dtype=np.int64)
    d = np.asarray(run["doc_id"], dtype=np.int64)

    if (qd >= (1 << 32)).any() or (d >= (1 << 32)).any():
        raise ValueError("ndcg_at_k: doc_id must fit 32 bits (driver-side helper)")
    qkey = np.unique(qt.astype(np.uint64) << np.uint64(32) | qd.astype(np.uint64))
    rel = np.isin(t.astype(np.uint64) << np.uint64(32) | d.astype(np.uint64), qkey)

    topics = np.unique(np.concatenate([t, qt]))
    seg = np.searchsorted(topics, t)
    n = len(topics)
    dcg = np.zeros(n, dtype=np.float64)
    m = (r <= k) & rel
    np.add.at(dcg, seg[m], 1.0 / np.log2(r[m] + 1.0))
    n_rel = np.zeros(n, dtype=np.int64)
    np.add.at(n_rel, np.searchsorted(topics, qt), 1)
    discounts = 1.0 / np.log2(np.arange(1, k + 1) + 1.0)
    cumd = np.concatenate(([0.0], np.cumsum(discounts)))
    ideal = cumd[np.minimum(n_rel, k)]
    with np.errstate(invalid="ignore", divide="ignore"):
        ndcg = np.where(ideal > 0, dcg / ideal, 0.0)
    return pa.table(
        {
            "topic": pa.array(topics),
            "ndcg": pa.array(ndcg),
        }
    )


def run_agreement(
    run_a: ray.data.Dataset,
    run_b: ray.data.Dataset,
    k: int = 10,
    join_partitions: int = 8,
) -> ray.data.Dataset:
    """Per-topic agreement between two runs — the regression tool for
    comparing scorers, index versions, or codec/method variants without
    qrels.  Inputs: two (topic, doc_id, rank) run tables, rank 1-based
    and unique per topic.  For each topic, over the rank<=k prefixes:

      n_a / n_b      rows each run retrieved (<= k)
      n_common       |top-k(A) intersect top-k(B)|
      concordant /   Kendall-tau numerators over the COMMON docs: doc
      discordant     pairs the two runs order the same / opposite way
      footrule_sum   Spearman footrule sum |rank_a - rank_b| over common

    All integer-exact (ranks are ints), so a SQL oracle reproduces every
    cell.  Shape: per-side rank<=k filters (k-bounded per topic), one
    (topic, doc_id) hash join for the intersection, per-topic vectorized
    fold over <= k common rows (the O(c^2) pair count is over c <= k), a
    topic-keyed join of the tiny per-side counts.  Nothing larger than
    the run prefixes moves."""
    if k < 1:
        raise ValueError(f"run_agreement: k must be >= 1 (got {k})")
    from ray.data.aggregate import Count as _Count

    from ..ioutil import nonempty_blocks

    def prefix(ds, rank_name):
        def f(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            b = batch.filter(pc.less_equal(batch["rank"], k))
            return pa.table(
                {
                    "topic": b["topic"],
                    "doc_id": b["doc_id"],
                    rank_name: b["rank"],
                }
            )

        return ds.select_columns(["topic", "doc_id", "rank"]).map_batches(
            f, batch_format="pyarrow"
        )

    a = prefix(run_a, "rank_a").materialize()
    b = prefix(run_b, "rank_b").materialize()
    counts_a = nonempty_blocks(
        a.groupby("topic").aggregate(_Count(alias_name="n_a")).materialize()
    )
    counts_b = nonempty_blocks(
        b.groupby("topic").aggregate(_Count(alias_name="n_b")).materialize()
    )
    jp = _join_parts(join_partitions)
    common = nonempty_blocks(
        a.join(b, "inner", jp, on=("topic", "doc_id"), right_on=("topic", "doc_id"))
        .materialize()
    )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "topic": pa.array([], pa.int64()),
                "n_common": pa.array([], pa.int64()),
                "concordant": pa.array([], pa.int64()),
                "discordant": pa.array([], pa.int64()),
                "footrule_sum": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        t = np.asarray(group["topic"], dtype=np.int64)
        ra = np.asarray(group["rank_a"], dtype=np.int64)
        rb = np.asarray(group["rank_b"], dtype=np.int64)
        topics = np.unique(t)
        rows = []
        for tid in topics:
            m = t == tid
            xa, xb = ra[m], rb[m]
            c = len(xa)
            da = xa[:, None] - xa[None, :]
            db = xb[:, None] - xb[None, :]
            prod = da * db
            iu = np.triu_indices(c, 1)
            conc = int((prod[iu] > 0).sum())
            disc = int((prod[iu] < 0).sum())
            rows.append((int(tid), c, conc, disc, int(np.abs(xa - xb).sum())))
        cols = list(zip(*rows))
        return pa.table(
            {
                "topic": pa.array(list(cols[0]), pa.int64()),
                "n_common": pa.array(list(cols[1]), pa.int64()),
                "concordant": pa.array(list(cols[2]), pa.int64()),
                "discordant": pa.array(list(cols[3]), pa.int64()),
                "footrule_sum": pa.array(list(cols[4]), pa.int64()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        # many topics per fold call (the evaluate_run bucketing): a
        # per-topic map_groups would be one Python call per query at
        # query-log scale
        b = _bucket_of(np.asarray(batch["topic"], dtype=np.int64), 256)
        return batch.append_column("_bucket", pa.array(b.astype(np.int64)))

    per_common = nonempty_blocks(
        common.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(fold, batch_format="pyarrow")
        .materialize()
    )

    # assemble: counts are topic-sized; two left joins off the a-side
    # (topics absent from a run entirely simply don't appear on its side)
    out = counts_a.join(
        counts_b, "full_outer", jp, on=("topic",), right_on=("topic",)
    )
    out = nonempty_blocks(out.materialize()).join(
        per_common, "left_outer", jp, on=("topic",), right_on=("topic",)
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        z = pa.array(np.zeros(n, dtype=np.int64))
        cols = {"topic": batch["topic"].cast(pa.int64())}
        for c in ("n_a", "n_b", "n_common", "concordant", "discordant", "footrule_sum"):
            col = batch[c] if c in batch.column_names else z
            cols[c] = pc.fill_null(col.cast(pa.int64()), 0)
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow")


def rbo_overlap(
    run_a: ray.data.Dataset,
    run_b: ray.data.Dataset,
    k: int = 10,
    p_num: int = 9,
    p_den: int = 10,
    join_partitions: int = 8,
) -> ray.data.Dataset:
    """Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) between
    two runs — the TOP-WEIGHTED rank-similarity metric run_agreement's
    Kendall/footrule columns are not: early-rank disagreement costs more
    than tail disagreement, with persistence ``p = p_num/p_den``.

    Prefix (depth-k, "min"-variant) RBO per topic:

        RBO@k = (1 - p) * sum_{d=1..k} p^(d-1) * overlap_d / d

    where overlap_d = |top-d(A) intersect top-d(B)|.  With rational p
    the whole sum is INTEGER-exact when scaled by lcm(1..k) * p_den^(k-1):

        rbo_scaled = sum_d (L//d) * p_num^(d-1) * p_den^(k-d) * overlap_d

    (L = lcm(1..k)); the emitted ``rbo_micros`` is one correctly-rounded
    float division of two exact int64s, so any SQL engine reproduces it
    bit-for-bit.  k is capped so the scale factor stays in int64.

    Output: Dataset(topic, n_common, rbo_scaled, rbo_micros) for every
    topic present in either run (zero rows for disjoint prefixes).
    Shape: identical to run_agreement — per-side rank<=k filters, ONE
    (topic, doc_id) hash join, bucketed per-topic vectorized folds;
    nothing larger than the run prefixes moves.
    """
    if k < 1:
        raise ValueError(f"rbo_overlap: k must be >= 1 (got {k})")
    if not (0 < p_num < p_den):
        raise ValueError(f"rbo_overlap: need 0 < p_num < p_den (got {p_num}/{p_den})")
    L = math.lcm(*range(1, k + 1))
    denom = L * p_den**k
    # max rbo_scaled <= L * k * p_den^(k-1) * k; keep everything int64
    if denom > 2**52 or L * p_den ** (k - 1) * k * k > 2**62:
        raise ValueError(f"rbo_overlap: k={k} overflows the exact scale factor")
    coef = [
        (L // d) * p_num ** (d - 1) * p_den ** (k - d) for d in range(1, k + 1)
    ]
    coef_arr = np.asarray(coef, dtype=np.int64)

    from ray.data.aggregate import Count as _Count

    from ..ioutil import nonempty_blocks

    def prefix(ds, rank_name):
        def f(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            b = batch.filter(pc.less_equal(batch["rank"], k))
            return pa.table(
                {"topic": b["topic"], "doc_id": b["doc_id"], rank_name: b["rank"]}
            )

        return ds.select_columns(["topic", "doc_id", "rank"]).map_batches(
            f, batch_format="pyarrow"
        )

    a = prefix(run_a, "rank_a").materialize()
    b = prefix(run_b, "rank_b").materialize()
    jp = _join_parts(join_partitions)
    topics_a = a.groupby("topic").aggregate(_Count(alias_name="n_a"))
    topics_b = b.groupby("topic").aggregate(_Count(alias_name="n_b"))
    universe = nonempty_blocks(
        topics_a.join(topics_b, "full_outer", jp, on=("topic",), right_on=("topic",))
        .select_columns(["topic"])
        .materialize()
    )
    common = nonempty_blocks(
        a.join(b, "inner", jp, on=("topic", "doc_id"), right_on=("topic", "doc_id"))
        .materialize()
    )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "topic": pa.array([], pa.int64()),
                "n_common": pa.array([], pa.int64()),
                "rbo_scaled": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        t = np.asarray(group["topic"], dtype=np.int64)
        md = np.maximum(
            np.asarray(group["rank_a"], dtype=np.int64),
            np.asarray(group["rank_b"], dtype=np.int64),
        )
        topics = np.unique(t)
        rows = []
        for tid in topics:
            m = t == tid
            # overlap_d = #common docs with max(rank_a, rank_b) <= d
            counts = np.bincount(md[m], minlength=k + 1)[1 : k + 1]
            overlap = np.cumsum(counts)
            rows.append(
                (int(tid), int(overlap[-1]), int(np.dot(coef_arr, overlap)))
            )
        cols = list(zip(*rows))
        return pa.table(
            {
                "topic": pa.array(list(cols[0]), pa.int64()),
                "n_common": pa.array(list(cols[1]), pa.int64()),
                "rbo_scaled": pa.array(list(cols[2]), pa.int64()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        bkt = _bucket_of(np.asarray(batch["topic"], dtype=np.int64), 256)
        return batch.append_column("_bucket", pa.array(bkt.astype(np.int64)))

    if universe is None:  # both runs empty
        return ray.data.from_arrow(
            pa.table(
                {
                    "topic": pa.array([], pa.int64()),
                    "n_common": pa.array([], pa.int64()),
                    "rbo_scaled": pa.array([], pa.int64()),
                    "rbo_micros": pa.array([], pa.int64()),
                }
            )
        )
    per_topic = (
        nonempty_blocks(
            common.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(fold, batch_format="pyarrow")
            .materialize()
        )
        if common is not None
        else None
    )
    if per_topic is None:  # disjoint prefixes: all-zero rows for all topics
        out = universe
    else:
        out = universe.join(
            per_topic, "left_outer", jp, on=("topic",), right_on=("topic",)
        )
    scale = float((p_den - p_num))
    fdenom = float(denom)

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        z = pa.array(np.zeros(n, dtype=np.int64))
        nc = pc.fill_null(
            (batch["n_common"] if "n_common" in batch.column_names else z).cast(
                pa.int64()
            ),
            0,
        )
        rs = pc.fill_null(
            (batch["rbo_scaled"] if "rbo_scaled" in batch.column_names else z).cast(
                pa.int64()
            ),
            0,
        )
        rs_np = np.asarray(rs, dtype=np.int64)
        rbo = rs_np.astype(np.float64) * scale / fdenom
        return pa.table(
            {
                "topic": batch["topic"].cast(pa.int64()),
                "n_common": nc,
                "rbo_scaled": rs,
                "rbo_micros": pa.array(
                    np.floor(rbo * 1_000_000.0 + 0.5).astype(np.int64)
                ),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def read_qrels(path: str) -> pa.Table:
    """Parse a TREC qrels file (``topic iter doc rel`` lines) ->
    (topic, doc, rel).  Keep callers' filtering policy out: all rows are
    returned, including rel == 0 judgments."""
    topics, docs, rels = [], [], []
    with open(path, encoding="utf-8") as fh:
        for lineno, line in enumerate(fh, 1):
            line = line.strip()
            if not line:
                continue
            parts = line.split()
            if len(parts) != 4:
                raise ValueError(
                    f"{path}:{lineno}: expected 4 fields, got {len(parts)}"
                )
            topics.append(int(parts[0]))
            docs.append(parts[2])
            rels.append(int(parts[3]))
    return pa.table(
        {
            "topic": pa.array(topics, pa.int64()),
            "doc": pa.array(docs, pa.string()),
            "rel": pa.array(rels, pa.int64()),
        }
    )
