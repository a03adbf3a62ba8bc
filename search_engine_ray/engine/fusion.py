"""Reciprocal-rank fusion (RRF) of ranked result lists.

Beyond-reference surface: the reference runs its three scorers
independently and writes three run files (/root/reference/src/Program.cs:99-132)
— it never combines them.  RRF (Cormack et al., SIGIR 2009) is the
standard score-free fusion: fused(d) = sum over runs of 1/(k + rank_r(d)).

Integer-exact scoring
---------------------
Each rank contribution is computed as ``1_000_000 // (k + rank)`` (integer
micros), so the fused score is a sum of integers — bit-identical across
engines and immune to float summation order.  This is the same
micros-encoding convention the driver-gate oracles use.

Two surfaces:

- ``rrf_fuse_lists``: per-query fusion of in-memory rank lists (the query
  actor path — lists are top-k sized, never corpus-sized).
- ``rrf_fuse_runs``: dataset-level fusion of TREC-style run tables
  ``(topic, doc, rank)`` — union -> vectorized per-batch contribution ->
  one (topic, doc) groupby sum -> per-topic bounded top-k via map_groups.
  The only shuffle is keyed by (topic, doc); group payload is bounded by
  the number of fused runs, and no stage materializes more than the
  fused-run union.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

RRF_K = 60


def rrf_fuse_lists(
    rank_lists: list[np.ndarray], k: int = RRF_K, top_k: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Fuse rank lists (each an array of doc ids in rank order, rank 1
    first) -> (doc_ids, fused_micros), fused descending, ties -> ascending
    doc id (the engine-wide deterministic tie rule)."""
    scores: dict[int, int] = {}
    for ids in rank_lists:
        for rank, d in enumerate(np.asarray(ids).tolist(), 1):
            scores[d] = scores.get(d, 0) + 1_000_000 // (k + rank)
    if not scores:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    ids = np.fromiter(scores.keys(), dtype=np.int64, count=len(scores))
    sc = np.fromiter(scores.values(), dtype=np.int64, count=len(scores))
    order = np.lexsort((ids, -sc))
    if top_k is not None:
        order = order[:top_k]
    return ids[order], sc[order]


def rrf_fuse_runs(
    runs: list["ray.data.Dataset"],  # noqa: F821 - imported lazily
    k: int = RRF_K,
    top_k: int = 10,
    topic_column: str = "topic",
    doc_column: str = "doc",
    rank_column: str = "rank",
):
    """Fuse run tables -> Dataset(topic, doc, fused_micros, fused_rank).

    Each input holds one ranking per topic with ranks 1..n.  Contributions
    are vectorized per batch; the one shuffle groups by (topic, doc)."""
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    def contribution(batch: pa.Table) -> pa.Table:
        ranks = np.asarray(batch[rank_column], dtype=np.int64)
        return pa.table(
            {
                topic_column: batch[topic_column],
                doc_column: batch[doc_column],
                "rrf_micros": pa.array(1_000_000 // (k + ranks)),
            }
        )

    unioned = runs[0].union(*runs[1:]) if len(runs) > 1 else runs[0]
    fused = (
        unioned.map_batches(contribution, batch_format="pyarrow")
        .groupby([topic_column, doc_column])
        .aggregate(Sum("rrf_micros", alias_name="fused_micros"))
    )

    def topic_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["fused_micros", doc_column], ascending=[False, True], ignore_index=True
        ).head(top_k)
        g["fused_rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return fused.groupby(topic_column).map_groups(topic_topk)


def comb_fuse_runs(
    runs: list["ray.data.Dataset"],  # noqa: F821 - imported lazily
    topic_column: str = "topic",
    doc_column: str = "doc",
    score_column: str = "score_micros",
):
    """CombSUM / CombMNZ fusion (Fox & Shaw, TREC-2 1994) of scored run
    tables -> Dataset(topic, doc, combsum_micros, combmnz_micros, n_runs).

    Each input run holds integer-micros scores per (topic, doc).  Scores
    are min-max normalized WITHIN each (run, topic) ranking to integer
    micros — ``(s - min) * 1_000_000 // (max - min)`` (1_000_000 when the
    run's scores are constant) — so the fused sums stay integer-exact and
    engine-order-independent.  CombSUM is the sum of normalized scores;
    CombMNZ multiplies that sum by the number of runs that retrieved the
    doc (the MNZ "multiply by non-zero" rule).

    Distributed shape: per-(run, topic) extrema come from a groupby over
    <= n_runs * n_topics keys whose result is tiny by construction — it
    is collected once and shipped to every normalize task inside the
    map_batches closure (the broadcast-small-side pattern); the one
    data-sized exchange is the (topic, doc) groupby-sum, exactly as in
    :func:`rrf_fuse_runs`.
    """
    import ray.data
    from ray.data.aggregate import Count, Max, Min, Sum

    tagged = []
    for run_id, r in enumerate(runs):
        tagged.append(
            r.map_batches(
                lambda b, rid=run_id: b.append_column(
                    "run_id", pa.array(np.full(b.num_rows, rid, dtype=np.int64))
                ),
                batch_format="pyarrow",
            )
        )
    unioned = tagged[0].union(*tagged[1:]) if len(tagged) > 1 else tagged[0]

    extrema = (
        unioned.groupby(["run_id", topic_column])
        .aggregate(
            Min(score_column, alias_name="mn"), Max(score_column, alias_name="mx")
        )
        .to_pandas()  # <= n_runs * n_topics rows — bounded by construction
    )
    # Ray 2.49: an all-empty aggregate collects to a ZERO-COLUMN frame
    if len(extrema) == 0 or "run_id" not in extrema.columns:
        mnmx = {}
    else:
        mnmx = {
            (int(r), t): (int(mn), int(mx))
            for r, t, mn, mx in zip(
                extrema["run_id"], extrema[topic_column], extrema["mn"], extrema["mx"]
            )
        }

    def normalize(batch: pa.Table) -> pa.Table:
        rid = np.asarray(batch["run_id"], dtype=np.int64)
        topics = np.asarray(batch[topic_column].to_pandas(), dtype=object)
        s = np.asarray(batch[score_column], dtype=np.int64)
        # vectorized per unique (run, topic) group: the group count per
        # batch is bounded by n_runs * topics-in-batch, not by rows
        keys = np.char.add(
            np.char.add(rid.astype("U20"), "\x00"), topics.astype("U64")
        )
        uniq, inv = np.unique(keys, return_inverse=True)
        first = np.zeros(len(uniq), dtype=np.int64)
        first[inv[::-1]] = np.arange(len(s) - 1, -1, -1)
        mn_a = np.empty(len(uniq), dtype=np.int64)
        mx_a = np.empty(len(uniq), dtype=np.int64)
        for g, row in enumerate(first.tolist()):
            mn_a[g], mx_a[g] = mnmx[(int(rid[row]), topics[row])]
        span = mx_a - mn_a
        safe = np.where(span == 0, 1, span)
        norm = np.where(
            span[inv] == 0, 1_000_000, (s - mn_a[inv]) * 1_000_000 // safe[inv]
        )
        return pa.table(
            {
                topic_column: batch[topic_column],
                doc_column: batch[doc_column],
                "norm_micros": pa.array(norm),
            }
        )

    fused = (
        unioned.map_batches(normalize, batch_format="pyarrow")
        .groupby([topic_column, doc_column])
        .aggregate(
            Sum("norm_micros", alias_name="combsum_micros"),
            Count(alias_name="n_runs"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["combsum_micros"], dtype=np.int64)
        n = np.asarray(batch["n_runs"], dtype=np.int64)
        return pa.table(
            {
                topic_column: batch[topic_column],
                doc_column: batch[doc_column],
                "combsum_micros": pa.array(s),
                "combmnz_micros": pa.array(n * s),
                "n_runs": pa.array(n),
            }
        )

    return fused.map_batches(finish, batch_format="pyarrow")
