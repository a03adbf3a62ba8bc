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
