"""Iterative graph algorithms — exact-integer PageRank.

The second iterative distributed workload after k-means (cluster.py):
per iteration the corpus-scale state (edge list, rank vector) stays in
the object store as Datasets; the driver only orchestrates.  Shape per
iteration: one hash join (ranks onto edges by src — both sides
node/edge-scale, so a JOIN, never a broadcast), one vectorized
``map_batches`` emitting per-edge contributions, one groupby-sum, and a
left join back onto the node set so rankless nodes keep the base mass.

Exactness: every per-edge contribution is floored in INTEGER micros
(``(d * r) // (100 * outdeg)``) before summation, so the result is
independent of summation order, partitioning and libm — a SQL oracle
unrolls the same iterations with ``//`` and matches bit-for-bit (the
round-3 lesson: floor the terms, not the sums).  Dangling nodes
(outdeg 0) leak their damped mass — the standard simplification,
documented so the oracle models the same dynamics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .dedup import _join_parts

_M = 1_000_000


def pagerank(
    edges: ray.data.Dataset,
    n_nodes: int,
    n_iter: int = 3,
    damping_pct: int = 85,
    src_column: str = "src",
    dst_column: str = "dst",
    join_partitions: int = 8,
) -> ray.data.Dataset:
    """(node, rank_micros) after ``n_iter`` exact-integer power
    iterations over a directed edge list.  ``n_nodes`` is the node-space
    size (ranks initialise to ``10^6 // n_nodes`` micros; nodes that
    never appear as a dst hold the base mass).  Returns a streaming
    node-sized Dataset."""
    from ray.data.aggregate import Count, Sum

    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    if n_nodes < 1:
        raise ValueError("n_nodes must be >= 1")
    base = ((100 - damping_pct) * _M) // (100 * n_nodes)
    r0 = _M // n_nodes
    jp = _join_parts(join_partitions)

    def distinct_nodes(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch[src_column], dtype=np.int64)
        d = np.asarray(batch[dst_column], dtype=np.int64)
        return pa.table({"node": pa.array(np.unique(np.concatenate([s, d])))})

    nodes = (
        edges.map_batches(distinct_nodes, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["node"])
        .materialize()
    )

    outdeg = (
        edges.select_columns([src_column])
        .groupby(src_column)
        .aggregate(Count(alias_name="outdeg"))
    )
    outdeg = outdeg.materialize()
    outdeg = outdeg.repartition(max(1, outdeg.count() // 500_000 + 1))
    # annotate every edge with its src outdegree ONCE (edge-sized join)
    edges_deg = edges.select_columns([src_column, dst_column]).join(
        outdeg, "inner", jp, on=(src_column,), right_on=(src_column,)
    )
    edges_deg = edges_deg.materialize()
    n_edges = edges_deg.count()
    edges_deg = edges_deg.repartition(max(1, n_edges // 500_000 + 1))

    def init_ranks(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"],
                "rank_micros": pa.array(
                    np.full(batch.num_rows, r0, dtype=np.int64)
                ),
            }
        )

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()

    for _ in range(n_iter):
        joined = edges_deg.join(
            ranks, "inner", jp, on=(src_column,), right_on=("node",)
        )

        def contrib(batch: pa.Table) -> pa.Table:
            r = np.asarray(batch["rank_micros"], dtype=np.int64)
            deg = np.asarray(batch["outdeg"], dtype=np.int64)
            c = (damping_pct * r) // (100 * deg)  # floored per edge
            return pa.table(
                {
                    "node": pa.array(np.asarray(batch[dst_column], dtype=np.int64)),
                    "c": pa.array(c),
                }
            )

        inbound = (
            joined.map_batches(contrib, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("c", alias_name="c"))
        )
        inbound = inbound.materialize()
        inbound = inbound.repartition(max(1, inbound.count() // 500_000 + 1))
        merged = nodes.join(
            inbound, "left_outer", jp, on=("node",), right_on=("node",)
        )

        def fold(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            c = pc.fill_null(batch["c"], 0)
            return pa.table(
                {
                    "node": batch["node"],
                    "rank_micros": pa.array(
                        base + np.asarray(c, dtype=np.int64)
                    ),
                }
            )

        ranks = merged.map_batches(fold, batch_format="pyarrow").materialize()

    return ranks


def hits(
    edges: ray.data.Dataset,
    n_iter: int = 2,
    src_column: str = "src",
    dst_column: str = "dst",
    join_partitions: int = 8,
) -> ray.data.Dataset:
    """Integer-exact HITS (Kleinberg hubs & authorities) over a directed
    edge list: per iteration, authority(v) = sum of hub over in-edges,
    hub(u) = sum of authority over out-edges, each rescaled to micros by
    the GLOBAL max (``(x * 10^6) // max`` — floored integer division, so
    the result is independent of summation order, partitioning and
    libm, like dataops.graph.pagerank).  Nodes with no in-edges hold
    authority 0; no out-edges, hub 0.

    Shape per iteration: two edge-sized hash joins (scores onto edges),
    two node-keyed groupby sums, and two scalar max reduces (the only
    driver-side values).  Returns (node, hub_micros, auth_micros).

    Multi-edges are kept (link-weighted), matching the link-weighted
    host PageRank convention above."""
    from ray.data.aggregate import Count, Max, Sum

    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    jp = _join_parts(join_partitions)

    def distinct_nodes(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch[src_column], dtype=np.int64)
        d = np.asarray(batch[dst_column], dtype=np.int64)
        return pa.table({"node": pa.array(np.unique(np.concatenate([s, d])))})

    nodes = (
        edges.map_batches(distinct_nodes, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["node"])
        .materialize()
    )
    e2 = edges.select_columns([src_column, dst_column]).materialize()

    def init_scores(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"],
                "s": pa.array(np.full(batch.num_rows, _M, dtype=np.int64)),
            }
        )

    def _rescale(scored: ray.data.Dataset) -> ray.data.Dataset:
        peak = int(scored.max("s"))

        def scale(batch: pa.Table) -> pa.Table:
            s = np.asarray(batch["s"], dtype=np.int64)
            if peak > (2**63 - 1) // _M:
                # a hyper-hub host (indegree > ~9e6) would overflow the
                # int64 multiply — fall back to exact Python bigints for
                # this (rare, node-sized) pass instead of wrapping
                out = np.fromiter(
                    (int(x) * _M // peak for x in s), dtype=np.int64, count=len(s)
                )
            else:
                out = (s * _M) // peak
            return pa.table({"node": batch["node"], "s": pa.array(out)})

        return scored.map_batches(scale, batch_format="pyarrow").materialize()

    hubs = nodes.map_batches(init_scores, batch_format="pyarrow").materialize()
    auth = None
    for _ in range(n_iter):
        auth = _rescale(
            e2.join(hubs, "inner", jp, on=(src_column,), right_on=("node",))
            .groupby(dst_column)
            .aggregate(Sum("s", alias_name="s"))
            .map_batches(
                lambda b: pa.table({"node": b[dst_column], "s": b["s"]}),
                batch_format="pyarrow",
            )
        )
        hubs = _rescale(
            e2.join(auth, "inner", jp, on=(dst_column,), right_on=("node",))
            .groupby(src_column)
            .aggregate(Sum("s", alias_name="s"))
            .map_batches(
                lambda b: pa.table({"node": b[src_column], "s": b["s"]}),
                batch_format="pyarrow",
            )
        )

    joined = nodes.join(
        hubs.select_columns(["node", "s"]), "left_outer", jp, on=("node",), right_on=("node",)
    )
    joined = joined.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "hub_micros": pc.fill_null(b["s"], 0).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    out = joined.join(
        auth.select_columns(["node", "s"]), "left_outer", jp, on=("node",), right_on=("node",)
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "hub_micros": b["hub_micros"],
                "auth_micros": pc.fill_null(b["s"], 0).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _nonempty_blocks(ds: ray.data.Dataset) -> ray.data.Dataset | None:
    """Workaround for a Ray Data 2.49 wart: the hash-shuffle join operator
    emits ZERO-COLUMN empty blocks for empty output partitions, and empty
    blocks pass through later map stages without the UDF running — so a
    downstream join/shuffle sees a schema-less block and Acero fails with
    "No match ... for key field reference" at finalize.  Rebuild the
    (already materialized) dataset from its non-empty block refs — a
    metadata-only operation, the blocks never leave the object store.
    Returns None when every block is empty (the caller's loop exit)."""
    refs = []
    for rb in ds.iter_internal_ref_bundles():
        for br, meta in zip(rb.block_refs, rb.metadata):
            if meta.num_rows:
                refs.append(br)
    if not refs:
        return None
    return ray.data.from_arrow_refs(refs)


def bfs_khop(
    edges: ray.data.Dataset,
    seeds: list[int],
    max_hops: int,
    src_column: str = "src",
    dst_column: str = "dst",
    join_partitions: int = 8,
) -> ray.data.Dataset:
    """(node, dist) for every node reachable from ``seeds`` within
    ``max_hops`` directed hops, ``dist`` = MINIMUM hop count — the
    crawl-frontier primitive (which hosts does a crawler starting from
    these seeds touch in k waves?).

    Distributed shape per hop: the frontier (nodes discovered last hop)
    inner-joins onto the edge list by src — frontier-adjacent-edge-sized,
    never corpus-sized — then candidate dsts dedup through ONE node-keyed
    groupby and anti-join against the visited set, so each node crosses
    the exchange at most once per hop and the visited set grows
    monotonically.  Cycles terminate naturally (a revisited node is
    anti-joined away); the loop exits early when a wave finds nothing
    new.  The driver holds only per-hop counts; frontier/visited live in
    the object store as Datasets.

    Seeds are a driver-side list (crawl seed sets are small by nature);
    seeds absent from the graph still report dist 0, like a real
    frontier.  Multi-edges are harmless (deduped by the candidate
    groupby)."""
    from ray.data.aggregate import Count

    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    jp = _join_parts(join_partitions)
    seed_nodes = np.unique(np.asarray(sorted(set(int(s) for s in seeds)), dtype=np.int64))
    if len(seed_nodes) == 0:
        raise ValueError("seeds must be non-empty")
    visited = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(seed_nodes),
                "dist": pa.array(np.zeros(len(seed_nodes), dtype=np.int64)),
            }
        )
    ).materialize()
    frontier = visited

    def dst_nodes(batch: pa.Table) -> pa.Table:
        d = np.unique(np.asarray(batch[dst_column], dtype=np.int64))
        return pa.table({"node": pa.array(d)})

    for hop in range(1, max_hops + 1):
        adjacent = frontier.select_columns(["node"]).join(
            edges, "inner", jp, on=("node",), right_on=(src_column,)
        )
        candidates = _nonempty_blocks(
            adjacent.map_batches(dst_nodes, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Count(alias_name="_n"))
            .select_columns(["node"])
            .materialize()
        )
        if candidates is None:
            break
        fresh = _nonempty_blocks(
            candidates.join(
                visited, "left_anti", jp, on=("node",), right_on=("node",)
            ).materialize()
        )
        if fresh is None:
            break

        def tag(batch: pa.Table, _h: int = hop) -> pa.Table:
            return pa.table(
                {
                    "node": batch["node"],
                    "dist": pa.array(np.full(batch.num_rows, _h, dtype=np.int64)),
                }
            )

        frontier = fresh.map_batches(tag, batch_format="pyarrow").materialize()
        visited = visited.union(frontier).materialize()

    return visited
