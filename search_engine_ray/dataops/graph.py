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

from ..ioutil import nonempty_blocks as _nonempty_blocks
from .dedup import _join_parts

_M = 1_000_000


# node tables at or under this row count ride the broadcast fast path
# (ray.put the node-aligned vectors once per iteration; edges stream
# through ONE partial-aggregated groupby instead of hash joins).  Above
# it — the 10^8-host web graph — the join path keeps all state in the
# object store as Datasets.
BROADCAST_NODES_MAX = 2_000_000


def pagerank(
    edges: ray.data.Dataset,
    n_nodes: int,
    n_iter: int = 3,
    damping_pct: int = 85,
    src_column: str = "src",
    dst_column: str = "dst",
    join_partitions: int = 8,
    broadcast_nodes_max: int = BROADCAST_NODES_MAX,
) -> ray.data.Dataset:
    """(node, rank_micros) after ``n_iter`` exact-integer power
    iterations over a directed edge list.  ``n_nodes`` is the node-space
    size (ranks initialise to ``10^6 // n_nodes`` micros; nodes that
    never appear as a dst hold the base mass).  Returns a streaming
    node-sized Dataset.

    Two execution paths with IDENTICAL integer results (tested equal):
    when ``n_nodes <= broadcast_nodes_max`` the node-aligned rank/outdeg
    vectors are broadcast (``ray.put`` once per iteration, read
    zero-copy in every map task) and each iteration is ONE streaming
    pass over the edges with per-batch partial aggregation into a small
    groupby — no hash joins, no per-join actor-pool startup.  Larger
    graphs use edge-sized hash joins so no node-scale state ever lands
    on the driver."""
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

    if n_nodes <= broadcast_nodes_max:
        return _pagerank_broadcast(
            edges, n_iter, damping_pct, base, r0, src_column, dst_column,
            distinct_nodes,
        )

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


def _collect_node_sums(
    edges: ray.data.Dataset,
    key_column: str,
    weight_of,  # (batch) -> np.int64 per-edge weights, or None to count
) -> tuple[np.ndarray, np.ndarray]:
    """(sorted nodes, summed weights) of a per-edge integer weight grouped
    by ``key_column`` — ONE streaming pass with per-batch partial
    aggregation (np.unique + bincount) feeding ONE small native groupby.
    The return is node-sized; callers guard with the broadcast cap."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key_column], dtype=np.int64)
        if len(k) == 0:
            return pa.table(
                {"node": pa.array([], pa.int64()), "w": pa.array([], pa.int64())}
            )
        w = weight_of(batch) if weight_of is not None else np.ones(len(k), np.int64)
        uniq, inv = np.unique(k, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, w)
        return pa.table({"node": pa.array(uniq), "w": pa.array(sums)})

    out = (
        edges.map_batches(partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("w", alias_name="w"))
        .to_pandas()
    )
    if "node" not in out.columns:  # empty input: zero-column to_pandas wart
        return np.empty(0, np.int64), np.empty(0, np.int64)
    nodes = out["node"].to_numpy(np.int64)
    order = np.argsort(nodes, kind="stable")
    return nodes[order], out["w"].to_numpy(np.int64)[order]


def _pagerank_broadcast(
    edges: ray.data.Dataset,
    n_iter: int,
    damping_pct: int,
    base: int,
    r0: int,
    src_column: str,
    dst_column: str,
    distinct_nodes,
) -> ray.data.Dataset:
    """Broadcast-path PageRank: node-aligned vectors live on the driver
    (size-capped by the caller), each iteration is one edge pass.  The
    per-edge contribution ``(d*r) // (100*outdeg)`` depends only on src,
    so it folds to a per-NODE constant broadcast as one array."""
    from ray.data.aggregate import Count

    nodes_df = (
        edges.map_batches(distinct_nodes, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_n"))
        .to_pandas()
    )
    if "node" not in nodes_df.columns:  # empty edge set
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()),
                 "rank_micros": pa.array([], pa.int64())}
            )
        )
    nodes = np.sort(nodes_df["node"].to_numpy(np.int64))
    odeg_nodes, odeg = _collect_node_sums(edges, src_column, None)
    outdeg = np.zeros(len(nodes), dtype=np.int64)
    outdeg[np.searchsorted(nodes, odeg_nodes)] = odeg

    ranks = np.full(len(nodes), r0, dtype=np.int64)
    for _ in range(n_iter):
        contrib = np.zeros(len(nodes), dtype=np.int64)
        live = outdeg > 0
        contrib[live] = (damping_pct * ranks[live]) // (100 * outdeg[live])
        ref = ray.put((nodes, contrib))

        def edge_weight(batch: pa.Table, _ref=ref) -> np.ndarray:
            nds, c = ray.get(_ref)
            s = np.asarray(batch[src_column], dtype=np.int64)
            return c[np.searchsorted(nds, s)]

        in_nodes, in_sums = _collect_node_sums(edges, dst_column, edge_weight)
        ranks = np.full(len(nodes), base, dtype=np.int64)
        ranks[np.searchsorted(nodes, in_nodes)] += in_sums

    return ray.data.from_arrow(
        pa.table({"node": pa.array(nodes), "rank_micros": pa.array(ranks)})
    )


def hits(
    edges: ray.data.Dataset,
    n_iter: int = 2,
    src_column: str = "src",
    dst_column: str = "dst",
    join_partitions: int = 8,
    broadcast_nodes_max: int = BROADCAST_NODES_MAX,
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
    if nodes.count() <= broadcast_nodes_max:
        return _hits_broadcast(edges, nodes, n_iter, src_column, dst_column)
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


def _bfs_broadcast(
    edges: ray.data.Dataset,
    seed_nodes: np.ndarray,
    max_hops: int,
    src_column: str,
    dst_column: str,
) -> ray.data.Dataset:
    """Broadcast-path BFS: the frontier/visited sets live on the driver
    as sorted arrays (size-capped by the caller); each wave is one edge
    pass filtering src against the broadcast frontier, with per-batch
    unique + ONE small groupby dedup of the candidate wave — no joins."""
    from ray.data.aggregate import Count

    visited = seed_nodes.copy()
    dists = np.zeros(len(seed_nodes), dtype=np.int64)
    frontier = seed_nodes.copy()
    for hop in range(1, max_hops + 1):
        ref = ray.put(frontier)

        def wave(batch: pa.Table, _ref=ref) -> pa.Table:
            f = ray.get(_ref)
            s = np.asarray(batch[src_column], dtype=np.int64)
            d = np.asarray(batch[dst_column], dtype=np.int64)
            pos = np.searchsorted(f, s)
            pos[pos >= len(f)] = 0
            hit = f[pos] == s if len(f) else np.zeros(len(s), bool)
            return pa.table({"node": pa.array(np.unique(d[hit]))})

        cand_df = (
            edges.map_batches(wave, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Count(alias_name="_n"))
            .to_pandas()
        )
        # an all-empty wave can come back as a zero-column frame
        if "node" not in cand_df.columns:
            break
        cand = cand_df["node"].to_numpy(np.int64)
        fresh = np.setdiff1d(cand, visited, assume_unique=False)
        if len(fresh) == 0:
            break
        visited = np.concatenate([visited, fresh])
        dists = np.concatenate([dists, np.full(len(fresh), hop, dtype=np.int64)])
        frontier = np.sort(fresh)
        order = np.argsort(visited, kind="stable")
        visited, dists = visited[order], dists[order]

    return ray.data.from_arrow(
        pa.table({"node": pa.array(visited), "dist": pa.array(dists)})
    )


def _hits_broadcast(
    edges: ray.data.Dataset,
    nodes_ds: ray.data.Dataset,
    n_iter: int,
    src_column: str,
    dst_column: str,
) -> ray.data.Dataset:
    """Broadcast-path HITS: hub/auth vectors node-aligned on the driver
    (size-capped by the caller); each half-iteration is one edge pass
    with per-batch partial aggregation — same integer results as the
    join path (tested equal)."""
    ndf = nodes_ds.to_pandas()
    if "node" not in ndf.columns:  # empty edge set
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()),
                 "hub_micros": pa.array([], pa.int64()),
                 "auth_micros": pa.array([], pa.int64())}
            )
        )
    nodes = np.sort(ndf["node"].to_numpy(np.int64))

    def _score_pass(key_col: str, lookup_col: str, vec: np.ndarray) -> np.ndarray:
        ref = ray.put((nodes, vec))

        def weight(batch: pa.Table, _ref=ref) -> np.ndarray:
            nds, v = ray.get(_ref)
            k = np.asarray(batch[lookup_col], dtype=np.int64)
            return v[np.searchsorted(nds, k)]

        out_nodes, sums = _collect_node_sums(edges, key_col, weight)
        raw = np.zeros(len(nodes), dtype=np.int64)
        raw[np.searchsorted(nodes, out_nodes)] = sums
        peak = int(raw.max()) if len(raw) else 0
        if peak <= 0:
            return np.zeros(len(nodes), dtype=np.int64)
        if peak > (2**63 - 1) // _M:
            return np.fromiter(
                (int(x) * _M // peak for x in raw), dtype=np.int64, count=len(raw)
            )
        return (raw * _M) // peak

    hub = np.full(len(nodes), _M, dtype=np.int64)
    auth = np.zeros(len(nodes), dtype=np.int64)
    for _ in range(n_iter):
        auth = _score_pass(dst_column, src_column, hub)
        hub = _score_pass(src_column, dst_column, auth)

    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes),
                "hub_micros": pa.array(hub),
                "auth_micros": pa.array(auth),
            }
        )
    )


def bfs_khop(
    edges: ray.data.Dataset,
    seeds: list[int],
    max_hops: int,
    src_column: str = "src",
    dst_column: str = "dst",
    join_partitions: int = 8,
    broadcast_nodes_max: int = BROADCAST_NODES_MAX,
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
    from ray.data.aggregate import Count as _Count

    n_nodes = (
        edges.map_batches(
            lambda b: pa.table(
                {
                    "node": pa.array(
                        np.unique(
                            np.concatenate(
                                [
                                    np.asarray(b[src_column], dtype=np.int64),
                                    np.asarray(b[dst_column], dtype=np.int64),
                                ]
                            )
                        )
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .aggregate(_Count(alias_name="_n"))
        .count()
    )
    if n_nodes <= broadcast_nodes_max:
        return _bfs_broadcast(
            edges, seed_nodes, max_hops, src_column, dst_column
        )
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
