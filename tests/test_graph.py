"""Exact-integer PageRank (dataops/graph.py) vs a numpy reference."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.dataops.graph import pagerank

# a small directed graph with a hub (0), a sink (4) and a 2-cycle (2, 3)
EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (3, 2), (3, 4), (1, 4)]
N_NODES = 5


def _brute(n_iter: int, damping_pct: int = 85) -> dict[int, int]:
    m = 1_000_000
    base = ((100 - damping_pct) * m) // (100 * N_NODES)
    r = {v: m // N_NODES for v in range(N_NODES)}
    out = {}
    for s, _ in EDGES:
        out[s] = out.get(s, 0) + 1
    for _ in range(n_iter):
        nxt = {v: base for v in range(N_NODES)}
        for s, d in EDGES:
            nxt[d] += (damping_pct * r[s]) // (100 * out[s])
        r = nxt
    return r


@pytest.fixture(scope="module")
def edges_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in EDGES], pa.int64()),
                "dst": pa.array([e[1] for e in EDGES], pa.int64()),
            }
        )
    )


@pytest.mark.parametrize("n_iter", [1, 3, 6])
def test_pagerank_matches_brute(edges_ds, ray_session, n_iter):
    got = (
        pagerank(edges_ds, n_nodes=N_NODES, n_iter=n_iter)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    exp = _brute(n_iter)
    # node 4 is dangling: it receives mass but never appears as src —
    # it must still be present with base + inbound
    assert got["node"].tolist() == list(range(N_NODES))
    assert got["rank_micros"].tolist() == [exp[v] for v in range(N_NODES)]
    # the hub's targets outrank isolated-ish nodes after a few rounds
    if n_iter >= 3:
        r = dict(zip(got["node"], got["rank_micros"]))
        assert r[2] > r[0]  # the cycle accumulates; the hub only donates


def test_pagerank_partition_invariant(edges_ds, ray_session):
    base = (
        pagerank(edges_ds, n_nodes=N_NODES, n_iter=3)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    got = (
        pagerank(edges_ds.repartition(5), n_nodes=N_NODES, n_iter=3)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    assert got.equals(base)


def test_pagerank_validates(edges_ds):
    with pytest.raises(ValueError):
        pagerank(edges_ds, n_nodes=0)
    with pytest.raises(ValueError):
        pagerank(edges_ds, n_nodes=5, damping_pct=101)


# --- bfs_khop: k-hop crawl frontier ---


def _brute_bfs(edges, seeds, k):
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, k + 1):
        nxt = {d for s, d in edges if s in frontier and d not in dist}
        for v in nxt:
            dist[v] = h
        frontier = nxt
        if not frontier:
            break
    return dist


@pytest.mark.parametrize("seeds,k", [([0], 1), ([0], 2), ([0], 10), ([1, 4], 3)])
def test_bfs_khop_matches_brute(edges_ds, ray_session, seeds, k):
    from search_engine_ray.dataops.graph import bfs_khop

    got = (
        bfs_khop(edges_ds, seeds, k)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    exp = _brute_bfs(EDGES, seeds, k)
    assert dict(zip(got["node"], got["dist"])) == exp


def test_bfs_khop_cycle_terminates_and_isolated_seed(ray_session):
    import ray.data

    from search_engine_ray.dataops.graph import bfs_khop

    ring = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 1, 2], pa.int64()),
                "dst": pa.array([1, 2, 0], pa.int64()),
            }
        )
    )
    got = bfs_khop(ring, [0], 99).to_pandas().sort_values("node", ignore_index=True)
    assert got["node"].tolist() == [0, 1, 2]
    assert got["dist"].tolist() == [0, 1, 2]
    # a seed absent from the graph still reports dist 0 (crawl semantics)
    lone = bfs_khop(ring, [7], 2).to_pandas()
    assert (7, 0) in set(zip(lone["node"], lone["dist"]))


def test_bfs_khop_zero_hops_and_partition_invariance(edges_ds, ray_session):
    from search_engine_ray.dataops.graph import bfs_khop

    z = bfs_khop(edges_ds, [0, 3], 0).to_pandas().sort_values("node", ignore_index=True)
    assert z["node"].tolist() == [0, 3] and z["dist"].tolist() == [0, 0]
    base = bfs_khop(edges_ds, [0], 3).to_pandas().sort_values("node", ignore_index=True)
    rep = (
        bfs_khop(edges_ds.repartition(5), [0], 3)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    assert rep.equals(base)
    with pytest.raises(ValueError):
        bfs_khop(edges_ds, [], 2)
    with pytest.raises(ValueError):
        bfs_khop(edges_ds, [0], -1)


# --- hits: integer-exact hubs & authorities ---


def _brute_hits(edges, n_iter):
    m = 1_000_000
    nodes = sorted({x for e in edges for x in e})
    h = {v: m for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(n_iter):
        ar = {}
        for s, d in edges:
            ar[d] = ar.get(d, 0) + h.get(s, 0)
        mx = max(ar.values())
        a = {v: (ar[v] * m) // mx for v in ar}
        hr = {}
        for s, d in edges:
            hr[s] = hr.get(s, 0) + a.get(d, 0)
        mx = max(hr.values())
        h = {v: (hr[v] * m) // mx for v in hr}
    return {v: (h.get(v, 0), a.get(v, 0)) for v in nodes}


@pytest.mark.parametrize("n_iter", [1, 2, 4])
def test_hits_matches_brute(edges_ds, ray_session, n_iter):
    from search_engine_ray.dataops.graph import hits

    got = (
        hits(edges_ds, n_iter=n_iter)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    exp = _brute_hits(EDGES, n_iter)
    assert {
        int(r.node): (int(r.hub_micros), int(r.auth_micros))
        for r in got.itertuples()
    } == exp
    # the pure-source hub (0) has authority 0; the sink (4) has hub 0
    by = dict(zip(got["node"], zip(got["hub_micros"], got["auth_micros"])))
    assert by[0][1] == 0 and by[4][0] == 0


def test_hits_partition_invariant_and_validates(edges_ds, ray_session):
    from search_engine_ray.dataops.graph import hits

    base = hits(edges_ds, n_iter=2).to_pandas().sort_values("node", ignore_index=True)
    rep = (
        hits(edges_ds.repartition(5), n_iter=2)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    assert rep.equals(base)
    with pytest.raises(ValueError):
        hits(edges_ds, n_iter=0)


def test_broadcast_and_join_paths_identical(edges_ds, ray_session):
    """The broadcast fast path and the join path must produce identical
    integer results — same floored arithmetic, different dataflow."""
    from search_engine_ray.dataops.graph import bfs_khop, hits, pagerank

    pr_b = pagerank(edges_ds, n_nodes=N_NODES, n_iter=3).to_pandas()
    pr_j = pagerank(
        edges_ds, n_nodes=N_NODES, n_iter=3, broadcast_nodes_max=0
    ).to_pandas()
    assert pr_b.sort_values("node", ignore_index=True).equals(
        pr_j.sort_values("node", ignore_index=True)
    )

    h_b = hits(edges_ds, n_iter=2).to_pandas()
    h_j = hits(edges_ds, n_iter=2, broadcast_nodes_max=0).to_pandas()
    assert h_b.sort_values("node", ignore_index=True).equals(
        h_j.sort_values("node", ignore_index=True)
    )

    b_b = bfs_khop(edges_ds, [0], 3).to_pandas()
    b_j = bfs_khop(edges_ds, [0], 3, broadcast_nodes_max=0).to_pandas()
    assert b_b.sort_values("node", ignore_index=True).equals(
        b_j.sort_values("node", ignore_index=True)
    )


def test_graph_ops_empty_edges(ray_session):
    """Empty edge sets return empty typed results instead of crashing on
    the zero-column to_pandas wart (review finding)."""
    import ray.data

    from search_engine_ray.dataops.graph import hits, pagerank

    empty = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    pr = pagerank(empty, n_nodes=10, n_iter=2).to_pandas()
    assert len(pr) == 0
    h = hits(empty, n_iter=1).to_pandas()
    assert len(h) == 0
