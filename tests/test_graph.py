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
