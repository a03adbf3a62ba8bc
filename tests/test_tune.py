"""BM25 (k1, b) grid-sweep tuning (engine/tune.py) vs an independent
per-config recompute; the DuckDB oracle conformance of the same sweep
runs in test_entry_contract via the bm25_grid_sweep gate."""

import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from search_engine_ray.config import BuildConfig
from search_engine_ray.corpus.pages import write_pages_parquet
from search_engine_ray.engine.boolean import boolean_and
from search_engine_ray.engine.build import build_index
from search_engine_ray.engine.index_reader import IndexReader
from search_engine_ray.engine.tune import best_config, sweep_bm25_grid

BASE = "/tmp/se_ray_test_tune"
GRID = [(900, 300), (1200, 750), (2000, 900)]
K, HITS_K = 10, 5


@pytest.fixture(scope="module")
def built(ray_session):
    corpus = f"{BASE}/corpus"
    index = f"{BASE}/index"
    shutil.rmtree(BASE, ignore_errors=True)
    write_pages_parquet(corpus, 150, seed=11, n_files=2, row_group_size=64)
    build_index(corpus, index, BuildConfig(), overwrite=True)
    r = IndexReader(index)
    terms = pq.read_table(f"{index}/terms.parquet")
    head = (
        terms.to_pandas()
        .sort_values(["df", "term"], ascending=[False, True])["term"]
        .tolist()
    )
    topics = [
        (1, [head[0]]),
        (2, [head[0], head[3]]),
        (3, [head[1], head[2], head[5]]),
        (4, [head[7], head[9]]),
    ]
    return index, topics


def _single_config_eval(index, topics, k1_milli, b_milli):
    """Independent recompute: plain per-topic scoring loop + metrics."""
    r = IndexReader(index)
    n, avgdl = r.n_docs, r.avgdl
    k1, b = k1_milli / 1000.0, b_milli / 1000.0
    out = dict.fromkeys(
        ("sum_rr_micros", "sum_prec_micros", "sum_hits_at_k",
         "sum_n_rel_ret", "sum_n_rel"), 0)
    for _tid, terms in topics:
        scores = np.zeros(n)
        touched = np.zeros(n, bool)
        for t in terms:
            tp = r.postings(t)
            if tp is None:
                continue
            ids, tfs, dls = tp.arrays()
            idf = np.log((n - tp.df + 0.5) / (tp.df + 0.5))
            scores[ids] += idf * (tfs * (k1 + 1)) / (
                tfs + k1 * (1 - b + b * (dls / avgdl)))
            touched[ids] = True
        cand = np.flatnonzero(touched)
        top = cand[np.lexsort((cand, -scores[cand]))][:K]
        rel_set = set(boolean_and(r, list(terms)).tolist())
        out["sum_n_rel"] += len(rel_set)
        hit_ranks = [i + 1 for i, d in enumerate(top) if int(d) in rel_set]
        out["sum_n_rel_ret"] += len(hit_ranks)
        out["sum_hits_at_k"] += sum(1 for rk in hit_ranks if rk <= HITS_K)
        if hit_ranks:
            out["sum_rr_micros"] += 1_000_000 // hit_ranks[0]
            out["sum_prec_micros"] += sum(
                ((i + 1) * 1_000_000) // rk for i, rk in enumerate(hit_ranks))
    return out


def test_sweep_matches_per_config_recompute(built):
    index, topics = built
    sweep = sweep_bm25_grid(index, topics, GRID, k=K, hits_k=HITS_K).to_pandas()
    assert len(sweep) == len(GRID)
    for _, row in sweep.iterrows():
        exp = _single_config_eval(index, topics, row["k1_milli"], row["b_milli"])
        for m, v in exp.items():
            assert row[m] == v, (row["k1_milli"], row["b_milli"], m)
        assert row["n_topics"] == len(topics)


def test_configs_actually_differ(built):
    index, topics = built
    sweep = sweep_bm25_grid(index, topics, GRID, k=K, hits_k=HITS_K).to_pandas()
    assert sweep["sum_prec_micros"].nunique() > 1  # the sweep measures something


def test_topic_order_invariance(built):
    index, topics = built
    a = sweep_bm25_grid(index, topics, GRID, k=K).to_pandas()
    b = sweep_bm25_grid(index, list(reversed(topics)), GRID, k=K).to_pandas()
    assert a.equals(b)


def test_best_config_total_order(built):
    index, topics = built
    sweep = sweep_bm25_grid(index, topics, GRID, k=K)
    k1, b = best_config(sweep)
    t = sweep.to_pandas()
    top = t.sort_values(
        ["sum_prec_micros", "sum_rr_micros", "k1_milli", "b_milli"],
        ascending=[False, False, True, True]).iloc[0]
    assert (k1, b) == (int(top["k1_milli"]), int(top["b_milli"]))
