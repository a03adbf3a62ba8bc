"""CORI resource selection (engine/resource_select.py): statistics-only
broker ranking over real shard indexes — df-mass ordering, default
belief for absent terms, deterministic tie-break, top-n selection."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.config import BuildConfig, IndexOptions
from search_engine_ray.engine.build import build_index
from search_engine_ray.engine.index_reader import IndexReader
from search_engine_ray.engine.resource_select import (
    DEFAULT_B,
    cori_shard_scores,
    select_shards,
)

BASE = "/tmp/se_ray_cori"

# shard 0: alpha in all 3 docs; shard 1: no alpha; shard 2: alpha in 1 doc
CORPORA = [
    ["alpha beta alpha", "alpha gamma delta", "alpha alpha beta"],
    ["beta delta epsilon", "gamma delta", "epsilon beta gamma"],
    ["alpha beta", "zeta eta theta", "iota kappa"],
]


@pytest.fixture(scope="module")
def shard_readers(ray_session):
    shutil.rmtree(BASE, ignore_errors=True)
    cfg = BuildConfig(
        options=IndexOptions(case_folding=True, remove_stopwords=True, stemming=False)
    )
    readers = []
    for i, docs in enumerate(CORPORA):
        cdir = f"{BASE}/corpus_{i}"
        os.makedirs(cdir)
        pq.write_table(
            pa.table(
                {"doc_id": [f"s{i}d{j}" for j in range(len(docs))], "text": docs}
            ),
            f"{cdir}/docs.parquet",
        )
        idir = f"{BASE}/index_{i}"
        build_index(
            cdir, idir, cfg, overwrite=True, source_column="text", name_column="doc_id"
        )
        readers.append(IndexReader(idir))
    return readers


def test_df_mass_orders_shards(shard_readers):
    scores = cori_shard_scores(shard_readers, ["alpha"])
    assert scores.shape == (3,)
    # alpha-everywhere > alpha-once > alpha-never
    assert scores[0] > scores[2] > scores[1]
    # df=0 shard gets exactly the default belief
    assert scores[1] == pytest.approx(DEFAULT_B)
    # beliefs live in (0, 1)
    assert np.all((scores > 0.0) & (scores < 1.0))


def test_absent_term_is_rank_neutral(shard_readers):
    base = cori_shard_scores(shard_readers, ["alpha"])
    mixed = cori_shard_scores(shard_readers, ["alpha", "zzznowhere"])
    # absent-everywhere term contributes the constant default belief:
    # mean((p_alpha, b)) per shard
    np.testing.assert_allclose(mixed, (base + DEFAULT_B) / 2.0, rtol=0, atol=1e-15)
    only_absent = cori_shard_scores(shard_readers, ["zzznowhere"])
    np.testing.assert_allclose(only_absent, DEFAULT_B)


def test_select_shards_top_and_ties(shard_readers):
    ids, scores = select_shards(shard_readers, ["alpha"], top=2)
    assert ids.tolist() == [0, 2]
    assert scores[0] > scores[1]
    # all-tied query (absent term): ascending shard id order (K1 rule)
    ids, _ = select_shards(shard_readers, ["zzznowhere"], top=3)
    assert ids.tolist() == [0, 1, 2]
    # top=0 selects nothing
    ids, scores = select_shards(shard_readers, ["alpha"], top=0)
    assert len(ids) == 0 and len(scores) == 0


def test_multi_term_mean(shard_readers):
    a = cori_shard_scores(shard_readers, ["alpha"])
    bt = cori_shard_scores(shard_readers, ["beta"])
    both = cori_shard_scores(shard_readers, ["alpha", "beta"])
    np.testing.assert_allclose(both, (a + bt) / 2.0, rtol=0, atol=1e-15)


def test_validation(shard_readers):
    with pytest.raises(ValueError):
        cori_shard_scores([], ["alpha"])
    with pytest.raises(ValueError):
        cori_shard_scores(shard_readers, [])


def test_selective_search_subset_stats(ray_session, tmp_path):
    """Selective search == federated BM25 over exactly the selected
    readers (stats from the subset, not the full corpus), and full-shard
    selection degrades to the whole-corpus ranking."""
    import os as _os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from search_engine_ray.config import BuildConfig, IndexOptions
    from search_engine_ray.engine.build import build_index
    from search_engine_ray.engine.index_reader import IndexReader
    from search_engine_ray.engine.resource_select import select_shards
    from search_engine_ray.pipelines import bm25_scores_f64, federated_bm25_f64

    rng = np.random.default_rng(31)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 12)).tolist())
        for _ in range(40)
    ]
    opts = IndexOptions(stemming=False)
    shards = []
    for s in range(4):
        corpus = str(tmp_path / f"c{s}")
        _os.makedirs(corpus)
        rows = [(i, texts[i]) for i in range(40) if i % 4 == s]
        pq_.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows]),
                }
            ),
            f"{corpus}/d.parquet",
        )
        idx = str(tmp_path / f"i{s}")
        build_index(
            corpus, idx,
            BuildConfig(block_entries=8, frags_per_shard=1, options=opts),
            overwrite=True, source_column="text", name_column="doc_id",
        )
        shards.append(IndexReader(idx))

    kws = [("alpha", 1), ("beta", 1)]
    sel_ids, sel_scores = select_shards(shards, [t for t, _ in kws], top=2)
    assert len(sel_ids) == 2
    assert sel_scores[0] >= sel_scores[1]

    sub = [shards[int(s)] for s in sorted(sel_ids.tolist())]
    gids, scores, names = federated_bm25_f64(sub, kws)
    # every hit's doc lives in a selected shard
    sel_set = {int(s) for s in sel_ids.tolist()}
    assert all(int(names[g]) % 4 in sel_set for g in gids)
    # stats come from the SUBSET: n differs from full-corpus n, so the
    # same doc scores differently than under all-shard federation
    all_ids, all_scores, all_names = federated_bm25_f64(shards, kws)
    by_doc_sub = {int(names[g]): s for g, s in zip(gids, scores)}
    by_doc_all = {int(all_names[g]): s for g, s in zip(all_ids, all_scores)}
    common = set(by_doc_sub) & set(by_doc_all)
    assert common and any(
        abs(by_doc_sub[d] - by_doc_all[d]) > 1e-12 for d in common
    )
    # top=4 (all shards) reproduces the whole-corpus ranking bit-exactly
    ids4, _ = select_shards(shards, [t for t, _ in kws], top=4)
    g4, s4, n4 = federated_bm25_f64([shards[int(s)] for s in sorted(ids4.tolist())], kws)
    # compare against a single merged index over all docs
    corpus_all = str(tmp_path / "call")
    _os.makedirs(corpus_all)
    pq_.write_table(
        pa.table({"doc_id": pa.array(range(40), pa.int64()), "text": pa.array(texts)}),
        f"{corpus_all}/d.parquet",
    )
    idx_all = str(tmp_path / "iall")
    build_index(
        corpus_all, idx_all,
        BuildConfig(block_entries=8, frags_per_shard=1, options=opts),
        overwrite=True, source_column="text", name_column="doc_id",
    )
    rall = IndexReader(idx_all)
    mids, mscores = bm25_scores_f64(rall, kws)
    fed = sorted((int(n4[g]), float(s)) for g, s in zip(g4, s4))
    mono = sorted((int(rall.doc_names[d]), float(s)) for d, s in zip(mids, mscores))
    assert fed == mono
