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
