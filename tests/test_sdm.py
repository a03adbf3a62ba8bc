"""Sequential Dependence Model (Metzler & Croft 2005): brute-force
reference equality, feature-skip rule, and guards."""

import math
import shutil

import numpy as np
import pytest

from search_engine_ray.config import BuildConfig, IndexOptions
from search_engine_ray.corpus.pages import write_pages_parquet
from search_engine_ray.engine.build import build_index
from search_engine_ray.engine.index_reader import IndexReader
from search_engine_ray.engine.positions import build_position_index
from search_engine_ray.pipelines import sdm_scores_f64

BASE = "/tmp/se_ray_sdm"
OPTS = IndexOptions(stemming=False)


@pytest.fixture(scope="module")
def built(ray_session):
    # the documents-corpus pattern (integer doc_id names shared by the
    # index and the sidecar) — the shape phrase_bm25/sdm are defined over
    import os

    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from search_engine_ray.corpus.extract import extract_text_batch

    shutil.rmtree(BASE, ignore_errors=True)
    pages = f"{BASE}/pages"
    write_pages_parquet(pages, 90, seed=77, n_files=2, row_group_size=48)
    html = pads.dataset(pages).to_table(columns=["html"])["html"].combine_chunks()
    texts = extract_text_batch(html)
    corpus = f"{BASE}/corpus"
    os.makedirs(corpus)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": texts,
            }
        ),
        os.path.join(corpus, "documents.parquet"),
    )
    index_dir = f"{BASE}/index"
    build_index(
        corpus, index_dir, BuildConfig(options=OPTS, block_entries=16),
        source_column="text", name_column="doc_id", overwrite=True,
    )
    pos_dir = f"{BASE}/pos"
    build_position_index(
        corpus, pos_dir, OPTS, source_column="text", name_column="doc_id"
    )
    return index_dir, pos_dir


def _brute_sdm(reader, pos_dir, terms, mu, lambdas, uw):
    """Per-doc recompute from the same primitive reads, feature by
    feature — an independent accumulation order."""
    from search_engine_ray.engine.positions import (
        ordered_window_search,
        proximity_search,
    )

    n = reader.n_docs
    c_total = float(reader.stats["sum_dl"])
    dl = reader.doc_lens.astype(np.float64)
    feats = []  # (lambda, dense counts, cf)
    cand = set()
    for t in terms:
        tp = reader.postings(t)
        dense = np.zeros(n)
        if tp is not None:
            ids, tfs, _ = tp.arrays()
            dense[ids] = tfs
            cand.update(ids.tolist())
        feats.append((lambdas[0], dense, float(dense.sum())))
    for a, b in zip(terms, terms[1:]):
        for lam, tbl in (
            (lambdas[1], ordered_window_search(pos_dir, a, b, slop=1, options=OPTS)),
            (lambdas[2], proximity_search(pos_dir, a, b, window=uw, options=OPTS)),
        ):
            dense = np.zeros(n)
            for d, c in zip(tbl["doc_id"].to_pylist(), tbl["n_pairs"].to_pylist()):
                dense[reader.doc_id_of(str(d))] = c
            feats.append((lam, dense, float(dense.sum())))
    out = {}
    for d in sorted(cand):
        s = 0.0
        for lam, dense, cf in feats:
            if cf == 0.0:
                continue  # feature skipped corpus-wide
            s += lam * math.log((dense[d] + mu * cf / c_total) / (dl[d] + mu))
        out[d] = s
    return out


def test_sdm_matches_brute_force(built, ray_session):
    index_dir, pos_dir = built
    r = IndexReader(index_dir)
    # head terms so unigram/pair features are all non-vacuous
    terms_by_df = sorted(r._df, key=lambda t: -r._df[t])[:3]
    ids, scores = sdm_scores_f64(r, pos_dir, terms_by_df, options=OPTS)
    assert len(ids) > 0
    ref = _brute_sdm(r, pos_dir, terms_by_df, 2000.0, (0.85, 0.1, 0.05), 8)
    assert set(ids.tolist()) == set(ref)
    for d, s in zip(ids, scores):
        assert abs(ref[int(d)] - s) < 1e-9
    # descending scores with ascending-numeric-name ties
    assert all(scores[i] >= scores[i + 1] - 1e-12 for i in range(len(scores) - 1))


def test_sdm_skips_absent_pair_features(built, ray_session):
    index_dir, pos_dir = built
    r = IndexReader(index_dir)
    t = sorted(r._df, key=lambda t_: -r._df[t_])[0]
    # second term absent from the corpus: both pair features have cf=0 and
    # the score must equal the pure unigram feature over the same docs
    ids, scores = sdm_scores_f64(r, pos_dir, [t, "zzzznotaterm"], options=OPTS)
    ids2, scores2 = sdm_scores_f64(r, pos_dir, [t], options=OPTS)
    assert ids.tolist() == ids2.tolist()
    np.testing.assert_allclose(scores, scores2, rtol=0, atol=0)


def test_sdm_no_match_empty(built, ray_session):
    index_dir, pos_dir = built
    r = IndexReader(index_dir)
    ids, scores = sdm_scores_f64(r, pos_dir, ["zzzz", "yyyy"], options=OPTS)
    assert len(ids) == 0 and len(scores) == 0
