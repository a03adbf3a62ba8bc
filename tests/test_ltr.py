"""LTR feature extraction (engine/ltr.py): per-candidate feature vectors
reuse the verified scorer twins and recompute exactly."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.config import BuildConfig, IndexOptions
from search_engine_ray.engine.build import build_index
from search_engine_ray.engine.index_reader import IndexReader
from search_engine_ray.engine.ltr import ltr_feature_table

BASE = "/tmp/se_ray_ltr"

DOCS = [
    "alpha beta alpha gamma",        # matches alpha(2), beta(1)
    "beta beta delta",               # matches beta(2)
    "gamma delta epsilon",           # no query terms
    "alpha beta alpha beta alpha",   # matches alpha(3), beta(2)
    "zeta alpha",                    # matches alpha(1)
]
QUERY = [("alpha", 1), ("beta", 1)]


@pytest.fixture(scope="module")
def reader(ray_session):
    shutil.rmtree(BASE, ignore_errors=True)
    cdir = f"{BASE}/corpus"
    os.makedirs(cdir)
    pq.write_table(
        pa.table({"doc_id": [str(i) for i in range(len(DOCS))], "text": DOCS}),
        f"{cdir}/docs.parquet",
    )
    idir = f"{BASE}/index"
    build_index(
        cdir,
        idir,
        BuildConfig(
            options=IndexOptions(case_folding=True, remove_stopwords=True, stemming=False)
        ),
        overwrite=True,
        source_column="text",
        name_column="doc_id",
    )
    return IndexReader(idir)


def test_features_exact(reader):
    t = ltr_feature_table(reader, QUERY)
    docs = t["doc"].to_numpy().tolist()
    # doc 2 matches nothing -> absent; the other four are candidates
    assert sorted(docs) == [0, 1, 3, 4]
    by_doc = {d: i for i, d in enumerate(docs)}
    nm = t["n_matched"].to_numpy()
    st = t["sum_tf"].to_numpy()
    dl = t["dl"].to_numpy()
    assert (nm[by_doc[0]], st[by_doc[0]], dl[by_doc[0]]) == (2, 3, 4)
    assert (nm[by_doc[1]], st[by_doc[1]], dl[by_doc[1]]) == (1, 2, 3)
    assert (nm[by_doc[3]], st[by_doc[3]], dl[by_doc[3]]) == (2, 5, 5)
    assert (nm[by_doc[4]], st[by_doc[4]], dl[by_doc[4]]) == (1, 1, 2)


def test_scores_match_twins(reader):
    from search_engine_ray.pipelines import bm25_scores_f64, tfidf_scores_f64

    t = ltr_feature_table(reader, QUERY)
    docs = t["doc"].to_numpy()
    bm_ids, bm_scores = bm25_scores_f64(reader, QUERY)
    # ranked identically to the bm25 twin (score desc, doc asc)
    np.testing.assert_array_equal(docs, bm_ids)
    micros = lambda x: np.floor(x * 1_000_000 + 0.5).astype(np.int64)  # noqa: E731
    np.testing.assert_array_equal(t["bm25_micros"].to_numpy(), micros(bm_scores))
    ti_ids, ti_scores = tfidf_scores_f64(reader, QUERY)
    ti = dict(zip(ti_ids.tolist(), micros(ti_scores).tolist()))
    got = dict(zip(docs.tolist(), t["tfidf_micros"].to_numpy().tolist()))
    assert got == {d: ti[d] for d in got}


def test_top_cap(reader):
    t = ltr_feature_table(reader, QUERY, top=2)
    assert len(t) == 2
    full = ltr_feature_table(reader, QUERY)
    assert t["doc"].to_numpy().tolist() == full["doc"].to_numpy().tolist()[:2]
    assert len(ltr_feature_table(reader, QUERY, top=0)) == 0


def test_absent_terms_only(reader):
    t = ltr_feature_table(reader, [("zzznowhere", 1)])
    assert len(t) == 0
    assert t.column_names == [
        "doc", "n_matched", "sum_tf", "dl", "bm25_micros", "tfidf_micros",
    ]
