"""PMI co-occurrence (dataops/cooccur.py) vs brute force."""

import math

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.config import IndexOptions
from search_engine_ray.dataops.cooccur import _pairs_within_segments, pmi_top_pairs
from search_engine_ray.text.tokenizer import normalize_text_oracle

OPTS = IndexOptions(case_folding=True, remove_stopwords=True, stemming=False)

TEXTS = [
    "spark hash join",
    "spark hash hash",
    "window sort",
    "spark window sort sort",
    "hash join",
    "",
]


def _brute(k=50, min_count=1, min_df=1, max_df=None):
    docs = [
        set(normalize_text_oracle(t, case_folding=True, remove_stopwords=True, stemming=False))
        for t in TEXTS
    ]
    n_docs = len(TEXTS)
    df = {}
    for d in docs:
        for t in d:
            df[t] = df.get(t, 0) + 1
    kept = {t for t, c in df.items() if c >= min_df and (max_df is None or c <= max_df)}
    pairs = {}
    for d in docs:
        ts = sorted(t for t in d if t in kept)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                pairs[(ts[i], ts[j])] = pairs.get((ts[i], ts[j]), 0) + 1
    rows = []
    for (a, b), n in pairs.items():
        if n < min_count:
            continue
        pmi = math.log((float(n_docs) * n) / (float(df[a]) * df[b]))
        rows.append((a, b, n, math.floor(pmi * 1_000_000 + 0.5)))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:k]


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(TEXTS)), pa.int64()), "text": pa.array(TEXTS)}
        )
    ).repartition(3)


def test_pairs_within_segments():
    a, b = _pairs_within_segments(np.array([3, 1, 2], dtype=np.int64))
    got = sorted(zip(a.tolist(), b.tolist()))
    assert got == [(0, 1), (0, 2), (1, 2), (4, 5)]
    a0, b0 = _pairs_within_segments(np.array([], dtype=np.int64))
    assert len(a0) == 0 and len(b0) == 0
    a1, b1 = _pairs_within_segments(np.array([1, 1], dtype=np.int64))
    assert len(a1) == 0 and len(b1) == 0


def test_pmi_top_pairs_matches_brute(docs_ds):
    got = pmi_top_pairs(docs_ds, OPTS, k=50, min_count=1).to_pandas()
    rows = list(map(tuple, got.to_numpy()))
    assert rows == _brute(min_count=1)


def test_pmi_min_count_and_df_filters(docs_ds):
    got = pmi_top_pairs(docs_ds, OPTS, k=50, min_count=2).to_pandas()
    assert list(map(tuple, got.to_numpy())) == _brute(min_count=2)
    # max_df drops the most common term ('spark', df=3)
    got2 = pmi_top_pairs(docs_ds, OPTS, k=50, min_count=1, max_df=2).to_pandas()
    assert list(map(tuple, got2.to_numpy())) == _brute(min_count=1, max_df=2)
    assert "spark" not in set(got2["term_a"]) | set(got2["term_b"])


def test_pmi_topk_truncation(docs_ds):
    got = pmi_top_pairs(docs_ds, OPTS, k=2, min_count=1).to_pandas()
    assert list(map(tuple, got.to_numpy())) == _brute(min_count=1)[:2]


def test_pmi_degenerate_vocab(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["spark"])})
    )
    out = pmi_top_pairs(ds, OPTS, k=10)
    assert out.num_rows == 0
    assert out.schema.names == ["term_a", "term_b", "n_ab", "pmi_micros"]
