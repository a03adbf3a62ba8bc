"""Hashing-trick feature extraction (dataops/features.py)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from search_engine_ray.dataops.features import feature_hash, feature_hash_dense

TEXTS = [
    "alpha beta alpha gamma",
    "beta   beta\tdelta\n",
    "",
    "   ",
    "zeta",
]


def _brute(texts, dim):
    rows = {}
    for i, t in enumerate(texts):
        for w in t.split():
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
            b = (h >> 1) % dim
            s = 1 if (h & 1) == 0 else -1
            rows[(i, b)] = rows.get((i, b), 0) + s
    return {k: v for k, v in rows.items() if v != 0}


def test_feature_hash_matches_brute(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                "text": pa.array(TEXTS),
            }
        )
    )
    for dim in (1, 8, 64):
        out = feature_hash(ds, dim=dim).to_pandas()
        got = {
            (int(r.doc_id), int(r.bucket)): int(r.value)
            for r in out.itertuples()
        }
        assert got == _brute(TEXTS, dim)


def test_feature_hash_partition_invariance(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS),
        }
    )
    one = feature_hash(ray.data.from_arrow(tbl), dim=16).to_pandas()
    many = feature_hash(
        ray.data.from_arrow(tbl).repartition(4), dim=16
    ).to_pandas()
    key = ["doc_id", "bucket"]
    assert (
        one.sort_values(key, ignore_index=True).equals(
            many.sort_values(key, ignore_index=True)
        )
    )


def test_feature_hash_dense_matches_sparse(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                "text": pa.array(TEXTS),
            }
        )
    )
    dim = 16
    sparse = feature_hash(ds, dim=dim).to_pandas()
    dense = feature_hash_dense(ds, dim=dim).to_pandas()
    mat = np.zeros((len(TEXTS), dim), dtype=np.int64)
    for r in sparse.itertuples():
        mat[int(r.doc_id), int(r.bucket)] = int(r.value)
    for r in dense.itertuples():
        assert np.array_equal(np.asarray(r.features, dtype=np.int64), mat[int(r.doc_id)])
    # empty/whitespace-only docs are all-zero rows in dense, absent in sparse
    assert set(sparse["doc_id"]) == {0, 1, 4}
    assert set(dense["doc_id"]) == set(range(len(TEXTS)))


def test_feature_hash_validation(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["x"])})
    )
    with pytest.raises(ValueError):
        feature_hash(ds, dim=0)
    with pytest.raises(ValueError):
        feature_hash_dense(ds, dim=0)


def test_feature_hash_dense_keep_columns(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["alpha beta", "beta"]),
                "label": pa.array([7, 9], pa.int64()),
            }
        )
    )
    out = feature_hash_dense(ds, dim=8, keep_columns=("label",)).to_pandas()
    assert sorted(out.columns) == ["doc_id", "features", "label"]
    assert dict(zip(out["doc_id"], out["label"])) == {1: 7, 2: 9}
