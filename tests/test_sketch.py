"""Exact distributed heavy hitters (dataops/sketch.py)."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.dataops.sketch import heavy_hitters

TEXTS = [
    "a a a a b b c d e",
    "a a b b b f g",
    "a b c c c c h",
    "",
    "   ",  # whitespace-only
    "a\vb\fa",  # VT/FF are whitespace in the pinned class
    "z " * 40,  # one locally-dominant term
]
DOC_IDS = list(range(len(TEXTS)))


def _brute(k: int) -> dict[str, int]:
    import re

    counts: dict[str, int] = {}
    for t in TEXTS:
        for tok in re.split("[\t\n\x0b\x0c\r ]+", t):
            if tok:
                counts[tok] = counts.get(tok, 0) + 1
    total = sum(counts.values())
    return {t: c for t, c in sorted(counts.items()) if c * k >= total}


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(DOC_IDS, pa.int64()), "text": pa.array(TEXTS)})
    )


@pytest.mark.parametrize("k", [1, 3, 10, 1000])
def test_heavy_hitters_exact(docs_ds, k):
    got = heavy_hitters(docs_ds, k=k)
    exp = _brute(k)
    assert got["term"].to_pylist() == list(exp)
    assert got["count"].to_pylist() == list(exp.values())


def test_heavy_hitters_partition_invariant(docs_ds, ray_session):
    """The local-candidacy lemma must hold for ANY batching: repartitioned
    input yields the identical exact result."""
    base = heavy_hitters(docs_ds, k=5)
    for parts in (1, 3, 7):
        got = heavy_hitters(docs_ds.repartition(parts), k=5)
        assert got["term"].to_pylist() == base["term"].to_pylist()
        assert got["count"].to_pylist() == base["count"].to_pylist()


def test_heavy_hitters_validates_k(docs_ds):
    with pytest.raises(ValueError):
        heavy_hitters(docs_ds, k=0)


def test_heavy_hitters_empty_corpus(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array([" \t "])})
    )
    got = heavy_hitters(ds, k=10)
    assert got.num_rows == 0
    assert got.column_names == ["term", "count"]
