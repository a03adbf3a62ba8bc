"""Duplicate-span detection (dataops/spandup.py) vs brute force."""

import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.dataops.spandup import _merge_spans, duplicate_spans

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "a completely different sentence with the quick brown fox inside it",
    "unrelated words only here nothing repeats at all",
    "the quick brown fox jumps over a cliff",
    "",
]
IDS = [7, 11, 13, 17, 19]


def _brute(k: int, min_count: int = 2):
    toks = [t.split() for t in TEXTS]
    grams: dict[tuple, int] = {}
    for ts in toks:
        for i in range(len(ts) - k + 1):
            g = tuple(ts[i : i + k])
            grams[g] = grams.get(g, 0) + 1
    spans = {}
    for d, ts in zip(IDS, toks):
        pos = [
            i
            for i in range(len(ts) - k + 1)
            if grams[tuple(ts[i : i + k])] >= min_count
        ]
        if not pos:
            continue
        merged = []
        start, end = pos[0], pos[0] + k
        for p in pos[1:]:
            if p <= end:  # overlap or touch
                end = p + k
            else:
                merged.append((start, end))
                start, end = p, p + k
        merged.append((start, end))
        spans[d] = merged
    return spans


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(IDS, pa.int64()), "text": pa.array(TEXTS)})
    ).repartition(3)


def test_merge_spans_unit():
    s, e = _merge_spans(np.array([0, 1, 5, 9], dtype=np.int64), k=3)
    # 0,1 overlap; 1..4 and 5..8 touch at gap 4>3? diff(1,5)=4 > 3 -> break
    assert list(zip(s.tolist(), e.tolist())) == [(0, 4), (5, 8), (9, 12)]
    s2, e2 = _merge_spans(np.array([0, 3], dtype=np.int64), k=3)
    assert list(zip(s2.tolist(), e2.tolist())) == [(0, 6)]  # touching merges


@pytest.mark.parametrize("k", [2, 4])
def test_duplicate_spans_matches_brute(docs_ds, k):
    out = duplicate_spans(docs_ds, k=k, min_count=2).to_pandas()
    got: dict[int, list] = {}
    for _, r in out.iterrows():
        got.setdefault(int(r["doc_id"]), []).append(
            (int(r["start_tok"]), int(r["end_tok"]))
        )
    got = {d: sorted(v) for d, v in got.items()}
    assert got == _brute(k)


def test_duplicate_spans_no_dups(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["alpha beta gamma", "delta epsilon zeta"]),
            }
        )
    )
    assert duplicate_spans(ds, k=2).count() == 0


def test_duplicate_spans_within_doc_repeat(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array(["x y z w x y z q"]),
            }
        )
    )
    out = duplicate_spans(ds, k=3, min_count=2).to_pandas()
    # 'x y z' occurs twice inside one doc -> spans [0,3) and [4,7)
    assert sorted(zip(out["start_tok"], out["end_tok"])) == [(0, 3), (4, 7)]


def test_duplicate_spans_bad_k(docs_ds):
    with pytest.raises(ValueError):
        duplicate_spans(docs_ds, k=0)
