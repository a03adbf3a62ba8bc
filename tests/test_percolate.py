"""Standing-query percolation (engine/percolate.py)."""

import numpy as np
import pandas as pd
import pytest

from search_engine_ray.config import IndexOptions

OPT = IndexOptions(case_folding=True, remove_stopwords=True, stemming=False)


def test_percolate_matches_and_edge_cases(ray_session):
    import ray.data

    from search_engine_ray.engine.percolate import percolate

    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": [
                    "spark hash join table",
                    "SPARK only here",  # casefolded
                    "hash join",
                    None,  # null doc
                    "the and of",  # stopwords only
                ],
            }
        )
    )
    qs = [(0, ["spark", "hash"]), (1, ["join"]), (2, ["spark"]), (3, ["zz", "join"])]
    out = percolate(ds, qs, OPT).to_pandas()
    got = sorted(zip(out["doc_id"], out["query_id"]))
    assert got == [(1, 0), (1, 1), (1, 2), (2, 2), (3, 1)]
    # duplicate terms in a query count once
    out2 = percolate(ds, [(0, ["join", "join", "hash"])], OPT).to_pandas()
    assert sorted(out2["doc_id"]) == [1, 3]
    # partition invariance
    out3 = percolate(ds.repartition(4), qs, OPT).to_pandas()
    assert sorted(zip(out3["doc_id"], out3["query_id"])) == got
    with pytest.raises(ValueError):
        percolate(ds, [], OPT)
    with pytest.raises(ValueError):
        percolate(ds, [(0, [])], OPT)


def test_percolate_stemming_option(ray_session):
    import ray.data

    from search_engine_ray.engine.percolate import percolate

    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1], "text": ["running quickly"]})
    )
    stem_opt = IndexOptions(case_folding=True, remove_stopwords=True, stemming=True)
    # engine stems doc tokens; the stored term must be the stemmed form
    from search_engine_ray.text.porter import stem_word

    stemmed = stem_word("running")
    out = percolate(ds, [(0, [stemmed])], stem_opt).to_pandas()
    assert out["doc_id"].tolist() == [1]


def test_percolate_phrases_exact_order_and_boundaries(ray_session):
    import pyarrow as pa
    import ray.data

    from search_engine_ray.config import IndexOptions
    from search_engine_ray.engine.percolate import percolate_phrases

    opts = IndexOptions(stemming=False, remove_stopwords=False)
    texts = [
        "alpha beta gamma",          # 0: matches (alpha beta) and (beta gamma)
        "beta alpha gamma",          # 1: reversed -> NO (alpha beta)
        "alpha xx beta",             # 2: gap -> no match
        "alpha",                     # 3: shorter than the phrase
        "",                          # 4: empty
        "gamma alpha beta gamma",    # 5: phrase mid-doc
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    out = (
        percolate_phrases(
            ds, [(10, ["alpha", "beta"]), (11, ["beta", "gamma"]), (12, ["gamma"])],
            opts,
        )
        .to_pandas()
        .sort_values(["doc_id", "query_id"], ignore_index=True)
    )
    got = set(zip(out["doc_id"], out["query_id"]))
    assert got == {
        (0, 10), (0, 11),
        (5, 10), (5, 11),
        (0, 12), (1, 12), (5, 12),
    }
    # a window must not span documents: doc ends with 'alpha', next doc
    # starts with 'beta' — no (alpha beta) match on either
    ds2 = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["zz alpha", "beta zz"]),
            }
        )
    )
    out2 = percolate_phrases(ds2, [(0, ["alpha", "beta"])], opts).to_pandas()
    assert len(out2) == 0
    # duplicate matches within one doc collapse to one row
    ds3 = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array([7], pa.int64()),
             "text": pa.array(["alpha beta alpha beta"])}
        )
    )
    out3 = percolate_phrases(ds3, [(0, ["alpha", "beta"])], opts).to_pandas()
    assert out3["doc_id"].tolist() == [7] and len(out3) == 1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        percolate_phrases(ds, [], opts)
    with _pytest.raises(ValueError):
        percolate_phrases(ds, [(0, [])], opts)
