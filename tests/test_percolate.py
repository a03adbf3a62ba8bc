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
