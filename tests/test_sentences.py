"""Sentence segmentation (dataops/chunk.py split_sentences)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from search_engine_ray.dataops.chunk import split_sentences

HOSTILE = [
    "First sentence. Second one! Third?? And a tail without terminator",
    "...leading terminators. then text",
    "no terminators at all",
    "",
    "   \t \v \f  ",
    "...",
    " .. ",  # spaces among terminators: regex matches, trims to '..'
    "\va.\f b!\r",  # exotic whitespace trimming
    "a!? b.",  # mixed multi-terminator run
    "x." * 5,  # dense terminators
]


def _oracle(path: str):
    return duckdb.connect().execute(
        f"""
        WITH xs AS (SELECT doc_id, regexp_extract_all(text, '[^.!?]+[.!?]*') AS a
                    FROM read_parquet('{path}')),
        f AS (SELECT doc_id, a[i] AS s, i
              FROM xs, unnest(generate_series(1, len(a))) AS g(i)),
        t AS (SELECT doc_id, i,
                     trim(s, chr(9)||chr(10)||chr(11)||chr(12)||chr(13)||' ') AS snt
              FROM f)
        SELECT doc_id,
               CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1
                    AS BIGINT) AS sent_id,
               snt AS text
        FROM t WHERE snt <> '' ORDER BY doc_id, sent_id
        """
    ).arrow()


def test_matches_duckdb_on_hostile_corpus(ray_session, tmp_path):
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(HOSTILE)), pa.int64()),
            "text": pa.array(HOSTILE),
        }
    )
    path = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, path)
    got = (
        split_sentences(ray.data.read_parquet(path).repartition(4))
        .to_pandas()
        .sort_values(["doc_id", "sent_id"], ignore_index=True)
    )
    ora = _oracle(path).to_pandas()
    assert got.equals(ora.astype(got.dtypes.to_dict()))
    # spot semantics: doc 0 has 4 sentences, terminators attached
    d0 = got[got.doc_id == 0]["text"].tolist()
    assert d0 == [
        "First sentence.",
        "Second one!",
        "Third??",
        "And a tail without terminator",
    ]
    # leading terminators skipped, not merged
    assert got[got.doc_id == 1]["text"].tolist() == [
        "leading terminators.",
        "then text",
    ]
    # whitespace-only and empty docs yield nothing
    assert set(got.doc_id) & {3, 4} == set()
    # ' .. ' trims to '..' and is kept (regex semantics, documented)
    assert got[got.doc_id == 6]["text"].tolist() == [".."]


def test_nul_fails_loud(ray_session):
    bad = pa.table(
        {"doc_id": pa.array([0], pa.int64()), "text": pa.array(["a\x00b."])}
    )
    with pytest.raises(Exception, match="NUL"):
        split_sentences(ray.data.from_arrow(bad)).materialize()


def test_null_text_and_order(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([7, 3], pa.int64()),
            "text": pa.array([None, "b. a."]),
        }
    )
    out = split_sentences(ray.data.from_arrow(tbl)).to_pandas()
    assert out["doc_id"].tolist() == [3, 3]
    assert out["text"].tolist() == ["b.", "a."]
    assert out["sent_id"].tolist() == [0, 1]
