"""Table diff (dataops/diff.py) vs a DuckDB FULL OUTER JOIN oracle."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from search_engine_ray.dataops.diff import row_fingerprints, table_diff


def _tables():
    rng = np.random.default_rng(13)
    n = 300
    ids = np.arange(n, dtype=np.int64)
    txt = [f"doc {i} {int(v)}" for i, v in enumerate(rng.integers(0, 50, n))]
    val = pa.array(
        [None if i % 29 == 0 else int(v) for i, v in
         enumerate(rng.integers(0, 9, n))], pa.int64()
    )
    old = pa.table({"doc_id": pa.array(ids), "text": pa.array(txt), "v": val})
    # new: drop %7==0, change text %5==0 (of the kept), add 300..320
    keep = ids % 7 != 0
    new_ids = list(ids[keep]) + list(range(n, n + 20))
    new_txt = [
        (txt[i] + " CHANGED") if i % 5 == 0 else txt[i] for i in ids[keep]
    ] + [f"new {i}" for i in range(20)]
    new_val = [val[int(i)].as_py() for i in ids[keep]] + [1] * 20
    new = pa.table(
        {
            "doc_id": pa.array(new_ids, pa.int64()),
            "text": pa.array(new_txt, pa.string()),
            "v": pa.array(new_val, pa.int64()),
        }
    )
    return old, new


def test_table_diff_vs_duckdb(ray_session):
    old, new = _tables()
    got = (
        table_diff(
            ray.data.from_arrow(old).repartition(4),
            ray.data.from_arrow(new).repartition(3),
            "doc_id",
            ["text", "v"],
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("old", old)
    con.register("new", new)
    exp = con.sql("""
        WITH o AS (SELECT doc_id, md5(concat_ws('|', text,
                       COALESCE(CAST(v AS VARCHAR), chr(0) || 'null'))) AS fp
                   FROM old),
             n AS (SELECT doc_id, md5(concat_ws('|', text,
                       COALESCE(CAST(v AS VARCHAR), chr(0) || 'null'))) AS fp
                   FROM new)
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    ELSE 'changed' END AS status
        FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.fp <> n.fp
        ORDER BY doc_id
    """).df()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["status"].tolist() == exp["status"].tolist()
    # non-vacuous in all three classes
    counts = got["status"].value_counts()
    assert counts["added"] == 20 and counts["removed"] > 0 and counts["changed"] > 0
    # identical tables -> empty diff
    same = table_diff(
        ray.data.from_arrow(old), ray.data.from_arrow(old), "doc_id", ["text", "v"]
    ).to_pandas()
    assert len(same) == 0


def test_table_diff_validation(ray_session):
    old, _ = _tables()
    dup = pa.table(
        {
            "doc_id": pa.array([1, 1], pa.int64()),
            "text": pa.array(["a", "b"], pa.string()),
            "v": pa.array([1, 2], pa.int64()),
        }
    )
    with pytest.raises(ValueError, match="duplicate doc_id"):
        table_diff(
            ray.data.from_arrow(dup), ray.data.from_arrow(old), "doc_id",
            ["text", "v"],
        )
    with pytest.raises(ValueError, match="non-empty"):
        row_fingerprints(ray.data.from_arrow(old), "doc_id", [])
    # null sentinel: NULL v differs from the literal empty string
    a = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([""], pa.string()),
                  "v": pa.array([None], pa.int64())})
    b = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([""], pa.string()),
                  "v": pa.array([0], pa.int64())})
    d = table_diff(ray.data.from_arrow(a), ray.data.from_arrow(b), "doc_id",
                   ["text", "v"]).to_pandas()
    assert d["status"].tolist() == ["changed"]
