"""Winnowing fingerprints (Schleimer et al. 2003): DuckDB oracle
bit-equality, the shared-substring guarantee, and partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from search_engine_ray.dataops.spandup import winnow_fingerprints

_WS_SQL = r"[\t\n\x0B\x0C\r ]+"
_W64 = "18446744073709551616::UHUGEINT"  # 2^64
_M = "11400714819323198485::UHUGEINT"  # 0x9E3779B97F4A7C15


def _winnow_sql(k: int, w: int) -> str:
    def powterm(expr: str, pows: int) -> str:
        e = f"{expr}::UHUGEINT"
        for _ in range(pows):
            e = f"(({e} * {_M}) % {_W64})"
        return e

    acc = " + ".join(powterm(f"t{j}.hh", k - 1 - j) for j in range(k))
    joins = "".join(
        f" JOIN th t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.pos = t0.pos + {j}"
        for j in range(1, k)
    )
    return f"""
        WITH tl AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '{_WS_SQL}'), x -> x <> '') AS tks
          FROM documents),
        tok AS (
          SELECT doc_id, unnest(tks) AS t, unnest(generate_series(1, len(tks))) AS pos
          FROM tl),
        th AS (SELECT doc_id, pos,
                      ('0x' || substr(md5(t), 1, 16))::UBIGINT AS hh FROM tok),
        shp AS (
          SELECT t0.doc_id, t0.pos, CAST(({acc}) % {_W64} AS UBIGINT) AS sh
          FROM th t0{joins}),
        keyed AS (
          SELECT doc_id, pos,
                 CAST(sh % 1099511627776 AS BIGINT) * 2097152
                   + (2097152 - pos) AS m,
                 count(*) OVER (PARTITION BY doc_id) AS g
          FROM shp),
        wins AS (
          SELECT doc_id,
                 min(m) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS wm
          FROM keyed
          QUALIFY pos <= GREATEST(g - {w} + 1, 1))
        SELECT DISTINCT doc_id,
               CAST(2097152 - (wm % 2097152) - 1 AS BIGINT) AS pos,
               CAST(wm // 2097152 AS BIGINT) AS fp
        FROM wins
        ORDER BY doc_id, pos
    """


def _mk_docs():
    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, rng.integers(8, 60))) for _ in range(25)]
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    texts[3] = texts[3] + " " + shared
    texts[9] = shared + " " + texts[9]
    texts[5] = ""  # empty
    texts[6] = "one two"  # < k tokens for k=4
    texts[12] = "a b c d e"  # g < w (2 k-grams for k=4, w=4)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        }
    )


@pytest.fixture(scope="module")
def docs():
    return _mk_docs()


def test_winnow_matches_duckdb(ray_session, docs):
    got = (
        winnow_fingerprints(ray.data.from_arrow(docs).repartition(4), k=4, w=4)
        .to_pandas()
        .sort_values(["doc_id", "pos"], ignore_index=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    exp = con.execute(_winnow_sql(4, 4)).df()
    pd.testing.assert_frame_equal(got, exp.reset_index(drop=True), check_dtype=False)
    # empty / too-short docs emit nothing; g<w doc emits exactly one row
    ids = set(got["doc_id"])
    assert 5 not in ids and 6 not in ids
    assert (got["doc_id"] == 12).sum() == 1


def test_winnow_shared_substring_guarantee(ray_session, docs):
    # docs 3 and 9 share an 8-token run; with k=4, w=4 any shared run of
    # w+k-1 = 7 tokens must produce at least one shared fingerprint
    fps = winnow_fingerprints(ray.data.from_arrow(docs), k=4, w=4).to_pandas()
    a = set(fps[fps["doc_id"] == 3]["fp"])
    b = set(fps[fps["doc_id"] == 9]["fp"])
    assert a & b


def test_winnow_partition_invariance(ray_session, docs):
    outs = []
    for parts in (1, 7):
        outs.append(
            winnow_fingerprints(ray.data.from_arrow(docs).repartition(parts), k=3, w=5)
            .to_pandas()
            .sort_values(["doc_id", "pos"], ignore_index=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_winnow_w1_keeps_every_kgram(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["a b c d e f"]),
        }
    )
    out = winnow_fingerprints(ray.data.from_arrow(tbl), k=3, w=1).to_pandas()
    assert out["pos"].tolist() == [0, 1, 2, 3]  # every k-gram selected


def test_winnow_validation(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["x"])})
    )
    with pytest.raises(ValueError):
        winnow_fingerprints(ds, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(ds, w=0)
