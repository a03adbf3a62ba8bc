"""doc_keywords (per-doc top-k TF-IDF) and corpus_log_odds (vocabulary
drift between corpus halves): DuckDB whole-pipeline oracles + partition
invariance."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from search_engine_ray.dataops.textstats import corpus_log_odds, doc_keywords

_WS_SQL = r"[\t\n\x0B\x0C\r ]+"


def _mk_docs(n=60, seed=5):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i:02d}" for i in range(30)] + ["rare_x", "rare_y", "common"]
    texts = []
    for d in range(n):
        words = list(rng.choice(vocab[:30], rng.integers(5, 40)))
        if d % 3 == 0:
            words += ["rare_x"] * int(rng.integers(1, 4))
        if d % 2 == 0:
            words += ["rare_y"]
        words += ["common"] * 3
        rng.shuffle(words)
        texts.append(" ".join(words))
    # hostile rows: empty, whitespace-only, repeated single token
    texts[7] = ""
    texts[11] = " \t\n "
    texts[13] = "solo solo solo"
    return pa.table(
        {"doc_id": pa.array(np.arange(n, dtype=np.int64)), "text": pa.array(texts)}
    )


@pytest.fixture(scope="module")
def docs():
    return _mk_docs()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(sorted(df.columns), ignore_index=True)


def test_doc_keywords_matches_duckdb(ray_session, docs):
    ds = ray.data.from_arrow(docs).repartition(5)
    got = doc_keywords(ds, k=3).to_pandas()
    con = duckdb.connect()
    con.register("documents", docs)
    exp = con.execute(
        f"""
        WITH toks AS (
          SELECT doc_id, t
          FROM documents, UNNEST(regexp_split_to_array(text, '{_WS_SQL}')) AS u(t)
          WHERE t <> ''
        ),
        tf AS (SELECT doc_id, t AS term, count(*) AS tf FROM toks GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM documents),
        sc AS (
          SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 tf.tf * CAST(floor(ln(n.n_docs // df.df) * 1000000 + 0.5) AS BIGINT)
                   AS score_micros
          FROM tf JOIN df USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
               score_micros
        FROM (SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score_micros DESC, term) AS rn FROM sc)
        WHERE rn <= 3
        """
    ).df()
    g, x = _norm(got), _norm(exp)
    pd.testing.assert_frame_equal(g, x, check_dtype=False)
    # empty/whitespace docs produce no rows; the solo doc scores its token
    assert 7 not in set(got["doc_id"]) and 11 not in set(got["doc_id"])
    assert set(got[got["doc_id"] == 13]["term"]) == {"solo"}


def test_doc_keywords_partition_invariance(ray_session, docs):
    a = _norm(doc_keywords(ray.data.from_arrow(docs).repartition(2), k=2).to_pandas())
    b = _norm(doc_keywords(ray.data.from_arrow(docs).repartition(9), k=2).to_pandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_doc_keywords_empty(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    assert doc_keywords(ds).count() == 0


def _with_side(docs):
    ids = np.asarray(docs["doc_id"], dtype=np.int64)
    return docs.append_column("side_a", pa.array(ids % 2 == 0))


def test_corpus_log_odds_matches_duckdb(ray_session, docs):
    tbl = _with_side(docs)
    ds = ray.data.from_arrow(tbl).repartition(6)
    got = corpus_log_odds(ds, "side_a", k=5).to_pandas()
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.execute(
        f"""
        WITH toks AS (
          SELECT side_a, t
          FROM documents, UNNEST(regexp_split_to_array(text, '{_WS_SQL}')) AS u(t)
          WHERE t <> ''
        ),
        cnt AS (
          SELECT t AS term,
                 CAST(sum(CASE WHEN side_a THEN 1 ELSE 0 END) AS BIGINT) AS count_a,
                 CAST(sum(CASE WHEN side_a THEN 0 ELSE 1 END) AS BIGINT) AS count_b
          FROM toks GROUP BY 1
        ),
        ab AS (SELECT 'a_over_b' AS direction, term, count_a, count_b,
                      ((count_a + 1) * 1000000) // (count_b + 1) AS ratio_micros
               FROM cnt),
        ba AS (SELECT 'b_over_a' AS direction, term, count_a, count_b,
                      ((count_b + 1) * 1000000) // (count_a + 1) AS ratio_micros
               FROM cnt),
        u AS (SELECT * FROM ab UNION ALL SELECT * FROM ba)
        SELECT direction, term, count_a, count_b, CAST(ratio_micros AS BIGINT) AS ratio_micros
        FROM (SELECT *, row_number() OVER (
                PARTITION BY direction ORDER BY ratio_micros DESC, term) AS rn FROM u)
        WHERE rn <= 5
        ORDER BY direction, ratio_micros DESC, term
        """
    ).df()
    g = got.reset_index(drop=True)
    x = exp.reset_index(drop=True)
    pd.testing.assert_frame_equal(g, x, check_dtype=False)
    # rare_y appears only in even docs -> must top the a_over_b direction
    assert "rare_y" in set(g[g["direction"] == "a_over_b"]["term"])


def test_corpus_log_odds_partition_invariance(ray_session, docs):
    tbl = _with_side(docs)
    a = corpus_log_odds(ray.data.from_arrow(tbl).repartition(2), "side_a", k=4)
    b = corpus_log_odds(ray.data.from_arrow(tbl).repartition(11), "side_a", k=4)
    assert a.equals(b)


def test_corpus_log_odds_empty(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "side_a": pa.array([], pa.bool_()),
            }
        )
    )
    out = corpus_log_odds(ds, "side_a", k=3)
    assert out.num_rows == 0


def test_doc_keywords_broadcast_and_join_paths_identical(ray_session, docs):
    ds = ray.data.from_arrow(docs).repartition(4)
    fast = _norm(doc_keywords(ds, k=3).to_pandas())
    slow = _norm(doc_keywords(ds, k=3, broadcast_max_terms=0).to_pandas())
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
