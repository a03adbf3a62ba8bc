"""TREC run evaluation (engine/evaluate.py) vs a DuckDB window oracle."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from search_engine_ray.engine.evaluate import evaluate_run


def _random_case(seed, n_topics=40, depth=20):
    rng = np.random.default_rng(seed)
    run_rows = {"topic": [], "doc_id": [], "rank": []}
    qrel_rows = {"topic": [], "doc_id": []}
    for t in range(1, n_topics + 1):
        n_ret = int(rng.integers(0, depth + 1))
        docs = rng.choice(10_000, size=n_ret, replace=False)
        for r, d in enumerate(docs, start=1):
            run_rows["topic"].append(t)
            run_rows["doc_id"].append(int(d))
            run_rows["rank"].append(r)
        # relevant set: some retrieved, some not
        n_rel = int(rng.integers(0, 8))
        rel_docs = set(
            int(d) for d in rng.choice(docs, size=min(n_rel, n_ret), replace=False)
        ) | set(int(d) for d in rng.integers(10_000, 10_050, size=rng.integers(0, 3)))
        for d in sorted(rel_docs):
            qrel_rows["topic"].append(t)
            qrel_rows["doc_id"].append(d)
    mk = lambda d: pa.table({c: pa.array(v, pa.int64()) for c, v in d.items()})
    return mk(run_rows), mk(qrel_rows)


_ORACLE = """
    WITH tagged AS (
        SELECT r.topic, r.rank,
               CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
        FROM run r LEFT JOIN qrels q
          ON r.topic = q.topic AND r.doc_id = q.doc_id
    ),
    c AS (SELECT topic, rank, rel,
                 SUM(rel) OVER (PARTITION BY topic ORDER BY rank) AS cum
          FROM tagged),
    per_run AS (
        SELECT topic,
               count(*) AS n_ret,
               SUM(rel) AS n_rel_ret,
               SUM(CASE WHEN rel = 1 AND rank <= {k} THEN 1 ELSE 0 END) AS hits_at_k,
               COALESCE(MIN(CASE WHEN rel = 1 THEN rank END), -1) AS first_rel_rank,
               COALESCE(1000000 // MIN(CASE WHEN rel = 1 THEN rank END), 0) AS rr_micros,
               COALESCE(SUM(CASE WHEN rel = 1 THEN (cum * 1000000) // rank END), 0)
                   AS sum_prec_micros
        FROM c GROUP BY topic
    ),
    per_qrel AS (SELECT topic, count(*) AS n_rel FROM qrels GROUP BY topic),
    topics AS (SELECT topic FROM per_run UNION SELECT topic FROM per_qrel)
    SELECT t.topic,
           COALESCE(r.n_ret, 0) AS n_ret,
           COALESCE(q.n_rel, 0) AS n_rel,
           COALESCE(r.n_rel_ret, 0) AS n_rel_ret,
           COALESCE(r.hits_at_k, 0) AS hits_at_k,
           COALESCE(r.first_rel_rank, -1) AS first_rel_rank,
           COALESCE(r.rr_micros, 0) AS rr_micros,
           COALESCE(r.sum_prec_micros, 0) AS sum_prec_micros
    FROM topics t
    LEFT JOIN per_run r ON t.topic = r.topic
    LEFT JOIN per_qrel q ON t.topic = q.topic
    ORDER BY t.topic
"""


def _check(run_tbl, qrel_tbl, k, parts, n_buckets):
    got = (
        evaluate_run(
            ray.data.from_arrow(run_tbl).repartition(parts),
            ray.data.from_arrow(qrel_tbl).repartition(max(1, parts - 1)),
            k=k,
            n_buckets=n_buckets,
        )
        .to_pandas()
        .sort_values("topic", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("run", run_tbl)
    con.register("qrels", qrel_tbl)
    exp = con.sql(_ORACLE.format(k=k)).df()
    assert list(got.columns) == list(exp.columns)
    assert (got.values == exp.values.astype(np.int64)).all(), (got, exp)


def test_evaluate_run_vs_duckdb(ray_session):
    run_tbl, qrel_tbl = _random_case(5)
    _check(run_tbl, qrel_tbl, k=10, parts=4, n_buckets=7)
    _check(run_tbl, qrel_tbl, k=1, parts=1, n_buckets=1)  # single bucket/partition
    _check(run_tbl, qrel_tbl, k=50, parts=6, n_buckets=64)  # k > depth


def test_evaluate_run_edges(ray_session):
    # topic 1: run but no qrels; topic 2: qrels but no run;
    # topic 3: every retrieved doc relevant
    run_tbl = pa.table(
        {
            "topic": pa.array([1, 1, 3, 3], pa.int64()),
            "doc_id": pa.array([7, 8, 20, 21], pa.int64()),
            "rank": pa.array([1, 2, 1, 2], pa.int64()),
        }
    )
    qrel_tbl = pa.table(
        {
            "topic": pa.array([2, 2, 3, 3], pa.int64()),
            "doc_id": pa.array([11, 12, 20, 21], pa.int64()),
        }
    )
    got = (
        evaluate_run(ray.data.from_arrow(run_tbl), ray.data.from_arrow(qrel_tbl), k=2)
        .to_pandas()
        .sort_values("topic", ignore_index=True)
    )
    assert got["topic"].tolist() == [1, 2, 3]
    assert got["n_rel"].tolist() == [0, 2, 2]
    assert got["n_ret"].tolist() == [2, 0, 2]
    assert got["first_rel_rank"].tolist() == [-1, -1, 1]
    assert got["rr_micros"].tolist() == [0, 0, 1_000_000]
    # AP terms: rank1 -> 1e6, rank2 -> 1e6 -> sum 2e6 for the all-relevant topic
    assert got["sum_prec_micros"].tolist() == [0, 0, 2_000_000]
    with pytest.raises(ValueError, match="k must be"):
        evaluate_run(
            ray.data.from_arrow(run_tbl), ray.data.from_arrow(qrel_tbl), k=0
        )


def test_ndcg_at_k(ray_session):
    from search_engine_ray.engine.evaluate import ndcg_at_k

    run = pa.table(
        {
            "topic": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "doc_id": pa.array([10, 11, 12, 20, 21, 30], pa.int64()),
            "rank": pa.array([1, 2, 3, 1, 2, 1], pa.int64()),
        }
    )
    qrels = pa.table(
        {
            "topic": pa.array([1, 1, 2, 4], pa.int64()),
            "doc_id": pa.array([11, 12, 99, 40], pa.int64()),
        }
    )
    got = ndcg_at_k(run, qrels, k=3)
    res = dict(zip(got["topic"].to_pylist(), got["ndcg"].to_pylist()))
    # topic 1: rel at ranks 2,3 -> dcg = 1/log2(3) + 1/log2(4); ideal (2 rel)
    # = 1/log2(2) + 1/log2(3)
    exp1 = (1 / np.log2(3) + 1 / np.log2(4)) / (1 / np.log2(2) + 1 / np.log2(3))
    assert abs(res[1] - exp1) < 1e-12
    assert res[2] == 0.0  # relevant doc not retrieved
    assert res[3] == 0.0  # no qrels at all
    assert res[4] == 0.0  # qrels but no run
    with pytest.raises(ValueError, match="k must be"):
        ndcg_at_k(run, qrels, k=0)


def test_evaluate_run_dedups_duplicate_qrels(ray_session):
    # review fix: duplicate qrel pairs must not inflate metrics
    run = pa.table(
        {
            "topic": pa.array([1, 1], pa.int64()),
            "doc_id": pa.array([7, 8], pa.int64()),
            "rank": pa.array([1, 2], pa.int64()),
        }
    )
    qrels = pa.table(
        {
            "topic": pa.array([1, 1, 1], pa.int64()),
            "doc_id": pa.array([7, 7, 9], pa.int64()),  # 7 duplicated
        }
    )
    got = (
        evaluate_run(ray.data.from_arrow(run), ray.data.from_arrow(qrels), k=2)
        .to_pandas()
    )
    row = got.iloc[0]
    assert row["n_ret"] == 2 and row["n_rel"] == 2 and row["n_rel_ret"] == 1
    assert row["hits_at_k"] == 1 and row["rr_micros"] == 1_000_000
    assert row["sum_prec_micros"] == 1_000_000


def _run_tbl(rows):
    import pyarrow as pa
    import ray.data

    t, d, r = zip(*rows) if rows else ((), (), ())
    return ray.data.from_arrow(
        pa.table(
            {
                "topic": pa.array(list(t), pa.int64()),
                "doc_id": pa.array(list(d), pa.int64()),
                "rank": pa.array(list(r), pa.int64()),
            }
        )
    )


def test_run_agreement_hand_computed(ray_session):
    from search_engine_ray.engine.evaluate import run_agreement

    # topic 1: identical rankings -> all concordant, footrule 0
    # topic 2: reversed order over 3 common docs -> all discordant
    # topic 3: only in run A
    a = _run_tbl(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2), (2, 22, 3),
         (3, 30, 1)]
    )
    b = _run_tbl(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 22, 1), (2, 21, 2), (2, 20, 3)]
    )
    got = (
        run_agreement(a, b, k=10)
        .to_pandas()
        .sort_values("topic", ignore_index=True)
    )
    assert got["topic"].tolist() == [1, 2, 3]
    assert got["n_a"].tolist() == [3, 3, 1]
    assert got["n_b"].tolist() == [3, 3, 0]
    assert got["n_common"].tolist() == [3, 3, 0]
    assert got["concordant"].tolist() == [3, 0, 0]
    assert got["discordant"].tolist() == [0, 3, 0]
    assert got["footrule_sum"].tolist() == [0, 4, 0]  # |1-3|+|2-2|+|3-1|


def test_run_agreement_k_prefix_and_validation(ray_session):
    import pytest

    from search_engine_ray.engine.evaluate import run_agreement

    a = _run_tbl([(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    b = _run_tbl([(1, 12, 1), (1, 10, 2), (1, 11, 3)])
    got = run_agreement(a, b, k=2).to_pandas()
    # rank<=2 prefixes: A={10,11}, B={12,10} -> common {10}
    assert got["n_common"].tolist() == [1]
    assert got["n_a"].tolist() == [2] and got["n_b"].tolist() == [2]
    with pytest.raises(ValueError):
        run_agreement(a, b, k=0)


def _brute_rbo(ranks_a, ranks_b, k=10, p=0.9):
    """ranks_*: {doc: rank}; prefix ('min') RBO at depth k."""
    total = 0.0
    for d in range(1, k + 1):
        ov = sum(
            1
            for doc, ra in ranks_a.items()
            if ra <= d and ranks_b.get(doc, k + 1) <= d
        )
        total += p ** (d - 1) * ov / d
    return (1 - p) * total


def test_rbo_overlap_matches_brute(ray_session):
    from search_engine_ray.engine.evaluate import rbo_overlap

    rng = np.random.default_rng(7)
    per_topic = {}
    tbls_a, tbls_b = [], []
    for tid in (1, 2, 3):
        docs = rng.permutation(40)
        da = {int(d): r for r, d in enumerate(docs[:10], 1)}
        db = {int(d): r for r, d in enumerate(rng.permutation(docs[:15])[:10], 1)}
        per_topic[tid] = (da, db)
        for side, dd in (("a", da), ("b", db)):
            t = pa.table(
                {
                    "topic": pa.array([tid] * len(dd), pa.int64()),
                    "doc_id": pa.array(list(dd), pa.int64()),
                    "rank": pa.array(list(dd.values()), pa.int64()),
                }
            )
            (tbls_a if side == "a" else tbls_b).append(t)
    a = ray.data.from_arrow(pa.concat_tables(tbls_a))
    b = ray.data.from_arrow(pa.concat_tables(tbls_b))
    out = rbo_overlap(a, b, k=10).to_pandas().set_index("topic").sort_index()
    assert out.index.tolist() == [1, 2, 3]
    for tid, (da, db) in per_topic.items():
        row = out.loc[tid]
        exp = _brute_rbo(da, db)
        got = row["rbo_scaled"] * 1.0 / (2520 * 10**10)  # * (1-p) scale below
        # rbo_scaled * (p_den-p_num) / (lcm * p_den^k) == brute float RBO
        assert abs(got - exp) < 1e-9
        assert row["rbo_micros"] == int(np.floor(got * 1e6 + 0.5))
        assert row["n_common"] == len(set(da) & set(db))


def test_rbo_identical_and_disjoint(ray_session):
    from search_engine_ray.engine.evaluate import rbo_overlap

    t = pa.table(
        {
            "topic": pa.array([1] * 10, pa.int64()),
            "doc_id": pa.array(list(range(10)), pa.int64()),
            "rank": pa.array(list(range(1, 11)), pa.int64()),
        }
    )
    u = pa.table(
        {
            "topic": pa.array([1] * 10, pa.int64()),
            "doc_id": pa.array(list(range(100, 110)), pa.int64()),
            "rank": pa.array(list(range(1, 11)), pa.int64()),
        }
    )
    same = (
        rbo_overlap(ray.data.from_arrow(t), ray.data.from_arrow(t), k=10)
        .to_pandas()
    )
    # identical rankings: RBO@k = (1-p) * sum p^(d-1) (overlap_d = d)
    exp = 0.1 * sum(0.9 ** (d - 1) for d in range(1, 11))
    assert same["rbo_micros"].tolist() == [int(np.floor(exp * 1e6 + 0.5))]
    disj = (
        rbo_overlap(ray.data.from_arrow(t), ray.data.from_arrow(u), k=10)
        .to_pandas()
    )
    assert disj["rbo_scaled"].tolist() == [0]
    assert disj["rbo_micros"].tolist() == [0]
    assert disj["n_common"].tolist() == [0]
    with pytest.raises(ValueError):
        from search_engine_ray.engine.evaluate import rbo_overlap as f

        f(ray.data.from_arrow(t), ray.data.from_arrow(t), k=0)
    with pytest.raises(ValueError):
        rbo_overlap(ray.data.from_arrow(t), ray.data.from_arrow(t), k=10, p_num=11)
