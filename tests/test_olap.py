"""OLAP / event-analytics operators (dataops/olap.py) vs DuckDB:
ordered funnels (with and without a conversion window), ROLLUP
subtotals, wide pivots — plus partition invariance and validation."""

import datetime as dt

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from search_engine_ray.dataops.olap import funnel_counts, pivot_counts, rollup_counts

RNG = np.random.default_rng(99)
N_EV = 3000
N_USERS = 60


@pytest.fixture(scope="module")
def events():
    base = dt.datetime(2024, 1, 1)
    ts = pa.array(
        [base + dt.timedelta(seconds=int(s)) for s in RNG.integers(0, 10**6, N_EV)],
        pa.timestamp("us"),
    )
    return pa.table(
        {
            "user_id": pa.array(RNG.integers(0, N_USERS, N_EV), pa.int64()),
            "event_type": pa.array(RNG.choice(["view", "click", "buy", "noise"], N_EV)),
            "ts": ts,
        }
    )


@pytest.fixture(scope="module")
def docs():
    return pa.table(
        {
            "source": pa.array([f"s{i % 4}" for i in range(500)]),
            "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(500)]),
            "n_chars": pa.array(RNG.integers(10, 5000, 500).astype(np.int64)),
        }
    )


def _ds(tbl, parts=5):
    return ray.data.from_arrow(tbl).repartition(parts)


def _funnel_sql(con, within_us=None):
    w1 = f"AND epoch_us(e.ts) <= epoch_us(s1.t) + {within_us}" if within_us else ""
    w2 = f"AND epoch_us(e.ts) <= epoch_us(s2.t) + {within_us}" if within_us else ""
    return con.sql(
        f"""
        WITH s1 AS (SELECT user_id, min(ts) t FROM events
                    WHERE event_type='view' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(e.ts) t FROM events e JOIN s1 USING(user_id)
               WHERE e.event_type='click' AND e.ts > s1.t {w1} GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(e.ts) t FROM events e JOIN s2 USING(user_id)
               WHERE e.event_type='buy' AND e.ts > s2.t {w2} GROUP BY e.user_id)
        SELECT 1 AS step, 'view' AS step_name,
               CAST(count(*) AS BIGINT) AS n_users FROM s1
        UNION ALL SELECT 2, 'click', count(*) FROM s2
        UNION ALL SELECT 3, 'buy', count(*) FROM s3 ORDER BY step
        """
    ).arrow()


def test_funnel_vs_duckdb(ray_session, events):
    con = duckdb.connect()
    con.register("events", events)
    got = funnel_counts(_ds(events), ["view", "click", "buy"])
    exp = _funnel_sql(con)
    assert got.equals(exp.cast(got.schema))
    # with a conversion window the funnel must actually narrow
    w = 3600 * 10**6
    got_w = funnel_counts(_ds(events), ["view", "click", "buy"], within_us=w)
    exp_w = _funnel_sql(con, within_us=w)
    assert got_w.equals(exp_w.cast(got_w.schema))
    assert got_w["n_users"][1].as_py() < got["n_users"][1].as_py()
    assert got_w["n_users"][2].as_py() > 0  # non-vacuous


def test_funnel_partition_invariant_and_dead_step(ray_session, events):
    base = funnel_counts(_ds(events, 1), ["view", "click", "buy"])
    got = funnel_counts(_ds(events, 11), ["view", "click", "buy"])
    assert got.equals(base)
    dead = funnel_counts(_ds(events), ["view", "nosuch", "buy"])
    assert dead["n_users"].to_pylist()[1:] == [0, 0]  # truncates downstream
    with pytest.raises(ValueError, match="non-empty"):
        funnel_counts(_ds(events), [])
    with pytest.raises(ValueError, match="within_us"):
        funnel_counts(_ds(events), ["view"], within_us=0)


def test_rollup_vs_duckdb(ray_session, docs):
    con = duckdb.connect()
    con.register("documents", docs)
    got = rollup_counts(_ds(docs), dims=("source", "lang"), value_col="n_chars")
    exp = con.sql(
        """SELECT COALESCE(source,'ALL') AS source, COALESCE(lang,'ALL') AS lang,
                  CAST(count(*) AS BIGINT) AS n_rows,
                  CAST(sum(n_chars) AS BIGINT) AS sum_val
           FROM documents GROUP BY ROLLUP(source, lang) ORDER BY 1, 2"""
    ).arrow()
    assert got.equals(exp.cast(got.schema))
    assert rollup_counts(_ds(docs, 1), ("source", "lang"), "n_chars").equals(got)
    bad = docs.set_column(0, "source", pa.array(["ALL"] * 500))
    with pytest.raises(Exception, match="ALL"):
        rollup_counts(_ds(bad), ("source", "lang"), "n_chars")


def test_pivot_vs_duckdb(ray_session, docs):
    con = duckdb.connect()
    con.register("documents", docs)
    doms = ["s0", "s1", "s2", "s3"]
    got = pivot_counts(_ds(docs), "lang", "source", doms)
    cases = ", ".join(
        f"CAST(sum(CASE WHEN source='{s}' THEN 1 ELSE 0 END) AS BIGINT) AS \"{s}\""
        for s in doms
    )
    exp = con.sql(
        f"SELECT lang, {cases} FROM documents GROUP BY lang ORDER BY lang"
    ).arrow()
    assert got.equals(exp.cast(got.schema))
    assert pivot_counts(_ds(docs, 1), "lang", "source", doms).equals(got)
    with pytest.raises(Exception, match="outside the declared domain"):
        pivot_counts(_ds(docs), "lang", "source", ["s0", "s1"])
    with pytest.raises(ValueError, match="unique"):
        pivot_counts(_ds(docs), "lang", "source", ["s0", "s0"])


def test_transition_counts_vs_duckdb(ray_session, events):
    from search_engine_ray.dataops.olap import transition_counts

    con = duckdb.connect()
    con.register("events", events)
    ev = events.append_column(
        "event_id", pa.array(np.arange(events.num_rows, dtype=np.int64))
    )
    con2 = duckdb.connect()
    con2.register("events", ev)
    got = transition_counts(_ds(ev), n_buckets=16)
    exp = con2.sql(
        """WITH s AS (
             SELECT event_type AS t,
                    lag(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS pt
             FROM events)
           SELECT pt AS from_type, t AS to_type, CAST(count(*) AS BIGINT) AS n
           FROM s WHERE pt IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2"""
    ).arrow()
    assert got.equals(exp.cast(got.schema))
    # total transitions = total events - number of users
    n_users = len(set(ev["user_id"].to_pylist()))
    assert int(got["n"].to_pandas().sum()) == ev.num_rows - n_users
    assert transition_counts(_ds(ev, 1), n_buckets=3).equals(got)


def test_grouped_vector_sums_vs_duckdb(ray_session):
    import ray.data

    from search_engine_ray.dataops.cluster import grouped_vector_sums

    rng = np.random.default_rng(3)
    vecs = rng.normal(0, 1, (200, 8)).astype(np.float32)
    tbl = pa.table(
        {
            "label": pa.array(rng.integers(0, 5, 200).astype(np.int64)),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    got = grouped_vector_sums(ray.data.from_arrow(tbl).repartition(6))
    con = duckdb.connect()
    con.register("e", tbl)
    exp = con.sql(
        """SELECT label, CAST(i - 1 AS BIGINT) AS dim,
                  CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5)
                                AS BIGINT)) AS BIGINT) AS sum_micros,
                  CAST(count(*) AS BIGINT) AS n
           FROM e, unnest(generate_series(1, len(embedding))) AS g(i)
           GROUP BY label, i ORDER BY label, dim"""
    ).arrow()
    assert got.equals(exp.cast(got.schema))
    assert grouped_vector_sums(ray.data.from_arrow(tbl)).equals(got)
    ragged = pa.table(
        {
            "label": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[1.0, 2.0], [1.0]], pa.list_(pa.float32())),
        }
    )
    with pytest.raises(Exception, match="ragged"):
        grouped_vector_sums(ray.data.from_arrow(ragged))


def test_pivot_on_unknown_ignore(ray_session, docs):
    doms = ["s0", "s1"]
    got = pivot_counts(_ds(docs), "lang", "source", doms, on_unknown="ignore")
    con = duckdb.connect()
    con.register("documents", docs)
    exp = con.sql(
        """SELECT lang,
                  CAST(sum(CASE WHEN source='s0' THEN 1 ELSE 0 END) AS BIGINT) AS "s0",
                  CAST(sum(CASE WHEN source='s1' THEN 1 ELSE 0 END) AS BIGINT) AS "s1"
           FROM documents GROUP BY lang ORDER BY lang"""
    ).arrow()
    assert got.equals(exp.cast(got.schema))
    with pytest.raises(ValueError, match="on_unknown"):
        pivot_counts(_ds(docs), "lang", "source", doms, on_unknown="drop")


def test_journey_strings_vs_duckdb(ray_session):
    import duckdb

    from search_engine_ray.dataops.olap import journey_strings

    rng = np.random.default_rng(21)
    n = 800
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, 60, n).astype(np.int64)),
            "ts": pa.array(rng.integers(0, 10_000, n).astype(np.int64)),
            "event_type": pa.array(
                [["view", "click", "purchase", ""][i] for i in rng.integers(0, 4, n)],
                pa.string(),
            ),
        }
    )
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.sql("""
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS journey
        FROM t GROUP BY user_id ORDER BY user_id
    """).df()
    for parts, buckets in ((1, 1), (5, 7)):
        got = (
            journey_strings(
                ray.data.from_arrow(tbl).repartition(parts), n_buckets=buckets
            )
            .to_pandas()
            .sort_values("user_id", ignore_index=True)
        )
        assert got["user_id"].tolist() == exp["user_id"].tolist()
        assert got["journey"].tolist() == exp["journey"].tolist()


def test_journey_strings_skip_null_types(ray_session):
    # review fix: NULL event types are skipped (string_agg semantics);
    # all-null keys are absent (documented divergence)
    import duckdb

    from search_engine_ray.dataops.olap import journey_strings

    tbl = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "ts": pa.array([10, 20, 30, 10, 20], pa.int64()),
            "event_type": pa.array(["view", None, "click", None, None],
                                   pa.string()),
        }
    )
    got = journey_strings(ray.data.from_arrow(tbl)).to_pandas()
    assert got["user_id"].tolist() == [1]  # all-null user 2 absent
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.sql("""SELECT string_agg(event_type, '>' ORDER BY ts, event_id)
                     FROM t WHERE user_id = 1""").fetchone()[0]
    assert got["journey"].tolist() == [exp] == ["view>click"]
