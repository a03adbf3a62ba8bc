"""Exact distributed heavy hitters (dataops/sketch.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

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


def test_hll_registers_match_duckdb_and_partition_invariant(ray_session):
    import duckdb

    from search_engine_ray.dataops.sketch import hll_estimate, hll_registers

    rng = np.random.default_rng(17)
    keys = [f"u{int(v)}" for v in rng.integers(0, 5000, 20000)]
    tbl = pa.table({"k": pa.array(keys, pa.string())})
    p = 6
    got = hll_registers(ray.data.from_arrow(tbl).repartition(7), "k", p=p)
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.sql(f"""
        WITH h AS (SELECT ('0x' || substr(md5(k),1,16))::UBIGINT AS h1 FROM t),
        r AS (SELECT CAST(h1 >> {64 - p} AS BIGINT) AS reg,
                     h1 & ((1::UBIGINT << {64 - p}) - 1) AS w FROM h)
        SELECT reg, MAX(CASE WHEN w = 0 THEN {64 - p + 1}
                        ELSE {64 - p} - length(bin(w)) + 1 END) AS rho
        FROM r GROUP BY reg ORDER BY reg
    """).arrow()
    assert got.equals(exp.cast(got.schema))
    # partition invariance
    got1 = hll_registers(ray.data.from_arrow(tbl).repartition(1), "k", p=p)
    assert got.equals(got1)
    # estimate within 3 standard errors of the true distinct count
    true = len(set(keys))
    est = hll_estimate(got, p=p)
    assert abs(est - true) / true < 3 * 1.04 / np.sqrt(1 << p)


def test_hll_edges(ray_session):
    import pytest

    from search_engine_ray.dataops.sketch import (
        _hll_reg_rho,
        hll_estimate,
        hll_registers,
    )

    # rho of w=0 is q+1; rho of the highest suffix bit is 1
    p, q = 6, 58
    h_zero = np.array([0b111111 << q], dtype=np.uint64)  # suffix all zero
    reg, rho = _hll_reg_rho(h_zero, p)
    assert int(reg[0]) == 63 and int(rho[0]) == q + 1
    h_top = np.array([(1 << (q - 1))], dtype=np.uint64)  # reg 0, suffix MSB set
    reg, rho = _hll_reg_rho(h_top, p)
    assert int(reg[0]) == 0 and int(rho[0]) == 1
    with pytest.raises(ValueError, match=r"\[4, 16\]"):
        hll_registers(ray.data.from_arrow(pa.table({"k": pa.array(["a"])})), "k", p=2)
    # small-range correction: tiny true cardinality -> near-exact estimate
    small = ray.data.from_arrow(pa.table({"k": pa.array([f"x{i}" for i in range(8)])}))
    est = hll_estimate(hll_registers(small, "k", p=6), p=6)
    assert abs(est - 8) < 2


def test_count_min_matches_duckdb_and_bounds(ray_session):
    import duckdb

    from search_engine_ray.dataops.sketch import cm_estimate, count_min_sketch

    texts = TEXTS + ["b b b q q", "a q z"]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    width, depth = 16, 3  # tiny: force real collisions
    got = count_min_sketch(
        ray.data.from_arrow(tbl).repartition(4), width=width, depth=depth
    )
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.sql(f"""
        WITH toks AS (
          SELECT t FROM t,
            UNNEST(list_filter(regexp_split_to_array(text,
                   '[\\t\\n\\x0B\\x0C\\r ]+'), x -> x <> '')) AS u(t)
        ),
        h AS (
          SELECT ('0x' || substr(md5(t), 1,16))::UBIGINT % {width} AS a,
                 ('0x' || substr(md5(t),17,16))::UBIGINT % {width} AS b
          FROM toks
        )
        SELECT CAST(i.i AS BIGINT) AS row,
               CAST((a + i.i * b) % {width} AS BIGINT) AS bucket,
               count(*) AS count
        FROM h, (SELECT unnest(range({depth})) AS i) i
        GROUP BY 1, 2 ORDER BY 1, 2
    """).arrow()
    assert got.equals(exp.cast(got.schema))
    # partition invariance
    got1 = count_min_sketch(ray.data.from_arrow(tbl), width=width, depth=depth)
    assert got.equals(got1)
    # estimates: integer upper bounds on true counts, exact when no collision
    all_toks = [w for t in texts for w in t.split()]
    import collections

    true = collections.Counter(all_toks)
    est = cm_estimate(got, sorted(true), width=width, depth=depth)
    est_map = dict(zip(est["term"].to_pylist(), est["est"].to_pylist()))
    assert all(est_map[t] >= c for t, c in true.items())
    # a generous width removes collisions -> exact counts
    wide = count_min_sketch(ray.data.from_arrow(tbl), width=4096, depth=4)
    est2 = cm_estimate(wide, sorted(true), width=4096, depth=4)
    assert dict(zip(est2["term"].to_pylist(), est2["est"].to_pylist())) == dict(true)
    import pytest as _pytest

    with _pytest.raises(ValueError, match=">= 1"):
        count_min_sketch(ray.data.from_arrow(tbl), width=0)


def test_grouped_heavy_hitters_vs_duckdb(ray_session):
    import duckdb

    from search_engine_ray.dataops.sketch import grouped_heavy_hitters

    rng = np.random.default_rng(23)
    langs = ["en", "de", ""]
    texts, lang_col = [], []
    for i in range(120):
        lg = langs[int(rng.integers(0, 3))]
        # per-lang skew: different dominant term per group
        head = {"en": "alpha", "de": "beta", "": "gamma"}[lg]
        toks = [head] * int(rng.integers(2, 8)) + [
            f"w{int(v)}" for v in rng.integers(0, 30, rng.integers(3, 12))
        ]
        rng.shuffle(toks)
        texts.append(" ".join(toks))
        lang_col.append(lg)
    tbl = pa.table(
        {"lang": pa.array(lang_col, pa.string()), "text": pa.array(texts, pa.string())}
    )
    k = 6
    got = grouped_heavy_hitters(
        ray.data.from_arrow(tbl).repartition(5), "lang", k=k
    )
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.sql(f"""
        WITH toks AS (
          SELECT lang, tk FROM t,
            UNNEST(list_filter(regexp_split_to_array(text,
                   '[\\t\\n\\x0B\\x0C\\r ]+'), x -> x <> '')) AS u(tk)
        ),
        tot AS (SELECT lang, count(*) AS n FROM toks GROUP BY lang),
        cnt AS (SELECT lang, tk AS term, count(*) AS count
                FROM toks GROUP BY lang, tk)
        SELECT c.lang AS "group", c.term, c.count
        FROM cnt c JOIN tot USING (lang)
        WHERE c.count * {k} >= tot.n
        ORDER BY c.lang, c.term
    """).arrow()
    assert got.equals(exp.cast(got.schema))
    assert got.num_rows >= 3  # each group's dominant term present
    # partition invariance
    got1 = grouped_heavy_hitters(ray.data.from_arrow(tbl), "lang", k=k)
    assert got.equals(got1)
    # NUL group fails loud
    bad = pa.table({"lang": pa.array(["a\x00b"]), "text": pa.array(["x"])})
    import pytest as _pytest

    with _pytest.raises(Exception, match="NUL"):
        grouped_heavy_hitters(ray.data.from_arrow(bad), "lang", k=2)
    with _pytest.raises(ValueError, match=">= 1"):
        grouped_heavy_hitters(ray.data.from_arrow(tbl), "lang", k=0)


def test_hist_quantiles_accuracy_and_invariance(ray_session):
    from search_engine_ray.dataops.sketch import hist_quantiles

    rng = np.random.default_rng(11)
    vals = np.concatenate([rng.exponential(40.0, 5000), rng.normal(200.0, 5.0, 500)])
    tbl = pa.table({"value": pa.array(vals, pa.float64())})
    ds = ray.data.from_arrow(tbl)
    out = hist_quantiles(ds, "value", q_pcts=(10, 50, 90, 99), bins=4096)
    mn, mx = float(vals.min()), float(vals.max())
    width = (mx - mn) / 4096
    n = len(vals)
    svals = np.sort(vals)
    for q, b, rank, cum in zip(
        out["q_pct"].to_pylist(), out["bucket"].to_pylist(),
        out["rank"].to_pylist(), out["cum_count"].to_pylist(),
    ):
        assert rank == (q * n + 99) // 100
        exact = svals[rank - 1]  # rank-th smallest
        est = mn + b * (mx - mn) / 4096
        # lower bucket edge: within one bucket width of the exact quantile
        assert est <= exact + 1e-9
        assert exact - est <= width + 1e-9, (q, est, exact)
        assert cum >= rank
    # partition invariance: bucket-count sums commute
    out2 = hist_quantiles(
        ray.data.from_arrow(tbl).repartition(13), "value", q_pcts=(10, 50, 90, 99), bins=4096
    )
    assert out.equals(out2)


def test_hist_quantiles_edges(ray_session):
    from search_engine_ray.dataops.sketch import hist_quantiles

    # constant column: everything in bucket 0, est == the constant
    ds = ray.data.from_arrow(pa.table({"v": pa.array([7.5] * 40, pa.float64())}))
    out = hist_quantiles(ds, "v", q_pcts=(50, 100), bins=64)
    assert out["bucket"].to_pylist() == [0, 0]
    assert out["est"].to_pylist() == [7.5, 7.5]
    # nulls excluded on both passes; ranks computed over non-null count
    ds2 = ray.data.from_arrow(
        pa.table({"v": pa.array([None, 1.0, None, 2.0, 3.0, 4.0], pa.float64())})
    )
    out2 = hist_quantiles(ds2, "v", q_pcts=(100,), bins=8)
    assert out2["rank"].to_pylist() == [4]
    # max value lands in the LAST bucket (clamp), so the 100% row exists
    assert out2["bucket"].to_pylist() == [7]
    # all-null / empty column fails loud
    ds3 = ray.data.from_arrow(pa.table({"v": pa.array([None, None], pa.float64())}))
    with pytest.raises(ValueError, match="non-null"):
        hist_quantiles(ds3, "v")
    with pytest.raises(ValueError, match="bins"):
        hist_quantiles(ds2, "v", bins=0)
    with pytest.raises(ValueError, match="q_pcts"):
        hist_quantiles(ds2, "v", q_pcts=(0,))


def test_grouped_hll_matches_duckdb_and_estimates(ray_session):
    import duckdb
    import pytest

    from search_engine_ray.dataops.sketch import (
        grouped_hll_estimates,
        grouped_hll_registers,
    )

    rng = np.random.default_rng(23)
    n = 20000
    grps = rng.choice(["a", "b", "c"], size=n, p=[0.6, 0.3, 0.1])
    # distinct pools of different sizes per group
    pool = {"a": 4000, "b": 700, "c": 40}
    keys = [f"{g}-u{int(rng.integers(0, pool[g]))}" for g in grps]
    tbl = pa.table(
        {"g": pa.array(grps.tolist(), pa.string()), "k": pa.array(keys, pa.string())}
    )
    p = 6
    got = grouped_hll_registers(
        ray.data.from_arrow(tbl).repartition(9), "k", "g", p=p
    )
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.sql(f"""
        WITH h AS (SELECT g, ('0x' || substr(md5(k),1,16))::UBIGINT AS h1 FROM t),
        r AS (SELECT g, CAST(h1 >> {64 - p} AS BIGINT) AS reg,
                     h1 & ((1::UBIGINT << {64 - p}) - 1) AS w FROM h)
        SELECT g, reg, MAX(CASE WHEN w = 0 THEN {64 - p + 1}
                           ELSE {64 - p} - length(bin(w)) + 1 END) AS rho
        FROM r GROUP BY g, reg ORDER BY g, reg
    """).arrow()
    assert got.equals(exp.cast(got.schema))
    # partition invariance
    got1 = grouped_hll_registers(ray.data.from_arrow(tbl), "k", "g", p=p)
    assert got.equals(got1)
    # per-group estimates within 3 standard errors
    ests = grouped_hll_estimates(got, "g", p=p)
    truth = {g: len({k for gg, k in zip(grps, keys) if gg == g}) for g in "abc"}
    for g in "abc":
        assert abs(ests[g] - truth[g]) / truth[g] < 3 * 1.04 / np.sqrt(1 << p), g
    # null group keys fail loud
    bad = pa.table(
        {"g": pa.array(["a", None]), "k": pa.array(["x", "y"])}
    )
    with pytest.raises(Exception):
        grouped_hll_registers(ray.data.from_arrow(bad), "k", "g", p=p)
    with pytest.raises(ValueError):
        grouped_hll_registers(ray.data.from_arrow(tbl), "k", "g", p=3)


def test_grouped_hll_int_group_and_empty(ray_session):
    from search_engine_ray.dataops.sketch import grouped_hll_registers

    tbl = pa.table(
        {
            "g": pa.array([1, 1, 2], pa.int64()),
            "k": pa.array(["x", "y", "x"], pa.string()),
        }
    )
    out = grouped_hll_registers(ray.data.from_arrow(tbl), "k", "g")
    assert out.num_rows >= 2
    assert out["g"].type == pa.int64()
    empty = pa.table({"g": pa.array([], pa.string()), "k": pa.array([], pa.string())})
    out2 = grouped_hll_registers(ray.data.from_arrow(empty), "k", "g")
    assert out2.num_rows == 0
