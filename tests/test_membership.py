"""Bloom-filter membership (dataops/membership.py): no false negatives,
DuckDB-reproduced false positives, partition invariance, frontier filter."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray

from search_engine_ray.dataops.membership import (
    BloomFilter,
    bloom_dedup_new,
    bloom_positions,
    bloom_probe,
    build_bloom,
    md5_halves,
)


def _keys(n, seed, prefix="k"):
    rng = np.random.default_rng(seed)
    return [f"{prefix}{int(v)}" for v in rng.integers(0, 10 * n, n)]


def _sql_membership(inserted, probes, n_bits, n_hashes, n_shards):
    """Independent DuckDB oracle: a probe key is a member iff EVERY one of
    its positions is set by SOME inserted key in the SAME shard."""
    con = duckdb.connect()
    con.register("ins_keys", pa.table({"k": pa.array(inserted, pa.string())}))
    con.register("probe_keys", pa.table({"k": pa.array(probes, pa.string())}))
    halves = """
        SELECT k,
               ('0x' || substr(md5(k), 1,16))::UBIGINT AS h1,
               ('0x' || substr(md5(k),17,16))::UBIGINT AS h2
        FROM {src}
    """
    pos = f"""
        SELECT h.k, h.h1 % {n_shards} AS shard,
               (h.h1 % {n_bits} + i.i * (h.h2 % {n_bits})) % {n_bits} AS pos
        FROM ({{inner}}) h, (SELECT unnest(range({n_hashes})) AS i) i
    """
    q = f"""
        WITH ins AS ({pos.format(inner=halves.format(src='ins_keys'))}),
             prb AS ({pos.format(inner=halves.format(src='probe_keys'))})
        SELECT k, bool_and(hit) AS member FROM (
            SELECT p.k, p.pos,
                   EXISTS(SELECT 1 FROM ins i
                          WHERE i.shard = p.shard AND i.pos = p.pos) AS hit
            FROM prb p)
        GROUP BY k
    """
    return dict(con.sql(q).fetchall())


def test_md5_halves_match_duckdb(ray_session):
    keys = ["", "hello", "a b", "ünïcode", "0"]
    h1, h2 = md5_halves(pa.array(keys))
    con = duckdb.connect()
    for k, a, b in zip(keys, h1, h2):
        ea, eb = con.sql(
            "SELECT ('0x' || substr(md5(?), 1,16))::UBIGINT,"
            "       ('0x' || substr(md5(?),17,16))::UBIGINT",
            params=[k, k],
        ).fetchone()
        assert int(a) == ea and int(b) == eb
    # int columns hash via their VARCHAR cast
    i1, _ = md5_halves(pa.array([42], pa.int64()))
    s1, _ = md5_halves(pa.array(["42"]))
    assert i1[0] == s1[0]


def test_bloom_no_false_negatives_and_sql_exact(ray_session):
    inserted = _keys(400, seed=7)
    probes = sorted(set(inserted) | set(_keys(400, seed=8, prefix="p")))
    n_bits, n_hashes, n_shards = 256, 3, 2  # tiny: force real collisions
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(inserted, pa.string())})
    ).repartition(5)
    bloom = build_bloom(ds, "k", n_bits=n_bits, n_hashes=n_hashes, n_shards=n_shards)
    got = (
        bloom_probe(
            ray.data.from_arrow(pa.table({"k": pa.array(probes, pa.string())})),
            "k",
            bloom,
        )
        .to_pandas()
        .set_index("k")["maybe_member"]
    )
    # no false negatives
    assert got.loc[sorted(set(inserted))].all()
    # bit-exact vs the independent SQL membership model, fp included
    exp = _sql_membership(inserted, probes, n_bits, n_hashes, n_shards)
    assert {k: bool(v) for k, v in got.items()} == exp
    # the tiny filter must actually produce false positives (non-vacuous)
    fresh = sorted(set(probes) - set(inserted))
    assert got.loc[fresh].sum() > 0
    assert not got.loc[fresh].all()


def test_bloom_partition_and_roundtrip_invariance(ray_session):
    inserted = _keys(300, seed=11)
    tbl = pa.table({"k": pa.array(inserted, pa.string())})
    blooms = [
        build_bloom(
            ray.data.from_arrow(tbl).repartition(p), "k", n_bits=512, n_hashes=4,
            n_shards=3,
        )
        for p in (1, 7)
    ]
    for a, b in zip(blooms[0].bitmaps, blooms[1].bitmaps):
        assert (a == b).all()
    rt = BloomFilter.from_table(blooms[0].to_table())
    assert rt.n_bits == 512 and rt.n_hashes == 4
    for a, b in zip(rt.bitmaps, blooms[0].bitmaps):
        assert (a == b).all()


def test_bloom_dedup_new_keeps_only_unseen(ray_session):
    seen = [f"s{i}" for i in range(50)]
    new = [f"n{i}" for i in range(50)]
    bloom = build_bloom(
        ray.data.from_arrow(pa.table({"k": pa.array(seen, pa.string())})),
        "k",
        n_bits=1 << 16,  # big enough that fp ~ 0 here
        n_hashes=4,
        n_shards=1,
    )
    out = bloom_dedup_new(
        ray.data.from_arrow(pa.table({"k": pa.array(seen + new, pa.string())})),
        "k",
        bloom,
    ).to_pandas()
    assert set(out["k"]) == set(new)
    assert list(out.columns) == ["k"]


def test_bloom_validation(ray_session):
    ds = ray.data.from_arrow(pa.table({"k": pa.array(["a"], pa.string())}))
    with pytest.raises(ValueError, match="multiple of 8"):
        build_bloom(ds, "k", n_bits=12)
    with pytest.raises(ValueError, match=">= 1"):
        build_bloom(ds, "k", n_bits=64, n_hashes=0)
    with pytest.raises(ValueError, match="2\\^32"):
        build_bloom(ds, "k", n_bits=1 << 33)
    # positions stay < n_bits and are KM-linear
    h1 = np.array([2**63 + 5], dtype=np.uint64)
    h2 = np.array([2**62 + 9], dtype=np.uint64)
    p = bloom_positions(h1, h2, 4, 1000)
    assert (p < 1000).all()
    a, b = int(h1[0]) % 1000, int(h2[0]) % 1000  # exact int, no uint64/int float promotion
    assert [int(x) for x in p[0]] == [(a + i * b) % 1000 for i in range(4)]
