"""docID reassignment (engine/reorder, Silvestri ECIR'07): distributed
string-sort sink order, rank-identity of BM25 by doc name across the
reassignment, and the compression mechanism itself (clustered docIDs ->
smaller delta gaps -> fewer vbyte bytes)."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.config import BuildConfig, IndexOptions
from search_engine_ray.engine.build import build_index
from search_engine_ray.engine.codec import vbyte_encode
from search_engine_ray.engine.index_reader import IndexReader
from search_engine_ray.engine.reorder import (
    dir_bytes,
    reorder_corpus,
    reorder_index,
)

OPTS = IndexOptions(case_folding=True, remove_stopwords=True, stemming=False)


def _write_corpus(path: str, texts: list[str]) -> str:
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        ),
        path,
    )
    return path


def test_reorder_corpus_global_order(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(3, 9)))
        for _ in range(120)
    ]
    src = _write_corpus(str(tmp_path / "c.parquet"), texts)
    out = str(tmp_path / "sorted")
    man = reorder_corpus(src, out, by="text", n_partitions=4, tiebreak="doc_id")
    assert int(pa.Table.to_pandas(man)["n_rows"].sum()) == len(texts)

    got = []
    for p in sorted(glob.glob(out + "/part-*.parquet")):
        t = pq.read_table(p)
        got += list(zip(t["text"].to_pylist(), t["doc_id"].to_pylist()))
    want = sorted(zip(texts, range(len(texts))))
    assert got == want  # name-ordered parts ARE the global ORDER BY


def test_reorder_rank_identity_by_name(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    vocab = ["spark", "hash", "join", "scan", "merge", "sort", "table", "row"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 20)))
        for _ in range(150)
    ]
    src = _write_corpus(str(tmp_path / "c.parquet"), texts)
    cfg = BuildConfig(options=OPTS)
    nat = str(tmp_path / "nat")
    reo = str(tmp_path / "reo")
    build_index(src, nat, cfg, source_column="text", name_column="doc_id")
    stats = reorder_index(
        src, reo, cfg, by="text", source_column="text", name_column="doc_id"
    )
    assert stats["reordered_by"] == "text"
    assert stats["postings_bytes"] == dir_bytes(os.path.join(reo, "postings"))

    from search_engine_ray.pipelines import bm25_scores_f64

    r1, r2 = IndexReader(nat, preload=True), IndexReader(reo, preload=True)
    # the permutation must be nontrivial or the test proves nothing
    assert [str(n) for n in r1.doc_names] != [str(n) for n in r2.doc_names]
    q = [("spark", 1), ("hash", 1), ("join", 1)]
    i1, s1 = bm25_scores_f64(r1, q)
    i2, s2 = bm25_scores_f64(r2, q)
    m1 = sorted(zip((str(r1.doc_names[d]) for d in i1), np.round(s1, 9).tolist()))
    m2 = sorted(zip((str(r2.doc_names[d]) for d in i2), np.round(s2, 9).tolist()))
    assert m1 == m2


def test_reorder_shrinks_clustered_term_postings(ray_session, tmp_path):
    # 3000 docs of background vocab; every 150th doc is a "cluster" doc
    # that also carries term 'zzclust'.  Natural order: gaps of 150
    # (2 vbyte bytes each); text-reordered: cluster docs sort adjacent
    # ('zzclust...' shares a prefix), gaps of 1 (1 byte) — the exact
    # mechanism URL clustering exploits on real web corpora.
    rng = np.random.default_rng(7)
    bg = ["aqua", "blue", "cyan", "drab", "ecru", "fawn", "gold", "heat"]
    texts = []
    for i in range(3000):
        base = " ".join(rng.choice(bg, size=6))
        if i % 150 == 0:
            texts.append("zzclust " + base)
        else:
            texts.append(base)
    src = _write_corpus(str(tmp_path / "c.parquet"), texts)
    cfg = BuildConfig(options=OPTS)
    nat = str(tmp_path / "nat")
    reo = str(tmp_path / "reo")
    build_index(src, nat, cfg, source_column="text", name_column="doc_id")
    reorder_index(
        src, reo, cfg, by="text", source_column="text", name_column="doc_id"
    )

    def encoded_gap_bytes(index_dir: str) -> int:
        r = IndexReader(index_dir, preload=True)
        p = r.postings("zzclust")
        ids, _, _ = p.arrays()
        ids = np.sort(np.asarray(ids, dtype=np.int64))
        gaps = np.diff(np.concatenate([[ids[0]], ids]))
        gaps[0] = ids[0]
        return len(vbyte_encode(gaps.astype(np.uint64)))

    nat_bytes = encoded_gap_bytes(nat)
    reo_bytes = encoded_gap_bytes(reo)
    assert reo_bytes < nat_bytes, (nat_bytes, reo_bytes)


def test_cli_reorder(ray_session, capsys, tmp_path):
    import json

    from search_engine_ray.cli import main

    rng = np.random.default_rng(23)
    vocab = ["north", "south", "east", "west"]
    texts = [" ".join(rng.choice(vocab, size=5)) for _ in range(80)]
    src = _write_corpus(str(tmp_path / "c.parquet"), texts)
    out = str(tmp_path / "idx")
    rc = main(
        [
            "reorder", src, out, "IndexOptions(CaseFolding)",
            "--by", "text", "--source-column", "text",
            "--name-column", "doc_id", "--num-cpus", "4",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_docs"] == 80 and stats["reordered_by"] == "text"
    assert stats["postings_bytes"] > 0
    from search_engine_ray.engine.maintenance import fsck_index

    assert fsck_index(out)["violations"] == 0
