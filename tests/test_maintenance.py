"""Tombstone deletes (engine/maintenance.py): query-time exclusion with
unchanged survivor scores, WAND fallback discipline, idempotent union,
clear, and CLI surface."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

from search_engine_ray.config import BM25Params, BuildConfig
from search_engine_ray.corpus.pages import write_pages_parquet
from search_engine_ray.engine.build import build_index
from search_engine_ray.engine.index_reader import IndexReader
from search_engine_ray.engine.maintenance import (
    clear_tombstones,
    delete_docs,
    tombstoned_names,
)
from search_engine_ray.engine.search import score_topic

BASE = "/tmp/se_ray_maint"


@pytest.fixture(scope="module")
def index_dir(ray_session):
    shutil.rmtree(BASE, ignore_errors=True)
    corpus = f"{BASE}/corpus"
    write_pages_parquet(corpus, 120, seed=21, n_files=2, row_group_size=64)
    out = f"{BASE}/index"
    build_index(corpus, out, BuildConfig(block_entries=16, frags_per_shard=2), overwrite=True)
    return out


def _kws(index_dir, n=3):
    t = pq.read_table(os.path.join(index_dir, "terms.parquet"))
    order = np.argsort(-np.asarray(t["df"]))[:n]
    return [(t["term"][int(i)].as_py(), 1) for i in order]


def test_delete_excludes_and_keeps_scores(index_dir):
    kws = _kws(index_dir)
    r0 = IndexReader(index_dir)
    assert r0.deleted_mask() is None
    base_ids, base_scores = score_topic(r0, kws, scorer="bm25", k=50, method="taat")
    assert len(base_ids) >= 10

    work = f"{BASE}/idx_del"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(index_dir, work)
    victims = [str(r0.doc_names[d]) for d in base_ids[:2]]
    assert delete_docs(work, victims) == 2
    r = IndexReader(work)
    mask = r.deleted_mask()
    assert mask is not None and mask.sum() == 2

    for scorer in ("bm25", "tfidf", "bm25adpt"):
        b_ids, b_scores = score_topic(r0, kws, scorer=scorer, k=50, method="taat")
        d_ids, d_scores = score_topic(r, kws, scorer=scorer, k=50)
        names_b = [str(r0.doc_names[i]) for i in b_ids]
        names_d = [str(r.doc_names[i]) for i in d_ids]
        # tombstoned docs gone; survivor order and scores unchanged
        assert set(names_d).isdisjoint(victims)
        exp = [(n, s) for n, s in zip(names_b, b_scores) if n not in victims][:50]
        assert list(zip(names_d, d_scores))[: len(exp)] == exp


def test_synonym_and_conjunctive_honor_tombstones(index_dir):
    """Review finding: synonym_bm25_f64 once returned deleted docs.  Both
    the synonym path and ranked-AND must keep the 'tombstoned docs never
    appear in results' invariant every other surface enforces."""
    from search_engine_ray.config import BM25Params
    from search_engine_ray.engine.scoring import conjunctive_bm25
    from search_engine_ray.pipelines import synonym_bm25_f64

    kws = _kws(index_dir)
    r0 = IndexReader(index_dir)
    groups = [([t], q) for t, q in kws]
    base_ids, _ = synonym_bm25_f64(r0, groups)
    assert len(base_ids) >= 3
    work = f"{BASE}/idx_syn"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(index_dir, work)
    victims = [str(r0.doc_names[d]) for d in base_ids[:2]]
    delete_docs(work, victims)
    r = IndexReader(work)
    s_ids, _ = synonym_bm25_f64(r, groups)
    assert not {str(r.doc_names[d]) for d in s_ids} & set(victims)
    c_ids, _ = conjunctive_bm25(r, kws, BM25Params(), k=1000)
    assert not {str(r.doc_names[d]) for d in c_ids} & set(victims)


def test_wand_exact_under_tombstones(index_dir):
    """WAND with tombstones is EXACT: dead docs dropped at window eval,
    bounds stay conservative — bit-identical to TAAT with the same mask
    at every k, for bm25 and tfidf."""
    kws = _kws(index_dir)
    work = f"{BASE}/idx_wand"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(index_dir, work)
    r0 = IndexReader(index_dir)
    base_ids, _ = score_topic(r0, kws, scorer="bm25", k=20, method="taat")
    victims = [str(r0.doc_names[d]) for d in base_ids[:3]]
    delete_docs(work, victims)
    r = IndexReader(work)
    for scorer in ("bm25", "tfidf"):
        for k in (1, 3, 20, 1000):
            for method in ("wand", "maxscore"):
                w_ids, w_scores = score_topic(r, kws, scorer=scorer, k=k, method=method)
                t_ids, t_scores = score_topic(r, kws, scorer=scorer, k=k, method="taat")
                assert w_ids.tolist() == t_ids.tolist(), (scorer, k, method)
                np.testing.assert_array_equal(w_scores, t_scores)
                assert not {str(r.doc_names[d]) for d in w_ids} & set(victims)
    # auto also excludes
    a_ids, a_scores = score_topic(r, kws, scorer="bm25", k=20, method="auto")
    t_ids, t_scores = score_topic(r, kws, scorer="bm25", k=20, method="taat")
    assert a_ids.tolist() == t_ids.tolist()
    np.testing.assert_array_equal(a_scores, t_scores)


def test_delete_union_clear_and_errors(index_dir):
    work = f"{BASE}/idx_union"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(index_dir, work)
    assert tombstoned_names(work) == []
    assert delete_docs(work, ["b", "a"]) == 2
    assert delete_docs(work, ["a", "c"]) == 3  # idempotent union
    assert tombstoned_names(work) == ["a", "b", "c"]
    # unresolvable names don't break the reader mask (none match -> None)
    assert IndexReader(work).deleted_mask() is None
    assert clear_tombstones(work) == 3
    assert tombstoned_names(work) == []
    with pytest.raises(FileNotFoundError):
        delete_docs(f"{BASE}/not_an_index", ["x"])


def test_delete_cli(index_dir):
    work = f"{BASE}/idx_cli"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(index_dir, work)
    env = dict(os.environ, PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-m", "search_engine_ray", "delete", work, "docA", "docB"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0 and '"n_tombstoned": 2' in out.stdout
    out = subprocess.run(
        [sys.executable, "-m", "search_engine_ray", "delete", work, "--clear"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0 and '"cleared": 2' in out.stdout


def test_sharded_search_respects_tombstones(index_dir, ray_session):
    from search_engine_ray.engine.sharded_search import search_topics_sharded

    kws = _kws(index_dir)
    work = f"{BASE}/idx_shard"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(index_dir, work)
    r0 = IndexReader(index_dir)
    base_ids, _ = score_topic(r0, kws, scorer="bm25", k=20, method="taat")
    victims = [str(r0.doc_names[d]) for d in base_ids[:2]]
    delete_docs(work, victims)
    r = IndexReader(work)
    topics = [(1, kws)]
    for scorer in ("bm25", "tfidf", "bm25adpt"):
        sharded = search_topics_sharded(work, topics, scorer=scorer, k=20).to_pandas()
        local_ids, local_scores = score_topic(r, kws, scorer=scorer, k=20)
        # bit-identical to whole-index TAAT under the same tombstones
        assert sharded["doc_id"].tolist() == local_ids.tolist()
        np.testing.assert_array_equal(
            sharded["score"].to_numpy(), local_scores.astype(np.float32)
        )
        assert set(str(r.doc_names[d]) for d in sharded["doc_id"]).isdisjoint(victims)
    # per-shard DAAT pruning composes with tombstones the same way
    for method in ("wand", "maxscore"):
        pruned = search_topics_sharded(work, topics, scorer="bm25", k=20, method=method).to_pandas()
        local_ids, local_scores = score_topic(r, kws, scorer="bm25", k=20)
        assert pruned["doc_id"].tolist() == local_ids.tolist(), method
        np.testing.assert_array_equal(
            pruned["score"].to_numpy(), local_scores.astype(np.float32)
        )


def test_compact_equals_fresh_build(index_dir, ray_session):
    """Compaction == fresh build over the retained corpus: identical
    stats, terms table, decoded per-term postings, and bit-identical
    rankings; WAND is valid again afterwards."""
    import pyarrow as pa

    from search_engine_ray.engine.maintenance import compact_index

    work = f"{BASE}/idx_compact_src"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(index_dir, work)
    r0 = IndexReader(index_dir)
    # delete first, last, and two mid docs (by ordinal) for edge coverage
    victims_ord = [0, 5, 57, r0.n_docs - 1]
    victims = [str(r0.doc_names[i]) for i in victims_ord]
    delete_docs(work, victims + ["not-a-doc"])

    out = f"{BASE}/idx_compacted"
    shutil.rmtree(out, ignore_errors=True)
    stats = compact_index(work, out)
    assert stats["n_docs"] == r0.n_docs - 4
    assert stats["n_compacted_out"] == 4

    # fresh build over the retained corpus (same row order)
    import pyarrow.dataset as pads

    corpus_tbl = pads.dataset(f"{BASE}/corpus").to_table()
    keep = [n not in set(victims) for n in corpus_tbl["url"].to_pylist()]
    retained = corpus_tbl.filter(pa.array(keep))
    fresh_corpus = f"{BASE}/corpus_retained"
    shutil.rmtree(fresh_corpus, ignore_errors=True)
    os.makedirs(fresh_corpus)
    pq.write_table(retained, f"{fresh_corpus}/pages.parquet", row_group_size=64)
    fresh = f"{BASE}/idx_fresh"
    build_index(
        fresh_corpus, fresh,
        BuildConfig(block_entries=16, frags_per_shard=2), overwrite=True,
    )

    rc, rf = IndexReader(out), IndexReader(fresh)
    assert rc.n_docs == rf.n_docs
    assert rc.avgdl == rf.avgdl
    assert rc.doc_names.tolist() == rf.doc_names.tolist()
    assert rc.doc_lens.tolist() == rf.doc_lens.tolist()
    tc = pq.read_table(os.path.join(out, "terms.parquet"))
    tf_ = pq.read_table(os.path.join(fresh, "terms.parquet"))
    assert tc.equals(tf_)
    # decoded postings identical per term
    for term in tc["term"].to_pylist():
        pc_, pf_ = rc.postings(term), rf.postings(term)
        ic, tc_a, dc = pc_.arrays()
        if_, tf_a, df_ = pf_.arrays()
        np.testing.assert_array_equal(ic, if_)
        np.testing.assert_array_equal(tc_a, tf_a)
        np.testing.assert_array_equal(dc, df_)
        assert pc_.df == pf_.df

    kws = _kws(index_dir)
    for scorer in ("bm25", "tfidf", "bm25adpt"):
        c_ids, c_scores = score_topic(rc, kws, scorer=scorer, k=30, method="taat")
        f_ids, f_scores = score_topic(rf, kws, scorer=scorer, k=30, method="taat")
        np.testing.assert_array_equal(c_ids, f_ids)
        np.testing.assert_array_equal(c_scores, f_scores)
    # tombstones gone; WAND valid and identical to TAAT on the compacted index
    assert rc.deleted_mask() is None
    w_ids, w_scores = score_topic(rc, kws, scorer="bm25", k=30, method="wand")
    t_ids, t_scores = score_topic(rc, kws, scorer="bm25", k=30, method="taat")
    np.testing.assert_array_equal(w_ids, t_ids)
    np.testing.assert_array_equal(w_scores, t_scores)


def test_compact_noop_without_tombstones(index_dir, ray_session):
    from search_engine_ray.engine.maintenance import compact_index

    out = f"{BASE}/idx_compact_noop"
    shutil.rmtree(out, ignore_errors=True)
    stats = compact_index(index_dir, out)
    r0, rc = IndexReader(index_dir), IndexReader(out)
    assert stats["n_compacted_out"] == 0
    assert rc.n_docs == r0.n_docs and rc.avgdl == r0.avgdl
    kws = _kws(index_dir)
    a, sa = score_topic(r0, kws, scorer="bm25", k=20, method="taat")
    c, sc = score_topic(rc, kws, scorer="bm25", k=20, method="taat")
    np.testing.assert_array_equal(a, c)
    np.testing.assert_array_equal(sa, sc)


def test_merge_indexes_equals_full_build(index_dir, ray_session):
    """merge(A, B) == fresh build over the concatenated corpus: stats,
    df, decoded per-term postings, and bit-identical scores for all
    three scorers; WAND valid on the merged index."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    from search_engine_ray.engine.maintenance import merge_indexes

    corpus_tbl = pads.dataset(f"{BASE}/corpus").to_table()
    half = corpus_tbl.num_rows // 2
    cfg = BuildConfig(block_entries=16, frags_per_shard=2)
    dirs = {}
    for name, tbl in (("a", corpus_tbl.slice(0, half)), ("b", corpus_tbl.slice(half))):
        cdir = f"{BASE}/corpus_{name}"
        shutil.rmtree(cdir, ignore_errors=True)
        os.makedirs(cdir)
        pq.write_table(tbl, f"{cdir}/pages.parquet", row_group_size=32)
        idir = f"{BASE}/index_{name}"
        build_index(cdir, idir, cfg, overwrite=True)
        dirs[name] = idir

    out = f"{BASE}/index_merged"
    shutil.rmtree(out, ignore_errors=True)
    stats = merge_indexes(dirs["a"], dirs["b"], out)

    rm_, rf = IndexReader(out), IndexReader(index_dir)  # index_dir = full build
    assert rm_.n_docs == rf.n_docs
    assert rm_.avgdl == rf.avgdl
    assert stats["sum_dl"] == rf.stats["sum_dl"]
    assert rm_.doc_names.tolist() == rf.doc_names.tolist()
    assert rm_.doc_lens.tolist() == rf.doc_lens.tolist()
    tm = pq.read_table(os.path.join(out, "terms.parquet"))
    tf_ = pq.read_table(os.path.join(index_dir, "terms.parquet"))
    assert tm.equals(tf_)
    for term in tm["term"].to_pylist():
        pm_, pf_ = rm_.postings(term), rf.postings(term)
        for x, y in zip(pm_.arrays(), pf_.arrays()):
            np.testing.assert_array_equal(x, y)
        assert pm_.df == pf_.df

    kws = _kws(index_dir)
    for scorer in ("bm25", "tfidf", "bm25adpt"):
        m_ids, m_scores = score_topic(rm_, kws, scorer=scorer, k=30, method="taat")
        f_ids, f_scores = score_topic(rf, kws, scorer=scorer, k=30, method="taat")
        np.testing.assert_array_equal(m_ids, f_ids)
        np.testing.assert_array_equal(m_scores, f_scores)
    w_ids, w_scores = score_topic(rm_, kws, scorer="bm25", k=30, method="wand")
    t_ids, t_scores = score_topic(rm_, kws, scorer="bm25", k=30, method="taat")
    np.testing.assert_array_equal(w_ids, t_ids)
    np.testing.assert_array_equal(w_scores, t_scores)


def test_merge_indexes_rejects_mismatched_options(index_dir, ray_session):
    from search_engine_ray.config import IndexOptions
    from search_engine_ray.engine.maintenance import merge_indexes

    other = f"{BASE}/index_nostem"
    build_index(
        f"{BASE}/corpus", other,
        BuildConfig(block_entries=16, frags_per_shard=2, options=IndexOptions(stemming=False)),
        overwrite=True,
    )
    with pytest.raises(ValueError, match="options"):
        merge_indexes(index_dir, other, f"{BASE}/index_bad")


def test_merge_indexes_carries_tombstones(index_dir, ray_session):
    from search_engine_ray.engine.maintenance import merge_indexes

    a = f"{BASE}/idx_ma"
    b = f"{BASE}/idx_mb"
    for d in (a, b):
        shutil.rmtree(d, ignore_errors=True)
        shutil.copytree(index_dir, d)
    r0 = IndexReader(index_dir)
    delete_docs(a, [str(r0.doc_names[0])])
    delete_docs(b, [str(r0.doc_names[1])])
    out = f"{BASE}/idx_mab"
    shutil.rmtree(out, ignore_errors=True)
    merge_indexes(a, b, out)
    assert tombstoned_names(out) == sorted(
        [str(r0.doc_names[0]), str(r0.doc_names[1])]
    )
    # both names hidden from results (both copies of each doc)
    rm_ = IndexReader(out)
    assert rm_.deleted_mask().sum() == 4


def test_fsck_healthy_and_corrupted(index_dir, ray_session):
    import glob

    import pyarrow as pa

    from search_engine_ray.engine.maintenance import fsck_index

    rep = fsck_index(index_dir)
    assert rep["violations"] == 0 and rep["df_mismatches"] == 0
    assert rep["docs_dense"] and rep["n_postings"] == rep["n_postings_stats"]

    # corrupt one block's first_doc -> metadata check must fire
    work = f"{BASE}/idx_fsck"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(index_dir, work)
    f = sorted(glob.glob(f"{work}/postings/*.parquet"))[0]
    tbl = pq.read_table(f)
    fd = tbl["first_doc"].to_pylist()
    fd[0] += 1
    tbl = tbl.set_column(
        tbl.schema.get_field_index("first_doc"), "first_doc", pa.array(fd, pa.int64())
    )
    pq.write_table(tbl, f)
    rep2 = fsck_index(work)
    assert rep2["violations"] > 0


def test_prune_terms(index_dir, ray_session):
    """Pruned terms vanish; every kept term's postings and scoring are
    bit-identical to the unpruned index; queries containing a pruned
    term silently skip it (absent-term semantics)."""
    from search_engine_ray.engine.maintenance import prune_terms

    r0 = IndexReader(index_dir)
    t = pq.read_table(os.path.join(index_dir, "terms.parquet"))
    order = np.argsort(-np.asarray(t["df"]))
    hot = [t["term"][int(i)].as_py() for i in order[:2]]
    threshold = int(t["df"][int(order[2])].as_py())  # drops exactly the top-2

    out = f"{BASE}/idx_pruned"
    shutil.rmtree(out, ignore_errors=True)
    stats = prune_terms(index_dir, out, df_threshold=threshold)
    assert stats["n_pruned_terms"] == 2
    r = IndexReader(out)
    assert r.n_docs == r0.n_docs and r.avgdl == r0.avgdl
    for term in hot:
        assert r.postings(term) is None
    # kept postings identical
    kept = [t["term"][int(i)].as_py() for i in order[2:12]]
    for term in kept:
        for x, y in zip(r.postings(term).arrays(), r0.postings(term).arrays()):
            np.testing.assert_array_equal(x, y)
    # mixed query: pruned term skipped == querying original without it
    kws_mixed = [(hot[0], 1)] + [(k, 1) for k in kept[:2]]
    p_ids, p_scores = score_topic(r, kws_mixed, scorer="bm25", k=20, method="taat")
    o_ids, o_scores = score_topic(
        r0, [(k, 1) for k in kept[:2]], scorer="bm25", k=20, method="taat"
    )
    np.testing.assert_array_equal(p_ids, o_ids)
    np.testing.assert_array_equal(p_scores, o_scores)
    # explicit terms arg unions with the threshold
    out2 = f"{BASE}/idx_pruned2"
    shutil.rmtree(out2, ignore_errors=True)
    stats2 = prune_terms(index_dir, out2, terms=[kept[0]])
    assert stats2["n_pruned_terms"] == 1
    assert IndexReader(out2).postings(kept[0]) is None


def test_tombstones_cover_all_query_surfaces(index_dir, ray_session):
    """Boolean, MLT, and custom scorers also honor tombstones: deleted
    docs never appear in boolean results, MLT drops them, and a custom
    scorer (whose registry signature has no exclude mask) fails loud."""
    from search_engine_ray.config import IndexOptions
    from search_engine_ray.engine.boolean import boolean_and, boolean_or
    from search_engine_ray.engine.mlt import more_like_this
    from search_engine_ray.engine.search import register_scorer, score_topic

    kws = _kws(index_dir)
    terms = [t for t, _ in kws]
    work = f"{BASE}/idx_surfaces"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(index_dir, work)
    r0 = IndexReader(index_dir)
    base_or = boolean_or(r0, terms)
    victims_ord = base_or[:2].tolist()
    delete_docs(work, [str(r0.doc_names[d]) for d in victims_ord])
    r = IndexReader(work)

    got_or = boolean_or(r, terms)
    assert set(got_or.tolist()) == set(base_or.tolist()) - set(victims_ord)
    got_and = boolean_and(r, terms[:2])
    assert not set(got_and.tolist()) & set(victims_ord)

    _kws_txt = " ".join(terms)
    _, mlt_ids, _ = more_like_this(r, work, _kws_txt, IndexOptions(), k=50)
    assert not set(mlt_ids.tolist()) & set(victims_ord)

    register_scorer("t_const", lambda rd, kw, p, k: (np.arange(3), np.ones(3, np.float32)))
    try:
        with pytest.raises(ValueError, match="custom scorer"):
            score_topic(r, kws, scorer="t_const", k=5)
        # fine on an un-tombstoned index
        ids, _ = score_topic(r0, kws, scorer="t_const", k=5)
        assert ids.tolist() == [0, 1, 2]
    finally:
        from search_engine_ray.engine import search as _s

        _s._CUSTOM_SCORERS.pop("t_const", None)


def test_fsck_survives_corrupt_docs_table(index_dir, ray_session):
    """An out-of-range doc_id in the docs table is REPORTED (bad_doc_rows,
    violations > 0), not an IndexError crash."""
    import glob

    import pyarrow as pa

    from search_engine_ray.engine.maintenance import fsck_index

    work = f"{BASE}/idx_fsck_docs"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(index_dir, work)
    f = sorted(glob.glob(f"{work}/docs/*.parquet"))[0]
    tbl = pq.read_table(f)
    ids = tbl["doc_id"].to_pylist()
    ids[0] = 10_000_000  # way outside [0, n_docs)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("doc_id"), "doc_id", pa.array(ids, pa.int64())
    )
    pq.write_table(tbl, f)
    rep = fsck_index(work)
    assert rep["bad_doc_rows"] == 1 and rep["violations"] >= 1


def test_lifecycle_merge_compact_fsck(index_dir, ray_session):
    """Full maintenance lifecycle: two half-indexes with tombstones ->
    union merge (tombstones carried) -> compaction (duplicate-free here,
    victims physically dropped) -> fsck clean -> scores bit-identical to
    a fresh build over the retained concatenated corpus."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    from search_engine_ray.engine.maintenance import (
        compact_index,
        fsck_index,
        merge_indexes,
    )

    corpus_tbl = pads.dataset(f"{BASE}/corpus").to_table()
    half = corpus_tbl.num_rows // 2
    cfg = BuildConfig(block_entries=16, frags_per_shard=2)
    dirs = {}
    for name, tbl in (("a", corpus_tbl.slice(0, half)), ("b", corpus_tbl.slice(half))):
        cdir = f"{BASE}/lc_corpus_{name}"
        shutil.rmtree(cdir, ignore_errors=True)
        os.makedirs(cdir)
        pq.write_table(tbl, f"{cdir}/pages.parquet", row_group_size=32)
        idir = f"{BASE}/lc_index_{name}"
        build_index(cdir, idir, cfg, overwrite=True)
        dirs[name] = idir
    # tombstone one doc in each half (by its own reader's names)
    victims = []
    for name in ("a", "b"):
        rn = IndexReader(dirs[name])
        victims.append(str(rn.doc_names[1]))
        delete_docs(dirs[name], [victims[-1]])

    merged = f"{BASE}/lc_merged"
    shutil.rmtree(merged, ignore_errors=True)
    merge_indexes(dirs["a"], dirs["b"], merged)
    assert sorted(tombstoned_names(merged)) == sorted(victims)

    compacted = f"{BASE}/lc_compacted"
    shutil.rmtree(compacted, ignore_errors=True)
    stats = compact_index(merged, compacted)
    assert stats["n_compacted_out"] == 2
    rep = fsck_index(compacted)
    assert rep["violations"] == 0

    # fresh build over retained concat corpus
    keep = [u not in set(victims) for u in corpus_tbl["url"].to_pylist()]
    retained = corpus_tbl.filter(pa.array(keep))
    fresh_corpus = f"{BASE}/lc_corpus_retained"
    shutil.rmtree(fresh_corpus, ignore_errors=True)
    os.makedirs(fresh_corpus)
    pq.write_table(retained, f"{fresh_corpus}/pages.parquet", row_group_size=32)
    fresh = f"{BASE}/lc_fresh"
    build_index(fresh_corpus, fresh, cfg, overwrite=True)

    rc, rf = IndexReader(compacted), IndexReader(fresh)
    assert rc.n_docs == rf.n_docs and rc.avgdl == rf.avgdl
    assert rc.doc_names.tolist() == rf.doc_names.tolist()
    kws = _kws(index_dir)
    for scorer in ("bm25", "tfidf", "bm25adpt"):
        c_ids, c_scores = score_topic(rc, kws, scorer=scorer, k=30, method="taat")
        f_ids, f_scores = score_topic(rf, kws, scorer=scorer, k=30, method="taat")
        np.testing.assert_array_equal(c_ids, f_ids)
        np.testing.assert_array_equal(c_scores, f_scores)


def test_upsert_docs(ray_session, tmp_path):
    """Upsert replaces old versions (tombstoned at the pre-append
    watermark) while the re-indexed new versions stay live; plain
    deletes still hide every version; compaction physically drops only
    the dead versions."""
    import pyarrow as pa

    from search_engine_ray.engine.maintenance import (
        compact_index,
        fsck_index,
        read_tombstones,
        upsert_docs,
    )

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    texts = ["alpha beta", "gamma delta", "epsilon zeta"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(texts),
            }
        ),
        f"{corpus}/a-docs.parquet",
    )
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(block_entries=4, frags_per_shard=2)
    from search_engine_ray.config import IndexOptions

    cfg = BuildConfig(
        block_entries=4, frags_per_shard=2, options=IndexOptions(stemming=False)
    )
    build_index(
        corpus, idx, cfg, overwrite=True, source_column="text", name_column="doc_id"
    )

    # upsert: doc 1 changes text; doc 3 is new
    upd = str(tmp_path / "update.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 3], pa.int64()),
                "text": pa.array(["omega chi", "alpha omega"]),
            }
        ),
        upd,
    )
    stats = upsert_docs(
        idx, corpus, upd, config=cfg, source_column="text", name_column="doc_id"
    )
    assert stats["n_replaced"] == 1 and stats["n_docs"] == 5  # 3 old + 2 appended
    assert read_tombstones(idx) == {"1": 3}  # bounded at the watermark

    r = IndexReader(idx)
    mask = r.deleted_mask()
    assert mask is not None and mask.sum() == 1
    assert r.doc_names[np.flatnonzero(mask)[0]] == "1"  # the OLD version only
    # old text's term no longer matches doc 1; new text does
    from search_engine_ray.engine.boolean import boolean_or

    gamma_docs = {str(r.doc_names[d]) for d in boolean_or(r, ["gamma"])}
    assert "1" not in gamma_docs
    omega_docs = {str(r.doc_names[d]) for d in boolean_or(r, ["omega"])}
    assert omega_docs == {"1", "3"}

    # rankings only ever see the live version
    kws = [("omega", 1), ("alpha", 1)]
    ids, _ = score_topic(r, kws, scorer="bm25", k=10)
    names = [str(r.doc_names[d]) for d in ids]
    assert names.count("1") == 1 and names.count("3") == 1

    # compact physically drops the dead version; fsck clean
    out = str(tmp_path / "compacted")
    cstats = compact_index(idx, out)
    assert cstats["n_compacted_out"] == 1 and cstats["n_docs"] == 4
    rc = IndexReader(out)
    assert rc.deleted_mask() is None
    assert sorted(rc.doc_names.tolist()) == ["0", "1", "2", "3"]
    assert fsck_index(out)["violations"] == 0
    omega_c = {str(rc.doc_names[d]) for d in boolean_or(rc, ["omega"])}
    assert omega_c == {"1", "3"}
    assert not boolean_or(rc, ["gamma"]).size or "1" not in {
        str(rc.doc_names[d]) for d in boolean_or(rc, ["gamma"])
    }


def test_double_upsert_keeps_only_newest(ray_session, tmp_path):
    """Upserting the same doc twice leaves exactly the newest version
    live (tombstone bounds collapse to the dominating watermark)."""
    import pyarrow as pa

    from search_engine_ray.config import IndexOptions
    from search_engine_ray.engine.boolean import boolean_or
    from search_engine_ray.engine.maintenance import read_tombstones, upsert_docs

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["alpha one", "beta two"])}),
        f"{corpus}/a-docs.parquet",
    )
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(block_entries=4, frags_per_shard=2,
                      options=IndexOptions(stemming=False))
    build_index(corpus, idx, cfg, overwrite=True,
                source_column="text", name_column="doc_id")
    for i, text in enumerate(["gamma three", "delta four"]):
        upd = str(tmp_path / f"u{i}.parquet")
        pq.write_table(
            pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array([text])}), upd,
        )
        upsert_docs(idx, corpus, upd, config=cfg,
                    source_column="text", name_column="doc_id")
    r = IndexReader(idx)
    assert r.n_docs == 4  # 2 base + 2 upserted versions
    assert read_tombstones(idx) == {"1": 3}  # dominating watermark
    assert r.deleted_mask().sum() == 2  # both old versions dead
    live = {str(r.doc_names[d]) for d in boolean_or(r, ["delta"])}
    assert live == {"1"}
    for dead_term in ("beta", "gamma"):
        assert "1" not in {str(r.doc_names[d]) for d in boolean_or(r, [dead_term])}


def test_upsert_after_plain_delete_revives_name(ray_session, tmp_path):
    """A plain delete leaves a None (everything-dead) tombstone bound;
    a later upsert of the same name must REPLACE that bound with its
    watermark so the re-indexed version is live (round-3 advice:
    union semantics silently kept the None bound and the new version
    stayed hidden forever)."""
    import pyarrow as pa

    from search_engine_ray.config import IndexOptions
    from search_engine_ray.engine.boolean import boolean_or
    from search_engine_ray.engine.maintenance import (
        delete_docs,
        read_tombstones,
        upsert_docs,
    )

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["alpha one", "beta two"])}),
        f"{corpus}/a-docs.parquet",
    )
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(block_entries=4, frags_per_shard=2,
                      options=IndexOptions(stemming=False))
    build_index(corpus, idx, cfg, overwrite=True,
                source_column="text", name_column="doc_id")

    delete_docs(idx, ["1"])  # plain delete: every version dead
    assert read_tombstones(idx) == {"1": None}

    upd = str(tmp_path / "u.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["gamma three"])}), upd,
    )
    upsert_docs(idx, corpus, upd, config=cfg,
                source_column="text", name_column="doc_id")

    # the watermark bound replaced the None bound
    assert read_tombstones(idx) == {"1": 2}
    r = IndexReader(idx)
    # the NEW version is live and queryable...
    live = {str(r.doc_names[d]) for d in boolean_or(r, ["gamma"])}
    assert live == {"1"}
    # ...and the old version stays dead
    assert "1" not in {str(r.doc_names[d]) for d in boolean_or(r, ["beta"])}
    ids, _ = score_topic(r, [("gamma", 1)], scorer="bm25", k=10)
    assert [str(r.doc_names[d]) for d in ids] == ["1"]


def test_compact_broadcast_is_shard_local(index_dir, ray_session, tmp_path,
                                          monkeypatch):
    """compact_index never ships an O(n_docs) remap: every ray.put made
    during compaction is bounded by the DELETED-id count (per-shard
    slices), not the corpus size (round-3 verdict #5)."""
    import ray as _ray

    from search_engine_ray.engine import maintenance as mnt

    work = f"{BASE}/idx_compact_bcast_src"
    shutil.rmtree(work, ignore_errors=True)
    shutil.copytree(index_dir, work)
    r0 = IndexReader(index_dir)
    victims = [str(r0.doc_names[i]) for i in (3, 11)]
    delete_docs(work, victims)

    put_sizes = []
    real_put = _ray.put

    def spy_put(obj, **kw):
        if isinstance(obj, np.ndarray):
            put_sizes.append(len(obj))
        return real_put(obj, **kw)

    monkeypatch.setattr(_ray, "put", spy_put)
    out = f"{BASE}/idx_compact_bcast_out"
    shutil.rmtree(out, ignore_errors=True)
    stats = mnt.compact_index(work, out)
    assert stats["n_compacted_out"] == 2
    assert put_sizes, "expected per-shard slice puts"
    # every broadcast object holds at most the deleted-id set — nothing
    # proportional to n_docs
    assert max(put_sizes) <= 2, put_sizes
    assert sum(put_sizes) == 2
    # and the result still queries correctly
    r = IndexReader(out)
    assert r.n_docs == r0.n_docs - 2


def test_federated_equals_full_build(index_dir, ray_session):
    """federated_bm25_f64 over two contiguous half-indexes == the full
    build's bm25_scores_f64: every score and every rank bit-identical
    (the query-time alternative to merge_indexes)."""
    import pyarrow.dataset as pads

    from search_engine_ray.pipelines import bm25_scores_f64, federated_bm25_f64

    corpus_tbl = pads.dataset(f"{BASE}/corpus").to_table()
    half = corpus_tbl.num_rows // 2
    cfg = BuildConfig(block_entries=16, frags_per_shard=2)
    readers = []
    for name, tbl in (("fa", corpus_tbl.slice(0, half)), ("fb", corpus_tbl.slice(half))):
        cdir = f"{BASE}/corpus_{name}"
        shutil.rmtree(cdir, ignore_errors=True)
        os.makedirs(cdir)
        pq.write_table(tbl, f"{cdir}/pages.parquet", row_group_size=32)
        idir = f"{BASE}/index_{name}"
        build_index(cdir, idir, cfg, overwrite=True)
        readers.append(IndexReader(idir))

    rf = IndexReader(index_dir)
    kws = _kws(index_dir)
    gids, scores, names = federated_bm25_f64(readers, kws)
    fids, fscores = bm25_scores_f64(rf, kws)
    np.testing.assert_array_equal(scores, fscores)
    assert [names[g] for g in gids] == [rf.doc_names[d] for d in fids]
    with pytest.raises(ValueError):
        federated_bm25_f64([], kws)


def test_champion_lists(index_dir, ray_session):
    """Champion build keeps each term's true top-m contributors; queries
    over them equal exhaustive BM25 in the exact regime and for
    single positive-idf terms with k <= m."""
    from search_engine_ray.engine.champions import (
        build_champion_lists,
        champion_topk,
    )
    from search_engine_ray.pipelines import bm25_scores_f64

    rf = IndexReader(index_dir)
    out = f"{BASE}/champs_big"
    shutil.rmtree(out, ignore_errors=True)
    stats = build_champion_lists(index_dir, out, m=100000)
    assert stats["n_terms"] > 0
    kws = _kws(index_dir)
    ids, scores = champion_topk(out, rf, kws, k=30)
    fids, fscores = bm25_scores_f64(rf, kws)
    np.testing.assert_array_equal(ids, fids[:30])
    np.testing.assert_array_equal(scores, fscores[:30])

    # truncated regime: single positive-idf term, k <= m < df
    t = pq.read_table(os.path.join(index_dir, "terms.parquet"))
    n = rf.n_docs
    pos = [
        (term, df)
        for term, df in zip(t["term"].to_pylist(), t["df"].to_pylist())
        if 6 < df < n / 2
    ]
    assert pos, "fixture corpus must have a positive-idf term with df > 6"
    term = max(pos, key=lambda x: x[1])[0]
    small = f"{BASE}/champs_small"
    shutil.rmtree(small, ignore_errors=True)
    build_champion_lists(index_dir, small, m=6)
    aids, ascores = champion_topk(small, rf, [(term, 1)], k=5)
    eids, escores = bm25_scores_f64(rf, [(term, 1)])
    np.testing.assert_array_equal(aids, eids[:5])
    np.testing.assert_array_equal(ascores, escores[:5])

    # champion rows per term bounded by m
    ct = pq.read_table(os.path.join(small, "champions.parquet"))
    import collections

    cnt = collections.Counter(ct["term"].to_pylist())
    assert max(cnt.values()) <= 6

    with pytest.raises(ValueError):
        build_champion_lists(index_dir, f"{BASE}/champs_bad", m=0)


def test_segment_bloom_gating(index_dir, ray_session):
    """Per-segment term Blooms (engine/segment_bloom.py): gated
    federation is bit-identical to ungated (no false negatives by
    construction), absent terms are answered without probing the
    segment, and a segment with no filter degrades to plain probing."""
    import pyarrow.dataset as pads

    from search_engine_ray.engine.segment_bloom import (
        BloomGatedReader,
        build_term_bloom,
        load_term_bloom,
        probe_terms,
    )
    from search_engine_ray.engine.terms_io import read_terms_table
    from search_engine_ray.pipelines import federated_bm25_f64

    corpus_tbl = pads.dataset(f"{BASE}/corpus").to_table()
    half = corpus_tbl.num_rows // 2
    cfg = BuildConfig(block_entries=16, frags_per_shard=2)
    idirs = []
    for name, tbl in (("ba", corpus_tbl.slice(0, half)), ("bb", corpus_tbl.slice(half))):
        cdir = f"{BASE}/corpus_{name}"
        shutil.rmtree(cdir, ignore_errors=True)
        os.makedirs(cdir)
        pq.write_table(tbl, f"{cdir}/pages.parquet", row_group_size=32)
        idir = f"{BASE}/index_{name}"
        build_index(cdir, idir, cfg, overwrite=True)
        build_term_bloom(idir)
        idirs.append(idir)

    # no false negatives: every indexed term probes maybe-present
    for idir in idirs:
        bloom = load_term_bloom(idir)
        terms = read_terms_table(idir, columns=["term"])["term"].to_pylist()
        assert probe_terms(bloom, terms).all()

    kws = _kws(index_dir) + [("zqzqzqnotaterm", 1)]
    plain = [IndexReader(d) for d in idirs]
    gated = [BloomGatedReader.open(d) for d in idirs]
    gids, gscores, gnames = federated_bm25_f64(gated, kws)
    pids, pscores, pnames = federated_bm25_f64(plain, kws)
    np.testing.assert_array_equal(gscores, pscores)
    np.testing.assert_array_equal(gids, pids)

    # the garbage term was (almost surely) skipped without a probe;
    # check the counter discipline on a guaranteed-negative probe
    g = gated[0]
    before = g.n_probes
    if not probe_terms(load_term_bloom(idirs[0]), ["zqzqzqnotaterm"])[0]:
        assert g.postings("zqzqzqnotaterm") is None
        assert g.n_probes == before and g.n_skipped >= 1

    # real term: probed and identical postings
    term = kws[0][0]
    tp_g = g.postings(term)
    tp_p = plain[0].postings(term)
    assert (tp_g is None) == (tp_p is None)
    if tp_g is not None:
        for a, b in zip(tp_g.arrays(), tp_p.arrays()):
            np.testing.assert_array_equal(a, b)

    # segment without a filter: open() degrades to plain probing
    os.remove(os.path.join(idirs[0], "term_bloom.parquet"))
    ungated = BloomGatedReader.open(idirs[0])
    assert ungated.postings("zqzqzqnotaterm") is None
    assert ungated.postings(term) is not None


def test_refresh_index(ray_session, tmp_path):
    """Crawl refresh: multi-capture batch -> latest per url -> unchanged
    skip -> upsert.  Only the changed + new docs enter the index; the
    no-op recrawl neither grows the index nor kills its live version."""
    import pyarrow as pa

    from search_engine_ray.config import IndexOptions
    from search_engine_ray.engine.maintenance import fsck_index, refresh_index

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    texts = ["alpha beta", "gamma delta", "epsilon zeta"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(texts),
            }
        ),
        f"{corpus}/a-docs.parquet",
    )
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(
        block_entries=4, frags_per_shard=2, options=IndexOptions(stemming=False)
    )
    build_index(
        corpus, idx, cfg, overwrite=True, source_column="text", name_column="doc_id"
    )

    # captures: doc 1 recrawled twice (stale + newest CHANGED), doc 2
    # recrawled UNCHANGED, doc 9 brand new
    caps = str(tmp_path / "captures.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 1, 2, 9], pa.int64()),
                "text": pa.array(
                    ["stale version", "omega chi", "epsilon zeta", "alpha omega"]
                ),
                "warc_ts": pa.array([100, 200, 300, 50], pa.int64()),
            }
        ),
        caps,
    )
    stats = refresh_index(
        idx, corpus, caps, config=cfg,
        source_column="text", name_column="doc_id", ts_column="warc_ts",
    )
    assert stats["n_captures"] == 4
    assert stats["n_latest"] == 3  # doc 1 collapsed to its newest capture
    assert stats["n_unchanged"] == 1  # doc 2's recrawl skipped
    assert stats["n_upserts"] == 2 and stats["n_replaced"] == 1
    assert stats["n_docs"] == 5  # 3 originals + changed doc1 + new doc9

    r = IndexReader(idx)
    mask = r.deleted_mask()
    assert mask is not None and int(mask.sum()) == 1  # only old doc 1
    assert fsck_index(idx)["violations"] == 0
    # ranking sees the new version ("omega"), not the stale capture
    from search_engine_ray.pipelines import bm25_scores_f64

    ids, _ = bm25_scores_f64(r, [("omega", 1)])
    ids = ids[~mask[ids]]
    names = {str(r.doc_names[d]) for d in ids}
    assert names == {"1", "9"}
    ids2, _ = bm25_scores_f64(r, [("stale", 1)])
    assert len(ids2[~mask[ids2]]) == 0  # the stale capture never entered
    ids3, _ = bm25_scores_f64(r, [("epsilon", 1)])
    live3 = {str(r.doc_names[d]) for d in ids3[~mask[ids3]]}
    assert live3 == {"2"}  # unchanged doc stayed live, not duplicated

    # idempotence: re-running the same captures is a full no-op
    stats2 = refresh_index(
        idx, corpus, caps, config=cfg,
        source_column="text", name_column="doc_id", ts_column="warc_ts",
    )
    assert stats2["n_upserts"] == 0 and stats2["n_docs"] == 5


def test_refresh_index_same_content_across_urls(ray_session, tmp_path):
    """Identical capture bodies across different urls must not cross-match
    in the latest-pick (review finding: content hash is not row-unique) —
    a stale capture of url A sharing bytes with url B's newest capture
    must still lose to A's newer capture."""
    import pyarrow as pa

    from search_engine_ray.config import IndexOptions
    from search_engine_ray.engine.maintenance import refresh_index

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["alpha beta", "gamma delta"]),
            }
        ),
        f"{corpus}/a-docs.parquet",
    )
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(
        block_entries=4, frags_per_shard=2, options=IndexOptions(stemming=False)
    )
    build_index(
        corpus, idx, cfg, overwrite=True, source_column="text", name_column="doc_id"
    )
    caps = str(tmp_path / "captures.parquet")
    # doc 0: stale capture 'shared body' (ts 1) then newer 'omega chi'
    # (ts 2); doc 1: newest capture IS 'shared body' (ts 9) — the same
    # bytes as doc 0's stale one
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 0, 1], pa.int64()),
                "text": pa.array(["shared body", "omega chi", "shared body"]),
                "warc_ts": pa.array([1, 2, 9], pa.int64()),
            }
        ),
        caps,
    )
    stats = refresh_index(
        idx, corpus, caps, config=cfg,
        source_column="text", name_column="doc_id", ts_column="warc_ts",
    )
    assert stats["n_latest"] == 2  # one winner per doc
    assert stats["n_upserts"] == 2 and stats["n_replaced"] == 2
    r = IndexReader(idx)
    mask = r.deleted_mask()
    from search_engine_ray.pipelines import bm25_scores_f64

    ids, _ = bm25_scores_f64(r, [("shared", 1)])
    live = {str(r.doc_names[d]) for d in ids[~mask[ids]]}
    assert live == {"1"}  # doc 0's stale 'shared body' never entered
    ids2, _ = bm25_scores_f64(r, [("omega", 1)])
    assert {str(r.doc_names[d]) for d in ids2[~mask[ids2]]} == {"0"}


def test_refresh_index_empty_captures(ray_session, tmp_path):
    import pyarrow as pa

    from search_engine_ray.config import IndexOptions
    from search_engine_ray.engine.maintenance import refresh_index

    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([0], pa.int64()), "text": pa.array(["alpha"])}
        ),
        f"{corpus}/a-docs.parquet",
    )
    idx = str(tmp_path / "idx")
    cfg = BuildConfig(
        block_entries=4, frags_per_shard=2, options=IndexOptions(stemming=False)
    )
    build_index(
        corpus, idx, cfg, overwrite=True, source_column="text", name_column="doc_id"
    )
    caps = str(tmp_path / "captures.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "warc_ts": pa.array([], pa.int64()),
            }
        ),
        caps,
    )
    stats = refresh_index(
        idx, corpus, caps, config=cfg,
        source_column="text", name_column="doc_id", ts_column="warc_ts",
    )
    assert stats["n_captures"] == 0 and stats["n_upserts"] == 0
    assert stats["n_docs"] == 1
