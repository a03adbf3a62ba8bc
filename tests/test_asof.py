"""Time-travel (as-of) reads over maintenance generations: every
delete/upsert/clear snapshots the pre-op visibility state, and
IndexReader(as_of=K) reconstructs exactly that view — snapshot
tombstones plus the docID watermark hiding later appends."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.config import BuildConfig, IndexOptions
from search_engine_ray.engine.build import build_index
from search_engine_ray.engine.index_reader import IndexReader
from search_engine_ray.engine.maintenance import (
    delete_docs,
    list_generations,
    read_generation,
    upsert_docs,
)

CFG = BuildConfig(block_entries=4, frags_per_shard=2,
                  options=IndexOptions(True, True, False))


def _corpus(tmp_path, texts):
    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        ),
        f"{corpus}/a-docs.parquet",
    )
    return corpus


def _live_names(reader) -> set:
    mask = reader.deleted_mask()
    n = len(reader.doc_names)
    alive = range(n) if mask is None else np.flatnonzero(~mask)
    return {str(reader.doc_names[i]) for i in alive}


def test_as_of_restores_pre_delete_view(ray_session, tmp_path):
    corpus = _corpus(tmp_path, ["alpha beta", "gamma delta", "epsilon zeta"])
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, CFG, overwrite=True,
                source_column="text", name_column="doc_id")

    delete_docs(idx, ["0"])          # gen 0 snapshot = no tombstones
    delete_docs(idx, ["2"])          # gen 1 snapshot = {0}

    assert _live_names(IndexReader(idx)) == {"1"}
    assert _live_names(IndexReader(idx, as_of=0)) == {"0", "1", "2"}
    assert _live_names(IndexReader(idx, as_of=1)) == {"1", "2"}

    gens = list_generations(idx).to_pylist()
    assert [g["gen"] for g in gens] == [0, 1]
    assert [g["op"] for g in gens] == ["delete", "delete"]
    assert [g["n_tombstones"] for g in gens] == [0, 1]
    assert all(g["n_docs"] == 3 for g in gens)

    with pytest.raises(ValueError, match="0..1"):
        read_generation(idx, 2)
    with pytest.raises(ValueError):
        IndexReader(idx, as_of=5).deleted_mask()


def test_as_of_hides_upsert_appends(ray_session, tmp_path):
    corpus = _corpus(tmp_path, ["alpha beta", "gamma delta", "epsilon zeta"])
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, CFG, overwrite=True,
                source_column="text", name_column="doc_id")

    upd = str(tmp_path / "update.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 3], pa.int64()),
                "text": pa.array(["gamma REVISED", "brand new"]),
            }
        ),
        upd,
    )
    upsert_docs(idx, corpus, upd, CFG, source_column="text", name_column="doc_id")

    live = IndexReader(idx)
    # live: one version of each name, incl. the new doc 3
    assert _live_names(live) == {"0", "1", "2", "3"}
    assert live.postings("revised") is not None

    old = IndexReader(idx, as_of=0)
    # as-of 0: the ORIGINAL three docs only — the appended versions are
    # hidden by the watermark even though the postings now contain them
    assert _live_names(old) == {"0", "1", "2"}
    mask = old.deleted_mask()
    # the old version of doc 1 (ordinal 1) is LIVE in the as-of view
    assert not mask[1]
    # every appended ordinal is hidden
    assert mask[3:].all()

    gens = list_generations(idx).to_pylist()
    assert [g["op"] for g in gens] == ["upsert"]
    assert gens[0]["n_docs"] == 3


def test_snapshot_is_pre_op_and_idempotent_reads(ray_session, tmp_path):
    corpus = _corpus(tmp_path, ["a b", "c d"])
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, CFG, overwrite=True,
                source_column="text", name_column="doc_id")
    delete_docs(idx, ["0"])
    entries, watermark = read_generation(idx, 0)
    assert entries == {} and watermark == 2
    # reading a generation never mutates anything
    assert read_generation(idx, 0) == (entries, watermark)
    assert _live_names(IndexReader(idx, as_of=0)) == {"0", "1"}
