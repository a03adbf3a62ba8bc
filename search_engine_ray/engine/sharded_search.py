"""Doc-range-sharded query execution — the 10^12-document path.

A single QueryScorer actor preloading the whole index (engine/search.py)
mirrors the reference's in-RAM ReadableIndex and is right for indexes that
fit one node.  At web scale neither the postings nor a dense per-doc score
array fit anywhere, so scoring shards by DOC RANGE, which the index layout
already provides: the merge keys postings by ``(term-bucket, shard)`` where
``shard = frag_id // frags_per_shard`` owns a contiguous docID range and a
document's postings all live in its own shard.  Consequences:

- each shard scorer computes COMPLETE scores for its documents (no
  cross-shard combination of partial scores is ever needed);
- per-term float32 accumulation order within a document is unchanged, so
  sharded scores are bit-identical to whole-index TAAT (tested);
- global df/idf and avgdl come from the tiny terms/stats tables, loaded by
  every shard actor (broadcast-small side);
- the global answer is a per-topic top-k merge over per-shard top-k rows —
  k rows per (topic, shard), a reduction, not a shuffle of scores.

Dataflow: shard descriptors -> map_batches(ShardScorer actor, one per
shard) emitting local top-k rows -> groupby(topic) -> top-k merge with
ties broken by ascending docID.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..config import BM25Params
from .index_reader import Block, TermPostings, _blocks_from_table


class _ShardIndexView:
    """IndexReader-shaped view over one shard's postings with GLOBAL stats.

    Dense score arrays are allocated over the shard's doc range only; doc
    ids are offset back to global ids on output.
    """

    def __init__(self, index_dir: str, shard: int, terms: list[str] | None = None):
        """``terms``: prune BOTH the dictionary and the postings read to the
        query's term set (predicate pushdown) — shard-actor RSS then stays
        independent of dictionary/corpus size (round-1 finding #6: loading
        the full df map per shard actor does not survive a 10^12-doc
        dictionary)."""
        with open(os.path.join(index_dir, "stats.json")) as fh:
            self.stats = json.load(fh)
        self.avgdl = self.stats["avgdl"]
        from .terms_io import read_terms_table, terms_dataset

        if terms is None:
            terms_tbl = read_terms_table(index_dir)
        else:
            terms_tbl = terms_dataset(index_dir).to_table(
                filter=pads.field("term").isin(list(terms))
            )
        self._df = dict(zip(terms_tbl["term"].to_pylist(), terms_tbl["df"].to_pylist()))

        ds = pads.dataset(os.path.join(index_dir, "postings"))
        flt = pads.field("shard") == shard
        if terms is not None:
            flt = flt & pads.field("term").isin(list(terms))
        tbl = ds.to_table(filter=flt)
        self._blocks = _blocks_from_table(tbl, self.stats.get("codec", "vbyte"))
        if tbl.num_rows:
            self.doc_lo = int(pa.compute.min(tbl["first_doc"]).as_py())
            self.doc_hi = int(pa.compute.max(tbl["last_doc"]).as_py()) + 1
        else:
            self.doc_lo, self.doc_hi = 0, 0

        # tombstones (engine/maintenance.py): resolved PER SHARD — the
        # docs read is filtered to this shard's doc range AND the
        # tombstoned name set, so no actor ever holds a global name map
        # and the read is tombstone-sized, not shard-sized.
        self.deleted_local: np.ndarray | None = None
        tomb_path = os.path.join(index_dir, "tombstones.parquet")
        if os.path.exists(tomb_path) and self.doc_hi > self.doc_lo:
            from .maintenance import read_tombstones

            entries = read_tombstones(tomb_path)
            if entries:
                hit = pads.dataset(os.path.join(index_dir, "docs")).to_table(
                    columns=["doc_id", "name"],
                    filter=(
                        (pads.field("doc_id") >= self.doc_lo)
                        & (pads.field("doc_id") < self.doc_hi)
                        & pads.field("name").isin(list(entries))
                    ),
                )
                if hit.num_rows:
                    ids_ = np.asarray(hit["doc_id"], dtype=np.int64)
                    dead = [
                        d
                        for d, n in zip(ids_, hit["name"].to_pylist())
                        if entries.get(n) is None or d < entries[n]
                    ]
                    if dead:
                        self.deleted_local = (
                            np.asarray(dead, dtype=np.int64) - self.doc_lo
                        )

    # TAAT scorers index a dense array by doc id: present the shard's doc
    # range as [0, width) and translate in postings()/output.
    @property
    def n_docs(self) -> int:  # global N for idf (ReadableIndex semantics)
        return self.stats["n_docs"]

    def postings(self, term: str) -> TermPostings | None:
        df = self._df.get(term)
        blocks = self._blocks.get(term)
        if df is None or not blocks:
            return None
        shifted = [
            Block(
                n=b.n,
                first_doc=b.first_doc - self.doc_lo,
                last_doc=b.last_doc - self.doc_lo,
                docs_enc=b.docs_enc,
                tfs_enc=b.tfs_enc,
                dls_enc=b.dls_enc,
                ub_tfn=b.ub_tfn,
                lb_tfn=b.lb_tfn,
                ub_logtf=b.ub_logtf,
                codec=b.codec,
                _decoded=None,
            )
            for b in blocks
        ]
        for s, b in zip(shifted, blocks):
            ids, tfs, dls = b.decode()
            s._decoded = (ids - self.doc_lo, tfs, dls)
        return TermPostings(term=term, df=df, blocks=shifted)


def _shard_cds(view: _ShardIndexView, term: str, b: float):
    tp = view.postings(term)
    if tp is None:
        return None
    ids, tfs, dls = tp.arrays()
    cds = (tfs / (1 - b + b * dls / view.avgdl)).astype(np.float32)
    return ids, cds


class AdptHistogram:
    """Phase-1 stage of sharded BM25-ADPT: per-shard cd-count histograms per
    query term — 100 ints per (shard, term), merged by addition on the
    driver (the broadcast-small reduction that replaces touching the global
    tf distribution anywhere)."""

    def __init__(self, index_dir: str, terms: list[str], b: float):
        self.index_dir = index_dir
        self.terms = terms
        self.b = b
        self._views: dict[int, _ShardIndexView] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .scoring import adpt_cd_counts

        rows = {"term": [], "counts": []}
        for shard in batch["shard"].to_pylist():
            view = self._views.setdefault(
                shard, _ShardIndexView(self.index_dir, shard, terms=self.terms)
            )
            for term in self.terms:
                got = _shard_cds(view, term, self.b)
                if got is None:
                    continue
                rows["term"].append(term)
                rows["counts"].append(adpt_cd_counts(got[1]).tolist())
        return pa.table(
            {
                "term": pa.array(rows["term"], pa.string()),
                "counts": pa.array(rows["counts"], pa.list_(pa.int64())),
            }
        )


def _shard_scores(view: _ShardIndexView, keywords, scorer: str, params: BM25Params, k: int,
                  adpt_params: dict | None = None):
    """Score one shard; returns GLOBAL doc ids + scores (top-k local)."""
    import math

    width = view.doc_hi - view.doc_lo
    if width <= 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    scores = np.zeros(width, dtype=np.float32)
    touched = np.zeros(width, dtype=bool)
    n_global = view.n_docs
    for term, qtf in keywords:
        tp = view.postings(term)
        if tp is None:
            continue
        ids, tfs, dls = tp.arrays()
        if scorer == "bm25":
            idf = math.log((n_global - tp.df + 0.5) / (tp.df + 0.5))
            qterm = ((params.k3 + 1) * qtf) / (params.k3 + qtf)
            doc_term = 1 - params.b + params.b * (dls / view.avgdl)
            contrib = (idf * (tfs * (params.k1 + 1)) / (tfs + params.k1 * doc_term) * qterm).astype(np.float32)
        elif scorer == "tfidf":
            idf = math.log(n_global // tp.df)
            contrib = (np.log1p(tfs) * idf).astype(np.float32)
        elif scorer == "bm25adpt":
            from .scoring import adpt_contrib

            k1, ig1 = adpt_params[term]  # broadcast phase-1 result
            cds = (tfs / (1 - params.b + params.b * dls / view.avgdl)).astype(np.float32)
            contrib = adpt_contrib(cds, qtf, k1, ig1)
        else:
            raise ValueError(f"unknown sharded scorer {scorer!r}")
        scores[ids] = scores[ids] + contrib
        touched[ids] = True
    if view.deleted_local is not None:
        touched[view.deleted_local] = False
    cand = np.flatnonzero(touched)
    if len(cand) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    s = scores[cand]
    order = np.lexsort((cand, -s.astype(np.float64)))[:k]
    return cand[order] + view.doc_lo, s[order]


def _shard_scores_daat(view: _ShardIndexView, keywords, params: BM25Params, k: int,
                       method: str, kind: str):
    """Per-shard dynamic pruning: WAND or MaxScore over the shard view's
    block-skipping cursors (block-max metadata travels with the shard).
    The shard-local top-k contains every global-top-k doc of this shard —
    per-shard pruning composes exactly with the global merge (tested
    bit-identical to the sharded TAAT path).  Bounds are never stale here:
    the scorer params come from the index's own stats.json."""
    from .scoring import maxscore_topk, wand_topk

    width = view.doc_hi - view.doc_lo
    if width <= 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    exclude = None
    if view.deleted_local is not None:
        exclude = np.zeros(width, dtype=bool)
        exclude[view.deleted_local] = True
    fn = wand_topk if method == "wand" else maxscore_topk
    ids, scores = fn(view, keywords, params, k, kind=kind, exclude=exclude)
    return ids + view.doc_lo, scores


class ShardScorer:
    """Actor stage: one shard's postings loaded once per actor; the (small)
    topic set is broadcast via constructor kwargs, shard ids stream in."""

    def __init__(self, index_dir: str, topics, scorer: str = "bm25", k: int = 1000,
                 adpt_params: dict | None = None, method: str = "taat"):
        if method not in ("taat", "wand", "maxscore"):
            raise ValueError(f"unknown sharded method {method!r}")
        if method != "taat" and scorer not in ("bm25", "tfidf"):
            raise ValueError(
                f"sharded method={method!r} supports bm25/tfidf only; "
                f"{scorer!r} needs the exhaustive path (method='taat')"
            )
        self.index_dir = index_dir
        self.topics = topics
        self.scorer = scorer
        self.k = k
        self.adpt_params = adpt_params
        self.method = method
        # pruned dictionary/postings reads: only the topics' terms are needed
        self.term_set = sorted({t for _, kws in topics for t, _ in kws})
        self._views: dict[int, _ShardIndexView] = {}
        with open(os.path.join(index_dir, "stats.json")) as fh:
            stats = json.load(fh)
        self.params = BM25Params(**{key: stats["bm25"][key] for key in ("k1", "k3", "b")})

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"topic": [], "doc_id": [], "score": []}
        for shard in batch["shard"].to_pylist():
            view = self._views.get(shard)
            if view is None:
                view = _ShardIndexView(self.index_dir, shard, terms=self.term_set)
                self._views[shard] = view
            for topic, keywords in self.topics:
                if self.method != "taat":
                    ids, scores = _shard_scores_daat(
                        view, keywords, self.params, self.k, self.method, self.scorer
                    )
                else:
                    ids, scores = _shard_scores(
                        view, keywords, self.scorer, self.params, self.k, self.adpt_params
                    )
                rows["topic"].extend([topic] * len(ids))
                rows["doc_id"].extend(ids.tolist())
                rows["score"].extend(scores.tolist())
        return pa.table(
            {
                "topic": pa.array(rows["topic"], pa.int32()),
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "score": pa.array(rows["score"], pa.float32()),
            }
        )


def search_topics_sharded(
    index_dir: str,
    topics: list[tuple[int, list[tuple[str, int]]]],
    scorer: str = "bm25",
    k: int = 1000,
    concurrency=(1, 8),
    method: str = "taat",
) -> pa.Table:
    """Distributed doc-range-sharded scoring; returns (topic, doc_id, score,
    rank) — bit-identical to whole-index TAAT (tested).  method="wand"/
    "maxscore" prunes INSIDE each shard (bm25/tfidf): the union of
    shard-local top-k supersets the global top-k, so the merge result stays
    bit-identical while each shard decodes only surviving blocks."""
    import ray.data

    post_meta = pads.dataset(os.path.join(index_dir, "postings"))
    shards = sorted(
        set(
            post_meta.to_table(columns=["shard"])["shard"].to_pylist()
        )
    )
    adpt_params = None
    if scorer == "bm25adpt":
        # PHASE 1: per-shard cd histograms -> summed on the driver ->
        # per-term (k1, IGs[1]) broadcast into phase 2.  The reduction moves
        # 100 ints per (shard, term); the tf distribution never leaves the
        # shards.
        from .scoring import adpt_term_params

        with open(os.path.join(index_dir, "stats.json")) as fh:
            stats = json.load(fh)
        from .terms_io import read_terms_table

        terms_tbl = read_terms_table(index_dir)
        df_map = dict(zip(terms_tbl["term"].to_pylist(), terms_tbl["df"].to_pylist()))
        q_terms = sorted({t for _, kws in topics for t, _ in kws if t in df_map})
        hist_ds = ray.data.from_items([{"shard": s} for s in shards]).map_batches(
            AdptHistogram,
            fn_constructor_kwargs=dict(index_dir=index_dir, terms=q_terms, b=stats["bm25"]["b"]),
            batch_size=1,
            batch_format="pyarrow",
            concurrency=concurrency,
            num_cpus=1,
        )
        totals: dict[str, np.ndarray] = {}
        for b_ in hist_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            tbl = pa.table(b_)
            for term, counts in zip(tbl["term"].to_pylist(), tbl["counts"].to_pylist()):
                acc = totals.get(term)
                arr = np.asarray(counts, dtype=np.int64)
                totals[term] = arr if acc is None else acc + arr
        adpt_params = {
            term: adpt_term_params(stats["n_docs"], df_map[term], counts)
            for term, counts in totals.items()
        }

    shard_ds = ray.data.from_items([{"shard": s} for s in shards])
    local = shard_ds.map_batches(
        ShardScorer,
        fn_constructor_kwargs=dict(index_dir=index_dir, topics=topics, scorer=scorer, k=k,
                                   adpt_params=adpt_params, method=method),
        batch_size=1,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="stable"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g

    out = local.groupby("topic").map_groups(merge_topk, batch_format="pandas")
    batches = list(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        return pa.table({"topic": [], "doc_id": [], "score": [], "rank": []})
    return pa.concat_tables([pa.table(b) for b in batches]).sort_by(
        [("topic", "ascending"), ("rank", "ascending")]
    )
