"""Index-build pipeline orchestration (the `index` entry point).

Reference lifecycle (/root/reference/src/Program.cs:35-68 + Indexer.cs):
scan files -> per-worker in-RAM index -> barrier -> serial merge -> one
binary blob.  Ray-native restatement (SURVEY.md §3.1):

  plan fragments (footer metadata only, deterministic docID bases)
    -> map_batches(SegmentBuilder, actor pool)   [stage 1: streams, no shuffle]
         each fragment atomically writes docs/ + segments/ parts and a
         manifest JSON (the checkpoint commit marker)
    -> global stats from manifests (n_docs, avgdl)  [tiny driver reduce]
    -> read_parquet(segments) -> groupby(bucket, shard)
         -> map_groups(vectorized merge)         [stage 2: THE shuffle]
    -> write_parquet(postings/), terms table, stats.json, .complete marker

Resume: stage 1 skips any fragment whose manifest exists (no data read);
stage 2 is idempotent and re-runs only if the .complete marker is absent.
Output is a directory of Parquet segments, never one giant file.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..config import BuildConfig
from .merge import add_merge_keys, make_merge_fn, POSTINGS_SCHEMA
from .reader import plan_fragments
from .segments import SegmentBuilder, build_segments_batch

# terms finalization: at most this many (term, shard) block-metadata rows
# aggregate driver-side into ONE terms.parquet; above it the finalization
# is fully distributed and writes a sorted terms/ directory.  Module-level
# so tests can force the distributed branch on small corpora.
TERMS_DRIVER_MAX_ROWS = 5_000_000


def build_index(
    input_path: str | list[str],
    index_dir: str,
    config: BuildConfig | None = None,
    source_column: str = "html",
    name_column: str = "url",
    term_buckets: int | None = None,
    overwrite: bool = False,
) -> dict:
    """Build (or resume building) the inverted index.  Returns stats dict."""
    config = config or BuildConfig()
    from .codec import CODEC_NAMES

    if config.codec not in CODEC_NAMES:
        raise ValueError(f"unknown postings codec {config.codec!r}; choose from {CODEC_NAMES}")
    if overwrite and os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)

    complete_marker = os.path.join(index_dir, ".complete")

    _t = time.perf_counter()
    phases: dict[str, float] = {}
    fragments = plan_fragments(input_path)
    phases["plan"] = time.perf_counter() - _t

    if os.path.exists(complete_marker):
        plan_path0 = os.path.join(index_dir, "build_plan.json")
        with open(plan_path0) as fh:
            prior0 = json.load(fh)
        if prior0 == [f.to_dict() for f in fragments]:
            with open(os.path.join(index_dir, "stats.json")) as fh:
                return json.load(fh)
        # input grew (or changed): fall through — the plan-prefix check
        # below either resumes incrementally or refuses
        os.remove(complete_marker)
    plan_path = os.path.join(index_dir, "build_plan.json")
    current = [f.to_dict() for f in fragments]
    if os.path.exists(plan_path):
        with open(plan_path) as fh:
            prior = json.load(fh)
        if current[: len(prior)] == prior:
            # resume, or INCREMENTAL APPEND: new input files that sort after
            # every prior file extend the plan without disturbing any
            # existing fragment's docID base — old fragments are skipped via
            # their manifests, only new ones build, and the merge re-runs.
            pass
        else:
            raise ValueError(
                "input layout changed since the prior build in a way that "
                "would reassign existing docIDs (appended files must sort "
                "after all prior files) — rebuild with overwrite=True"
            )
    with open(plan_path + ".tmp", "w") as fh:
        json.dump(current, fh)
    os.replace(plan_path + ".tmp", plan_path)

    # codec is a physical property of every already-written segment cell, so
    # a resume/append must keep the original choice (sibling marker file —
    # the plan file stays a bare fragment list for cross-version resume)
    codec_path = os.path.join(index_dir, "build_codec.json")
    if os.path.exists(codec_path):
        with open(codec_path) as fh:
            prior_codec = json.load(fh)["codec"]
        if prior_codec != config.codec:
            raise ValueError(
                f"index at {index_dir} was built with codec={prior_codec!r}; "
                f"cannot resume/append with codec={config.codec!r} — rebuild "
                "with overwrite=True"
            )
    else:
        manifest_dir = os.path.join(index_dir, "manifest")
        if (
            config.codec != "vbyte"
            and os.path.isdir(manifest_dir)
            and os.listdir(manifest_dir)
        ):
            # pre-marker builds are vbyte by definition
            raise ValueError(
                f"index at {index_dir} has pre-existing vbyte segments; "
                f"cannot resume/append with codec={config.codec!r} — rebuild "
                "with overwrite=True"
            )
        with open(codec_path + ".tmp", "w") as fh:
            json.dump({"codec": config.codec}, fh)
        os.replace(codec_path + ".tmp", codec_path)

    # ---- stage 1: per-fragment segments (streams; no shuffle) ----
    n_cpus = max(2, int(ray.cluster_resources().get("CPU", 4)))
    frag_ds = ray.data.from_items([f.to_dict() for f in fragments])
    stage_kwargs = dict(
        index_dir=index_dir,
        config=config,
        source_column=source_column,
        name_column=name_column,
    )
    if config.segment_concurrency is None:
        # stateless task pool: worker processes are reused, so the
        # module-global Porter memo stays warm without actor-pool startup
        manifest_ds = frag_ds.map_batches(
            build_segments_batch,
            fn_kwargs=stage_kwargs,
            batch_size=1,
            num_cpus=1,
        )
    else:
        manifest_ds = frag_ds.map_batches(
            SegmentBuilder,
            fn_constructor_kwargs=stage_kwargs,
            batch_size=1,
            concurrency=config.segment_concurrency,
            num_cpus=1,
        )
    _t = time.perf_counter()
    manifests = manifest_ds.to_pandas()  # tiny: one row per fragment
    phases["segments"] = time.perf_counter() - _t

    n_docs = int(manifests["n_docs"].sum())
    sum_dl = int(manifests["sum_dl"].sum())
    avgdl = sum_dl / n_docs if n_docs else 0.0

    if term_buckets is None:
        # Size merge groups to stay cache-resident (~0.5 MiB of postings
        # per (bucket, shard) group): DRAM-throttled hosts run a
        # cache-sized vectorized merge an order of magnitude faster than a
        # big-array one, and at cluster scale smaller groups also smooth
        # shuffle skew.  ~20 bytes per posting entry across the three
        # parallel arrays.
        n_postings = int(manifests["n_postings"].sum())
        n_shards = max(1, (len(fragments) + config.frags_per_shard - 1) // config.frags_per_shard)
        term_buckets = int(min(4096, max(16, n_postings * 20 // (512 * 1024) // n_shards)))

    # ---- stage 2: the term shuffle ----
    postings_dir = os.path.join(index_dir, "postings")
    if os.path.isdir(postings_dir):
        shutil.rmtree(postings_dir)  # idempotent re-run of an interrupted merge

    # Coarse read blocks bound the sort's fan-out: the all-to-all creates
    # (input blocks x output partitions) objects, so many tiny blocks turn a
    # small exchange into thousands of object transfers.  Partition count is
    # DATA-driven (~256 MiB of segment data per shuffle partition — grows
    # with corpus size at cluster scale), bounded by fragment count and by
    # 2x the CPUs so a single node is never oversubscribed with
    # bandwidth-heavy merge tasks.  Sizing happens AT THE READ
    # (override_num_blocks) — no separate repartition exchange.
    if config.shuffle_partitions is not None:
        shuffle_parts = config.shuffle_partitions
    else:
        seg_bytes = int(manifests["bytes"].sum())
        by_data = max(1, seg_bytes // (256 * 1024 * 1024))
        shuffle_parts = int(max(2, min(len(fragments), n_cpus * 2, max(by_data, min(8, n_cpus)))))
    seg_ds = ray.data.read_parquet(
        os.path.join(index_dir, "segments"), override_num_blocks=shuffle_parts
    )
    keyed = seg_ds.map_batches(
        add_merge_keys,
        fn_kwargs=dict(frags_per_shard=config.frags_per_shard, term_buckets=term_buckets),
        batch_format="pyarrow",
    )
    merged = keyed.groupby(["bucket", "shard"]).map_groups(
        make_merge_fn(config, avgdl), batch_format="pyarrow"
    )
    _t = time.perf_counter()
    merged.write_parquet(postings_dir)
    if not os.path.isdir(postings_dir):
        # degenerate corpus (every token filtered): write_parquet of an
        # empty dataset creates nothing — materialize an empty index
        os.makedirs(postings_dir, exist_ok=True)
        pq.write_table(POSTINGS_SCHEMA.empty_table(), os.path.join(postings_dir, "part-empty.parquet"))
    phases["merge"] = time.perf_counter() - _t

    # terms table: df per term (A4 materialized) — aggregate over block
    # metadata only, no posting payload moves.  Small metadata (the common
    # case up to ~millions of terms x shards) aggregates driver-side into
    # ONE sorted terms.parquet; past the threshold the whole finalization
    # stays distributed — groupby.sum -> sort -> a sorted terms/ DIRECTORY
    # (round-3 verdict #7: at 10^9+ distinct web-scale tokens a driver
    # collect OOMs).  All readers accept both layouts via engine.terms_io;
    # compact and merge share the same writer.
    from .terms_io import finalize_terms

    _t = time.perf_counter()
    n_terms, _ = finalize_terms(postings_dir, index_dir, TERMS_DRIVER_MAX_ROWS)
    phases["terms"] = time.perf_counter() - _t

    stats = {
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "avgdl": avgdl,
        "n_terms": int(n_terms),
        "n_postings": int(manifests["n_postings"].sum()),
        "n_fragments": len(fragments),
        "options": config.options.to_dict(),
        "bm25": {"k1": config.bm25.k1, "k3": config.bm25.k3, "b": config.bm25.b},
        "block_entries": config.block_entries,
        "codec": config.codec,
        "frags_per_shard": config.frags_per_shard,
        "term_buckets": term_buckets,
        "phase_sec": {k: round(v, 3) for k, v in phases.items()},
    }
    with open(os.path.join(index_dir, "stats.json.tmp"), "w") as fh:
        json.dump(stats, fh)
    os.replace(os.path.join(index_dir, "stats.json.tmp"), os.path.join(index_dir, "stats.json"))
    with open(complete_marker, "w") as fh:
        fh.write("ok")
    return stats
