"""Trigram-indexed substring / regex search (Google Code Search design).

Implements R. Cox's public "Regular Expression Matching with a Trigram
Index" (swtch.com/~rsc/regexp/regexp4.html) Ray-Data-first:

- build_trigram_index : one vectorized map_batches pass extracts each
  document's DISTINCT byte trigrams (numpy sliding window over the flat
  Arrow string buffer — no per-row loop), packs them into uint32, and
  writes (tg, doc_id) postings as parquet PARTITIONED BY a trigram hash
  bucket.  Index size is O(corpus bytes); no shuffle at build time.
- substring_search    : needle -> its trigram set -> PRUNED read of only
  the needle's bucket directories with a tg row-group filter -> doc_id
  intersection via ONE groupby count -> distributed verification of the
  candidates (left_semi join + pc.match_substring).  A probe touches
  O(sum df(tg)) postings rows, never the corpus; false positives are
  removed by verification, false negatives are impossible (a doc
  containing the needle contains every trigram of the needle).
- regex_search        : a simplified RegexpQuery analysis extracts literal
  alternatives such that EVERY match contains at least one alternative in
  full (concatenation folds exact sets via bounded cross product,
  alternation unions branches, `x+` keeps x's requirement, `x*`/`x?`
  contribute nothing).  Candidates = OR over alternatives of (AND of the
  alternative's trigrams), then distributed RE2 verification
  (pc.match_substring_regex — the same regex family DuckDB uses).
  Unanalyzable patterns fail OPEN to a distributed full-scan verify.
- trigram_df          : per-trigram document frequency via the same
  pruned read (used by tests and the driver gate).

At 100 TB the design holds: the index is written once, partitioned, and
every query reads only the probed trigrams' buckets (column-pruned to
(tg, doc_id)); the intersection groupby moves candidate-sized data; the
verify join moves only candidate payloads.  Skewed (stop-)trigrams are
handled by probing only the ``max_probe_trigrams`` RAREST trigrams of the
needle — df comes from a tg-column-only pruned read.

No counterpart in the reference repo (its lexicon is term-exact only);
closest in-repo relatives: engine/lexicon.py (term wildcards) and the
IVF probe layout in dataops/similarity.py.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..ioutil import nonempty_blocks, read_parquet_clean
from .dedup import _join_parts
from .similarity import _parquet_files

_TG_MASK = np.uint64(0xFFFFFF)
# Knuth multiplicative hash so ASCII-heavy trigrams spread across buckets
_TG_HASH_MULT = np.uint64(2654435761)


def _flat_bytes(texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 buffer, int64 value offsets) for a string column."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    b = texts.cast(pa.large_binary())
    offsets = np.frombuffer(b.buffers()[1], dtype=np.int64)[
        b.offset : b.offset + len(b) + 1
    ]
    data = np.frombuffer(b.buffers()[2], dtype=np.uint8)
    # sliced arrays: offsets index into the FULL value buffer — normalize
    # to the slice's window so positions and offsets share an origin
    start, end = (int(offsets[0]), int(offsets[-1])) if len(offsets) else (0, 0)
    return data[start:end], offsets - start


def doc_trigrams(texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """DISTINCT byte trigrams per document, vectorized.

    Returns (tg uint32 packed b0<<16|b1<<8|b2, row_idx int64), sorted by
    (row, tg).  UTF-8 is self-synchronizing, so for any ASCII needle the
    byte-trigram document frequency equals the character-trigram one."""
    data, offsets = _flat_bytes(texts)
    if len(data) < 3:
        return np.empty(0, np.uint32), np.empty(0, np.int64)
    u = data.astype(np.uint32)
    tg = (u[:-2] << np.uint32(16)) | (u[1:-1] << np.uint32(8)) | u[2:]
    pos = np.arange(len(tg), dtype=np.int64)
    row = np.searchsorted(offsets, pos, side="right") - 1
    valid = pos + 3 <= offsets[row + 1]
    key = (row[valid].astype(np.uint64) << np.uint64(24)) | tg[valid].astype(
        np.uint64
    )
    key = np.unique(key)
    return (key & _TG_MASK).astype(np.uint32), (key >> np.uint64(24)).astype(np.int64)


def pack_trigrams(s: str | bytes) -> list[int]:
    """Sorted distinct packed trigrams of a needle ('' -> [])."""
    b = s.encode("utf-8") if isinstance(s, str) else bytes(s)
    return sorted({(b[i] << 16) | (b[i + 1] << 8) | b[i + 2] for i in range(len(b) - 2)})


def unpack_trigram(tg: int) -> str:
    return bytes([(tg >> 16) & 0xFF, (tg >> 8) & 0xFF, tg & 0xFF]).decode(
        "utf-8", errors="replace"
    )


def _tg_bucket(tg: np.ndarray, num_buckets: int) -> np.ndarray:
    h = (tg.astype(np.uint64) * _TG_HASH_MULT) & np.uint64(0xFFFFFFFF)
    return (h % np.uint64(num_buckets)).astype(np.int32)


# --------------------------------------------------------------------------
# build
# --------------------------------------------------------------------------

def build_trigram_index(
    ds: ray.data.Dataset,
    index_dir: str,
    *,
    column: str = "text",
    id_column: str = "doc_id",
    num_buckets: int = 64,
) -> dict:
    """Persist the trigram postings, partitioned by trigram hash bucket::

        index_dir/meta.json                    {num_buckets, column, id_column}
        index_dir/postings/bucket=K/part.parquet  (tg uint32, <id_column> int64)

    One map_batches extraction pass, then ONE bucket-keyed groupby (the
    same exchange shape as the index builder's term-bucket merge) writes
    each bucket as a SINGLE file sorted by (tg, id): a probe opens only
    its trigrams' buckets — O(1) files each — and the sorted tg column
    gives the scan filter real row-group min/max pruning.  (A naive
    ``write_parquet(partition_cols=...)`` emits one file per input block
    per bucket: thousands of tiny files whose open/footer overhead
    dominated the probe.)  ``num_buckets`` is the build's parallelism
    AND the per-writer memory bound — scale it with the corpus so
    postings/num_buckets fits a worker."""
    import pyarrow.parquet as pq

    def extract(batch: pa.Table) -> pa.Table:
        idcol = batch.column(id_column)
        if isinstance(idcol, pa.ChunkedArray):
            idcol = idcol.combine_chunks()
        if pa.types.is_integer(idcol.type):
            idcol = idcol.cast(pa.int64())
        tg, row = doc_trigrams(batch.column(column))
        return pa.table(
            {
                "bucket": pa.array(_tg_bucket(tg, num_buckets)),
                "tg": pa.array(tg, pa.uint32()),
                id_column: idcol.take(pa.array(row)),
            }
        )

    posts_dir = os.path.join(index_dir, "postings")
    os.makedirs(posts_dir, exist_ok=True)

    def write_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"bucket": pa.array([], pa.int64()), "n_rows": pa.array([], pa.int64())}
        )
        if group.num_rows == 0:
            return empty
        b = int(group["bucket"][0].as_py())
        order = pc.sort_indices(
            group, sort_keys=[("tg", "ascending"), (id_column, "ascending")]
        )
        body = group.drop_columns(["bucket"]).take(order)
        d = os.path.join(posts_dir, f"bucket={b}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "part.parquet")
        pq.write_table(body, path + ".tmp", row_group_size=1 << 17)
        os.replace(path + ".tmp", path)
        # bucket-local tg -> df sidecar (rows are distinct per (tg, doc)
        # and sorted by tg, so df is a run-length count): probe-time
        # rarest-trigram selection becomes a metadata read, no Ray pass
        tgv = body.column("tg").to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(tgv, return_counts=True)
        spath = os.path.join(d, "tgstats.parquet")
        pq.write_table(
            pa.table(
                {
                    "tg": pa.array(uniq.astype(np.uint32), pa.uint32()),
                    "df": pa.array(counts.astype(np.int64)),
                }
            ),
            spath + ".tmp",
        )
        os.replace(spath + ".tmp", spath)
        return pa.table(
            {
                "bucket": pa.array([b], pa.int64()),
                "n_rows": pa.array([body.num_rows], pa.int64()),
            }
        )

    (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .materialize()
    )
    schema = ds.schema()
    pa_schema = getattr(schema, "base_schema", schema)  # Ray Schema wrapper
    id_type = (
        "int64" if pa.types.is_integer(pa_schema.field(id_column).type) else "string"
    )
    meta = {
        "num_buckets": int(num_buckets),
        "column": column,
        "id_column": id_column,
        "id_type": id_type,
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def _load_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "meta.json")) as fh:
        return json.load(fh)


def _bucket_paths(index_dir: str, meta: dict, tgs: list[int], name: str) -> list[str]:
    buckets = sorted(
        set(_tg_bucket(np.asarray(tgs, np.uint32), meta["num_buckets"]).tolist())
    )
    paths = [
        os.path.join(index_dir, "postings", f"bucket={b}", name) for b in buckets
    ]
    return [p for p in paths if os.path.exists(p)]


def _read_postings(
    index_dir: str, meta: dict, tgs: list[int], columns: list[str]
) -> ray.data.Dataset | None:
    """Pruned postings read: only the probed trigrams' bucket files,
    column-pruned, with a tg filter pushed into the parquet scan (the
    per-bucket files are tg-sorted, so row-group stats prune for real)."""
    if not tgs:
        return None
    paths = _bucket_paths(index_dir, meta, tgs, "part.parquet")
    if not paths:
        return None
    expr = pc.field("tg").isin(pa.array(tgs, pa.uint32()))
    return read_parquet_clean(paths, columns=columns, filter=expr)


def _df_of(index_dir: str, meta: dict, tgs: list[int]) -> dict[int, int]:
    """tg -> document frequency from the bucket-local tgstats sidecars —
    a driver-side metadata read (a few KB per probed bucket), no Ray
    pass.  Missing trigrams simply don't appear (df 0)."""
    import pyarrow.parquet as pq

    out: dict[int, int] = {}
    for p in _bucket_paths(index_dir, meta, tgs, "tgstats.parquet"):
        t = pq.read_table(p, filters=[("tg", "in", [int(x) for x in tgs])])
        for tgv, df in zip(t["tg"].to_pylist(), t["df"].to_pylist()):
            out[int(tgv)] = out.get(int(tgv), 0) + int(df)
    return out


# --------------------------------------------------------------------------
# probes
# --------------------------------------------------------------------------

def trigram_df(index_dir: str, trigrams: list[str | bytes | int]) -> pa.Table:
    """Document frequency of each probed trigram (0-df trigrams included),
    straight off the tgstats sidecars.  Output (trigram: string,
    df: int64) sorted by trigram ascending."""
    meta = _load_meta(index_dir)
    tgs = sorted(
        {t if isinstance(t, int) else pack_trigrams_one(t) for t in trigrams}
    )
    df = _df_of(index_dir, meta, tgs)
    return pa.table(
        {
            "trigram": pa.array([unpack_trigram(t) for t in tgs], pa.string()),
            "df": pa.array([df.get(t, 0) for t in tgs], pa.int64()),
        }
    )


def pack_trigrams_one(t: str | bytes) -> int:
    b = t.encode("utf-8") if isinstance(t, str) else bytes(t)
    if len(b) != 3:
        raise ValueError(f"not a trigram: {t!r}")
    return (b[0] << 16) | (b[1] << 8) | b[2]


def _rarest_trigrams(
    index_dir: str, meta: dict, tgs: list[int], max_probe: int
) -> list[int]:
    """Probe-set selection: keep the ``max_probe`` rarest trigrams (ties ->
    tg ascending), ranked by the tgstats sidecars — probe cost tracks the
    rarest trigrams instead of stop-trigrams like 'the', and the df
    lookup is a metadata read, not a data pass."""
    if len(tgs) <= max_probe:
        return tgs
    df = _df_of(index_dir, meta, tgs)
    return sorted(tgs, key=lambda t: (df.get(t, 0), t))[:max_probe]


def _candidates_all_of(
    index_dir: str, meta: dict, tgs: list[int], id_column: str
) -> ray.data.Dataset | None:
    """doc ids containing ALL of ``tgs``: one pruned read + one groupby
    (postings are distinct per (tg, doc), so count == len(tgs) <=> all
    present).  None -> provably no candidates."""
    posts = _read_postings(index_dir, meta, tgs, columns=["tg", id_column])
    if posts is None:
        return None
    k = len(tgs)

    def all_present(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch["count()"], k)
        return batch.filter(pc.fill_null(mask, False)).select([id_column])

    hits = (
        posts.groupby(id_column)
        .count()
        .map_batches(all_present, batch_format="pyarrow")
    )
    return nonempty_blocks(hits.materialize())


def _verify_semi_join(
    docs: ray.data.Dataset,
    cand_ids: ray.data.Dataset,
    id_column: str,
) -> ray.data.Dataset | None:
    """Candidate payload rows via a left_semi join (payload moves once)."""
    joined = docs.join(
        cand_ids,
        "left_semi",
        _join_parts(16),
        on=(id_column,),
        right_on=(id_column,),
    )
    return nonempty_blocks(joined.materialize())


def _empty_ids(id_column: str, meta: dict | None = None) -> ray.data.Dataset:
    t = pa.string() if (meta or {}).get("id_type") == "string" else pa.int64()
    return ray.data.from_arrow(pa.table({id_column: pa.array([], t)}))


def substring_search(
    index_dir: str,
    docs: ray.data.Dataset,
    needle: str | bytes,
    *,
    max_probe_trigrams: int = 8,
) -> ray.data.Dataset:
    """doc ids whose ``column`` contains ``needle`` (exact, verified),
    sorted ascending.  Needles shorter than 3 bytes have no trigrams and
    fall back to the distributed full-scan verify (documented fail-open)."""
    meta = _load_meta(index_dir)
    column, id_column = meta["column"], meta["id_column"]
    pat = needle.decode("utf-8") if isinstance(needle, bytes) else needle
    tgs = pack_trigrams(needle)
    if tgs:
        tgs = _rarest_trigrams(index_dir, meta, tgs, max_probe_trigrams)
        cand_ids = _candidates_all_of(index_dir, meta, tgs, id_column)
        if cand_ids is None:
            return _empty_ids(id_column, meta)
        cand = _verify_semi_join(docs, cand_ids, id_column)
        if cand is None:
            return _empty_ids(id_column, meta)
    else:
        cand = docs

    def verify(batch: pa.Table) -> pa.Table:
        keep = pc.match_substring(batch.column(column), pat)
        return batch.filter(pc.fill_null(keep, False)).select([id_column])

    return cand.map_batches(verify, batch_format="pyarrow").sort(id_column)


# --------------------------------------------------------------------------
# regex analysis (simplified Cox RegexpQuery)
# --------------------------------------------------------------------------

_MAX_EXACT = 64  # cross-product cap before an exact set degrades to required


def required_literal_alternatives(pattern: str) -> list[str] | None:
    """Literal alternatives such that every match of ``pattern`` contains
    at least one alternative IN FULL; None when no useful guarantee exists
    (callers fall back to a full-scan verify).  Alternatives shorter than
    3 bytes are unusable for trigram prefiltering, so any such alternative
    also yields None."""
    try:
        from re import _parser as sre_parse
    except ImportError:  # pragma: no cover - py<3.11
        import sre_parse
    try:
        seq = sre_parse.parse(pattern)
    except Exception:
        return None
    got = _analyze_seq(seq)
    if got is None:
        return None
    kind, lits = got
    if not lits or any(len(s.encode("utf-8")) < 3 for s in lits):
        return None
    return sorted(lits)


def _analyze_node(op, av):
    """-> ('exact', set) | ('req', set) | ('skip', None) | None.

    exact: the node matches exactly one string from the set.
    req  : every match of the node contains >=1 of the set.
    skip : the node matches only '' / zero-width (contributes nothing).
    None : no information (breaks literal runs in a concatenation)."""
    opname = str(op)
    if opname == "LITERAL":
        return ("exact", {chr(av)})
    if opname == "AT":
        return ("skip", None)
    if opname == "IN":
        chars: set[str] = set()
        for iop, iav in av:
            if str(iop) == "LITERAL":
                chars.add(chr(iav))
            elif str(iop) == "RANGE" and iav[1] - iav[0] < 16:
                chars.update(chr(c) for c in range(iav[0], iav[1] + 1))
            else:
                return None
        return ("exact", chars) if len(chars) <= _MAX_EXACT else None
    if opname == "SUBPATTERN":
        return _analyze_seq(av[3])
    if opname == "BRANCH":
        alts = [_analyze_seq(s) for s in av[1]]
        # a branch that can match '' (or is unanalyzable) guarantees
        # nothing AND breaks the surrounding literal run -> no info
        if any(a is None or a[0] == "skip" for a in alts):
            return None
        union: set[str] = set()
        for _, s in alts:
            union |= s
        kind = "exact" if all(a[0] == "exact" for a in alts) else "req"
        if kind == "exact" and len(union) > _MAX_EXACT:
            kind = "req"
        return (kind, union)
    if opname in ("MAX_REPEAT", "MIN_REPEAT"):
        lo, hi, item = av
        if lo == 0:
            # x* / x? matches '' — it guarantees nothing and BREAKS the
            # surrounding literal run ('sort(ed)? window' must NOT fold
            # into 'sort window'), so: no info, not zero-width skip
            return None
        inner = _analyze_seq(item)
        if inner is None:
            return None
        ikind, iset = inner
        if ikind == "skip":
            return ("skip", None)
        if ikind == "exact" and lo == hi and lo * len(iset) and lo <= 4 and len(iset) == 1:
            return ("exact", {next(iter(iset)) * lo})
        return ("req", set(iset))
    return None


def _analyze_seq(seq):
    """Fold a concatenation.  Adjacent exact nodes cross-product into
    longer exact strings; every exact run and every 'req' element is an
    independently-valid requirement — keep the strongest (the one whose
    WEAKEST literal is longest)."""
    flushed: list[set[str]] = []
    cur: set[str] = {""}
    cur_exact = True

    def flush():
        nonlocal cur, cur_exact
        if cur != {""}:
            flushed.append(set(cur))
        cur, cur_exact = {""}, True

    for op, av in seq:
        got = _analyze_node(op, av)
        if got is None:
            flush()
            continue
        kind, s = got
        if kind == "skip":
            continue
        if kind == "exact":
            if len(cur) * len(s) <= _MAX_EXACT:
                cur = {a + b for a in cur for b in s}
            else:
                flush()
                flushed.append(set(s))
            continue
        # 'req' element: its set stands alone; it also ends the exact run
        flush()
        flushed.append(set(s))

    whole_exact = cur_exact and not flushed and cur != {""}
    if whole_exact:
        return ("exact", cur)
    flush()
    if not flushed:
        return ("skip", None)
    usable = [s for s in flushed if all(len(x.encode()) >= 3 for x in s)]
    if not usable:
        return None
    best = max(usable, key=lambda s: min(len(x) for x in s))
    return ("req", best)


def _candidates_any_literal(
    index_dir: str,
    meta: dict,
    lits: list[str],
    id_column: str,
    max_probe_trigrams: int,
) -> ray.data.Dataset | None:
    """doc ids containing at least one literal of ``lits`` in full —
    OR over alternatives of (AND of the alternative's probed trigrams),
    in ONE df pass (tg column only, union of all literals' trigrams),
    ONE postings read, and ONE (doc, lit) groupby: each posting row fans
    out to the literals its trigram belongs to via a broadcast tg->lits
    table, count == the literal's probe-set size marks an AND hit, and a
    final distinct over doc ids is the OR.  None -> provably no
    candidates."""
    per_lit = [pack_trigrams(lit) for lit in lits]
    all_tgs = sorted({t for tgs in per_lit for t in tgs})
    if any(not tgs for tgs in per_lit):
        # a literal with no trigrams can't be prefiltered; callers treat
        # this as unanalyzable upstream, but guard anyway
        return None
    if max(len(tgs) for tgs in per_lit) > max_probe_trigrams:
        df = _df_of(index_dir, meta, all_tgs)
        per_lit = [
            sorted(tgs, key=lambda t: (df.get(t, 0), t))[:max_probe_trigrams]
            for tgs in per_lit
        ]
        all_tgs = sorted({t for tgs in per_lit for t in tgs})
    posts = _read_postings(index_dir, meta, all_tgs, columns=["tg", id_column])
    if posts is None:
        return None

    # flat tg -> literal-ids mapping, shipped once via the object store
    tg_sorted = np.asarray(all_tgs, dtype=np.uint32)
    pairs = sorted(
        (t, li) for li, tgs in enumerate(per_lit) for t in tgs
    )
    pair_tg = np.asarray([t for t, _ in pairs], dtype=np.uint32)
    pair_lit = np.asarray([li for _, li in pairs], dtype=np.int32)
    starts = np.searchsorted(pair_tg, tg_sorted, side="left")
    ends = np.searchsorted(pair_tg, tg_sorted, side="right")
    sizes = np.asarray([len(tgs) for tgs in per_lit], dtype=np.int64)
    map_ref = ray.put((tg_sorted, starts, ends, pair_lit, sizes))

    def fan_out(batch: pa.Table) -> pa.Table:
        tg_s, st, en, pl, _ = ray.get(map_ref)
        tgv = batch.column("tg").to_numpy(zero_copy_only=False).astype(np.uint32)
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        ix = np.searchsorted(tg_s, tgv)
        reps = (en - st)[ix]
        flat_lit = pl[
            np.repeat(st[ix], reps)
            + (np.arange(int(reps.sum())) - np.repeat(np.cumsum(reps) - reps, reps))
        ]
        return pa.table(
            {
                id_column: pa.array(np.repeat(ids, reps)),
                "lit": pa.array(flat_lit, pa.int32()),
            }
        )

    counts = posts.map_batches(fan_out, batch_format="pyarrow").groupby(
        [id_column, "lit"]
    ).count()

    def and_hit(batch: pa.Table) -> pa.Table:
        _, _, _, _, sz = ray.get(map_ref)
        lit = batch.column("lit").to_numpy(zero_copy_only=False)
        n = batch.column("count()").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(n == sz[lit])).select([id_column])

    hits = (
        counts.map_batches(and_hit, batch_format="pyarrow")
        .groupby(id_column)
        .count()
        .select_columns([id_column])
    )
    return nonempty_blocks(hits.materialize())


def regex_search(
    index_dir: str,
    docs: ray.data.Dataset,
    pattern: str,
    *,
    max_probe_trigrams: int = 8,
) -> ray.data.Dataset:
    """doc ids whose text matches ``pattern`` (RE2 semantics via
    pc.match_substring_regex — the engine DuckDB's regexp_matches also
    uses), sorted ascending.  Candidates come from the trigram index when
    the pattern yields required literal alternatives; otherwise the verify
    runs as a distributed full scan (fail-open, never fail-wrong)."""
    meta = _load_meta(index_dir)
    column, id_column = meta["column"], meta["id_column"]
    lits = required_literal_alternatives(pattern)
    cand = docs
    if lits is not None:
        cand_ids = _candidates_any_literal(
            index_dir, meta, lits, id_column, max_probe_trigrams
        )
        if cand_ids is None:
            return _empty_ids(id_column, meta)
        cand = _verify_semi_join(docs, cand_ids, id_column)
        if cand is None:
            return _empty_ids(id_column, meta)

    def verify(batch: pa.Table) -> pa.Table:
        keep = pc.match_substring_regex(batch.column(column), pattern)
        return batch.filter(pc.fill_null(keep, False)).select([id_column])

    return cand.map_batches(verify, batch_format="pyarrow").sort(id_column)
