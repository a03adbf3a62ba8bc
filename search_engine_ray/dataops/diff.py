"""Table diff — the incremental-ingest primitive: which rows were
added, removed, or changed between two versions of a corpus, without
ever colocating full row payloads.

Each side folds to (id, fingerprint) first — the fingerprint is
``md5(concat_ws('|', CAST(col AS VARCHAR)...))`` with a NUL sentinel
for NULLs, the repo's SQL-reproducible convention — so the only
exchange is one id-keyed full-outer hash join of two fingerprint
tables (16-40 B/row), never the documents themselves.  Unchanged rows
(the overwhelming bulk of an incremental run) are dropped INSIDE the
join's output pass, so the result is delta-sized.

Output: (id, status) with status in {'added', 'removed', 'changed'} —
exactly the SQL FULL OUTER JOIN classification, bit-reproducible.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import _join_parts

_NULL_SENTINEL = "\x00null"


def row_fingerprints(
    ds: ray.data.Dataset, id_col: str, cmp_cols: list[str]
) -> ray.data.Dataset:
    """(id, fp) per row: md5 hex of the '|'-joined VARCHAR rendering of
    ``cmp_cols`` (NULL -> a NUL sentinel no real value can collide
    with).  SQL parity: ``md5(concat_ws('|', COALESCE(CAST(c AS
    VARCHAR), chr(0) || 'null'), ...))``."""
    if not cmp_cols:
        raise ValueError("row_fingerprints: cmp_cols must be non-empty")

    def fp(batch: pa.Table) -> pa.Table:
        rendered = []
        for c in cmp_cols:
            col = batch[c]
            if not (
                pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
            ):
                col = pc.cast(col, pa.string())
            rendered.append(pc.fill_null(col, _NULL_SENTINEL))
        joined = (
            rendered[0]
            if len(rendered) == 1
            else pc.binary_join_element_wise(*rendered, "|")
        )
        if isinstance(joined, pa.ChunkedArray):
            joined = joined.combine_chunks()
        fps = [
            hashlib.md5(s.encode("utf-8")).hexdigest()
            for s in joined.to_pylist()
        ]
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "fp": pa.array(fps, pa.string()),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


def table_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    id_col: str,
    cmp_cols: list[str],
    join_partitions: int = 8,
    validate_unique: bool = True,
) -> ray.data.Dataset:
    """Classify every id across two table versions: 'added' (only in
    new), 'removed' (only in old), 'changed' (both, fingerprints
    differ).  Unchanged ids never leave the join pass.  Duplicate ids
    within a side are a caller bug and fail loud (the diff would be
    ill-defined); the check is fully distributed (a groupby-count — one
    extra id-sized exchange per side) and can be skipped with
    ``validate_unique=False`` when the id is known unique upstream."""
    from ray.data.aggregate import Count

    ofp = row_fingerprints(old, id_col, cmp_cols).materialize()
    nfp = row_fingerprints(new, id_col, cmp_cols).materialize()
    if validate_unique:
        for side, d in (("old", ofp), ("new", nfp)):

            def dup_only(batch: pa.Table) -> pa.Table:
                mask = pc.greater(batch["count()"], 1)
                return batch.filter(mask)

            dups = (
                d.groupby(id_col)
                .aggregate(Count())
                .map_batches(dup_only, batch_format="pyarrow")
                .limit(1)
                .take_all()
            )
            if dups:
                raise ValueError(
                    f"table_diff: duplicate {id_col} values in the {side} "
                    f"side (e.g. {dups[0][id_col]}) — the diff is ill-defined"
                )
    jp = _join_parts(join_partitions)
    joined = ofp.join(
        nfp,
        "full_outer",
        jp,
        on=(id_col,),
        right_on=(id_col,),
        right_suffix="_new",
    )

    def classify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "status": pa.array([], pa.string()),
                }
            )
        old_fp = batch["fp"]
        new_fp = batch["fp_new"]
        ids = np.asarray(batch[id_col], dtype=np.int64)
        o_null = np.asarray(pc.is_null(old_fp))
        n_null = np.asarray(pc.is_null(new_fp))
        same = np.asarray(
            pc.fill_null(pc.equal(old_fp, new_fp), False)
        )
        status = np.where(
            o_null, "added", np.where(n_null, "removed", "changed")
        ).astype(object)
        keep = ~(~o_null & ~n_null & same)  # drop unchanged inside the pass
        return pa.table(
            {
                id_col: pa.array(ids[keep]),
                "status": pa.array(status[keep], pa.string()),
            }
        )

    return joined.map_batches(classify, batch_format="pyarrow")
