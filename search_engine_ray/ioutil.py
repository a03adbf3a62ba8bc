"""Parquet-read helpers shared by the engine, dataops and the driver entry.

``read_parquet_clean`` is ``ray.data.read_parquet`` with the file schema's
metadata stripped.  A ``pa.Schema`` carrying pandas metadata (anything
written via ``pandas.to_parquet`` / ``pa.Table.from_pandas``, including the
driver-generated testdata) is UNHASHABLE — ``hash(schema)`` raises
``unhashable type: 'dict'`` — which defeats Ray Data's block-schema
deduplication (`transform_pyarrow.unify_schemas` logs "Failed to hash the
schemas" and falls through to the slow unify path on EVERY operator edge).
Passing an explicit metadata-free schema at the read keeps every downstream
block schema hashable, so Ray's set()-based early exit works and the log
stays quiet.
"""

from __future__ import annotations

import os
from collections.abc import Iterable

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def strip_metadata(schema: pa.Schema) -> pa.Schema:
    """Field- and schema-level metadata removed (both can hold dicts)."""
    return pa.schema([schema.field(i).remove_metadata() for i in range(len(schema.names))])


def _first_parquet_file(paths: str | Iterable[str]) -> str | None:
    p = next(iter(paths)) if not isinstance(paths, str) else paths
    if os.path.isdir(p):
        for root, dirs, files in sorted(os.walk(p)):
            dirs.sort()
            for f in sorted(files):
                if f.endswith(".parquet"):
                    return os.path.join(root, f)
        return None
    return p


def read_parquet_clean(
    paths: str | list[str],
    *,
    columns: list[str] | None = None,
    **kwargs,
) -> ray.data.Dataset:
    """``ray.data.read_parquet`` emitting hashable (metadata-free) block
    schemas.  One extra footer read (first file only) at plan time."""
    first = _first_parquet_file(paths)
    if first is not None and "schema" not in kwargs:
        schema = strip_metadata(pq.read_schema(first))
        if columns is not None:
            # Ray requires the schema to match the projected columns exactly
            schema = pa.schema([schema.field(c) for c in columns])
        kwargs["schema"] = schema
    if columns is not None:
        kwargs["columns"] = columns
    return ray.data.read_parquet(paths, **kwargs)


def nonempty_blocks(ds: ray.data.Dataset) -> ray.data.Dataset | None:
    """Workaround for a Ray Data 2.49 wart: hash-shuffle join operators
    emit ZERO-COLUMN empty blocks for empty output partitions, and empty
    blocks pass through later map stages without the UDF running — so a
    downstream join/shuffle sees a schema-less block and Acero fails
    with "No match ... for key field reference" at finalize.  Rebuild
    the (already materialized) dataset from its non-empty block refs — a
    metadata-only operation, the blocks never leave the object store.
    Returns None when every block is empty (callers treat that as an
    empty input)."""
    refs = []
    for rb in ds.iter_internal_ref_bundles():
        for br, meta in zip(rb.block_refs, rb.metadata):
            if meta.num_rows:
                refs.append(br)
    if not refs:
        return None
    return ray.data.from_arrow_refs(refs)
