"""JSON column extraction — typed fields out of an embedded JSON-string
column (the ``props``/``metadata`` blob every event log carries).

Shape: each batch's JSON strings are joined into ONE newline-delimited
buffer and handed to pyarrow's C++ block JSON parser
(``pyarrow.json.read_json``) — one parse call per batch, never a Python
``json.loads`` loop over rows.  Field selection and casting are Arrow
kernels; missing fields in individual objects surface as nulls and the
caller's cast decides the type contract.

Precondition (enforced): values must be single-line JSON objects —
NDJSON framing breaks on embedded raw newlines (inside valid JSON a
newline is always escaped as ``\\n``, so only pretty-printed blobs
violate this; they fail loud here rather than mis-align rows)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def parse_json_batch(
    col: pa.Array | pa.ChunkedArray,
    fields: dict[str, pa.DataType],
) -> pa.Table:
    """Parse one batch's JSON-string column into the requested typed
    fields (one row out per row in, nulls for absent fields)."""
    import pyarrow.json as pj

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return pa.table({f: pa.array([], t) for f, t in fields.items()})
    filled = pc.fill_null(col, "{}")
    filled = pc.if_else(pc.equal(filled, ""), pa.scalar("{}"), filled)
    if pc.any(pc.match_substring(filled, "\n")).as_py():
        raise ValueError(
            "parse_json_batch: embedded raw newline breaks NDJSON framing "
            "(pretty-printed JSON is not supported)"
        )
    buf = "\n".join(filled.to_pylist()).encode("utf-8")
    parsed = pj.read_json(pa.BufferReader(buf))
    if parsed.num_rows != n:
        raise ValueError(
            f"parse_json_batch: parsed {parsed.num_rows} rows from {n} inputs"
        )
    out = {}
    for f, t in fields.items():
        if f in parsed.schema.names:
            out[f] = parsed[f].cast(t)
        else:
            out[f] = pa.nulls(n, t)
    return pa.table(out)


def extract_json_fields(
    ds: ray.data.Dataset,
    column: str,
    fields: dict[str, pa.DataType],
    keep: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Streaming field extraction: one stateless ``map_batches`` pass,
    output = ``keep`` columns + one typed column per requested field.
    A field name colliding with a kept column fails loud."""
    clash = set(keep) & set(fields)
    if clash:
        raise ValueError(f"extract_json_fields: name collision {sorted(clash)}")

    def run(batch: pa.Table) -> pa.Table:
        parsed = parse_json_batch(batch[column], fields)
        cols = {k: batch[k] for k in keep}
        for f in fields:
            cols[f] = parsed[f]
        return pa.table(cols)

    return ds.map_batches(run, batch_format="pyarrow")
