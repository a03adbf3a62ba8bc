"""Delta + VByte posting compression (vectorized numpy, no per-row loops).

Replaces the reference's raw ``(int32 docId, uint16 tf)*`` dump
(/root/reference/src/Indexing/WriteableIndex.cs:154-188) with the standard
compressed layout for web-scale posting lists: docIDs are delta-gapped then
VByte-encoded (7 data bits per byte, high bit terminates a value,
little-endian groups); tfs and doc lengths are VByte-encoded directly.

Both directions are O(max_bytes_per_value) vectorized passes (<= 10 numpy
ops over the whole array), so encode/decode speed scales with memory
bandwidth, not Python overhead.
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # enough for uint64
# value v needs k bytes iff v >= 2^(7*(k-1)); thresholds for k = 2..10
_BYTE_THRESHOLDS = (np.uint64(1) << (np.uint64(7) * np.arange(1, 10, dtype=np.uint64)))


def vbyte_encode_offsets(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """VByte-encode a non-negative int array.

    Returns ``(bytes_u8, ends)`` where ``ends[i]`` is the byte offset one
    past value i — callers slice the single buffer into contiguous runs
    (e.g. one slice per 128-entry posting block) with zero re-encoding.
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # bytes per value in ONE pass (values below 2^(7k) need k bytes) — a
    # bit-length loop here would make ~40 full-array passes and saturate
    # memory bandwidth when many merge workers run concurrently
    nbytes = np.searchsorted(_BYTE_THRESHOLDS, v, side="right") + 1
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    out = np.zeros(total, dtype=np.uint8)
    starts = ends - nbytes
    shifted = v.copy()
    maxb = int(nbytes.max())
    for j in range(maxb):
        sel = nbytes > j
        out[starts[sel] + j] = (shifted[sel] & np.uint64(0x7F)).astype(np.uint8)
        shifted = shifted >> np.uint64(7)
    out[ends - 1] |= 0x80  # terminator bit on the last byte of each value
    return out, ends


def vbyte_encode(values: np.ndarray) -> bytes:
    """VByte-encode a non-negative int array."""
    out, _ends = vbyte_encode_offsets(values)
    return out.tobytes()


def vbyte_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    data = np.frombuffer(buf, dtype=np.uint8)
    if data.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(data & 0x80)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    values = np.zeros(len(ends), dtype=np.uint64)
    maxb = int(lengths.max())
    for j in range(maxb):
        sel = lengths > j
        values[sel] |= (data[starts[sel] + j] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    if count is not None and len(values) != count:
        raise ValueError(f"decoded {len(values)} values, expected {count}")
    return values


def sliced_binary(data: np.ndarray, value_ends: np.ndarray, run_starts: np.ndarray, n_values: int):
    """Zero-copy Arrow BinaryArray: one slice of a shared encode buffer per
    run of values (runs = posting rows / blocks).  ``run_starts`` are value
    indices; byte boundaries come from ``value_ends``."""
    import pyarrow as pa

    if n_values and int(value_ends[-1]) > np.iinfo(np.int32).max:
        # pa.binary() offsets are int32; a silent wrap would corrupt posting
        # blocks.  Reachable only with user-forced term_buckets / extreme
        # skew — the auto bucket sizing keeps groups ~0.5 MiB (ADVICE r1).
        raise ValueError(
            f"encoded payload ({int(value_ends[-1])} bytes) exceeds the 2 GiB "
            "binary-offset limit for one merge group; increase term_buckets "
            "(or leave it on auto sizing)"
        )
    n_runs = len(run_starts)
    offsets = np.empty(n_runs + 1, dtype=np.int32)
    starts_prev = run_starts - 1
    byte_starts = np.where(run_starts > 0, value_ends[starts_prev], 0)
    offsets[:-1] = byte_starts
    offsets[-1] = value_ends[-1] if n_values else 0
    return pa.Array.from_buffers(
        pa.binary(),
        n_runs,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())],
    )


def encode_rows(values: np.ndarray, row_starts: np.ndarray, delta: bool):
    """One VByte pass over ``values`` (optionally delta-gapped with the gap
    stream restarting at each row), sliced zero-copy into one binary cell
    per row.  The inverse of ``decode_concat_rows``."""
    if delta:
        v = np.asarray(values, dtype=np.int64)
        gaps = v.copy()
        if len(v):
            gaps[1:] -= v[:-1]
            gaps[row_starts] = v[row_starts]
            if len(v) > 1 and gaps.min() < 0:
                raise ValueError("values must be ascending within each row")
        payload = gaps.astype(np.uint64)
    else:
        payload = np.asarray(values, dtype=np.uint64)
    data, ends = vbyte_encode_offsets(payload)
    return sliced_binary(data, ends, row_starts, len(payload))


def _concat_binary_bytes(col) -> bytes:
    """Contiguous bytes of a (Large)BinaryArray's rows in row order
    (zero-copy)."""
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data[offs[0] : offs[-1]]


def decode_concat_rows(col, n_per_row: np.ndarray, delta: bool) -> np.ndarray:
    """Decode a column of per-row VByte cells into one flat value array
    (values in row order).  For delta cells the absolute values are
    reconstructed per row with a single vectorized cumsum."""
    flat = _concat_binary_bytes(col)
    total = int(n_per_row.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    vals = vbyte_decode(flat, total)
    if not delta:
        return vals.astype(np.int64)
    cum = np.cumsum(vals.astype(np.int64))
    row_ends = np.cumsum(n_per_row)
    bases = np.repeat(
        np.concatenate(([0], cum[row_ends[:-1] - 1])), n_per_row
    )
    return cum - bases


# --------------------------------------------------------------------------
# Byte-aligned fixed-width block codec ("fixed")
# --------------------------------------------------------------------------
# Each cell (posting block / segment row) is laid out as
#   [1 header byte: width in {1,2,4,8}] [n * width bytes, little-endian]
# with the width chosen per cell from its max value.  The classic
# decode-speed/size trade against VByte (Lucene's Direct8/16/32 packed
# formats make the same one): decode is a plain strided byte gather with
# NO terminator-bit scan, so it runs at memcpy-class speed; size is within
# ~1 byte/value of VByte for gap distributions (web-scale doc-gap streams
# are dominated by 1-2 byte gaps where the per-cell width rounds up).
# The codec is chosen per index at build time (BuildConfig.codec), recorded
# in stats.json, and auto-detected by every reader; search results are
# bit-identical across codecs (test-pinned).

CODEC_NAMES = ("vbyte", "fixed")


def _fixed_width_of(maxima: np.ndarray) -> np.ndarray:
    m = np.asarray(maxima, dtype=np.uint64)
    return np.select(
        [m < np.uint64(1) << np.uint64(8),
         m < np.uint64(1) << np.uint64(16),
         m < np.uint64(1) << np.uint64(32)],
        [1, 2, 4],
        8,
    ).astype(np.int64)


def fixed_encode_cells(values: np.ndarray, row_starts: np.ndarray):
    """Encode rows of non-negative ints as fixed-width cells (one Arrow
    binary cell per row).  Rows must be non-empty."""
    import pyarrow as pa

    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    row_starts = np.asarray(row_starts, dtype=np.int64)
    n_rows = len(row_starts)
    if n_rows == 0:
        return pa.array([], pa.binary())
    row_ends = np.empty(n_rows, np.int64)
    row_ends[:-1] = row_starts[1:]
    row_ends[-1] = n
    lens = row_ends - row_starts
    if n and lens.min() < 1:
        raise ValueError("fixed codec cells must be non-empty rows")
    rmax = np.maximum.reduceat(v, row_starts) if n else np.zeros(n_rows, np.uint64)
    width = _fixed_width_of(rmax)
    cell_bytes = 1 + lens * width
    cell_offsets = np.concatenate(([0], np.cumsum(cell_bytes)))
    total = int(cell_offsets[-1])
    if total > np.iinfo(np.int32).max:
        raise ValueError(
            f"encoded payload ({total} bytes) exceeds the 2 GiB binary-offset "
            "limit for one merge group; increase term_buckets"
        )
    out = np.zeros(total, dtype=np.uint8)
    out[cell_offsets[:-1]] = width.astype(np.uint8)
    if n:
        v8 = v.astype("<u8").view(np.uint8).reshape(n, 8)
        row_of = np.repeat(np.arange(n_rows), lens)
        pos = (
            cell_offsets[row_of]
            + 1
            + (np.arange(n) - row_starts[row_of]) * width[row_of]
        )
        for w in (1, 2, 4, 8):
            sel = width[row_of] == w
            if not sel.any():
                continue
            idx = pos[sel]
            src = v8[sel]
            for j in range(w):
                out[idx + j] = src[:, j]
    return pa.Array.from_buffers(
        pa.binary(),
        n_rows,
        [None, pa.py_buffer(cell_offsets.astype(np.int32).tobytes()), pa.py_buffer(out.tobytes())],
    )


def fixed_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode ONE fixed-width cell (header byte + payload)."""
    data = np.frombuffer(buf, dtype=np.uint8)
    if data.size == 0:
        return np.empty(0, dtype=np.uint64)
    w = int(data[0])
    payload = data[1:]
    if w not in (1, 2, 4, 8) or len(payload) % w:
        raise ValueError(f"corrupt fixed cell: width={w}, payload={len(payload)}")
    n = len(payload) // w
    if count is not None and n != count:
        raise ValueError(f"decoded {n} values, expected {count}")
    out8 = np.zeros((n, 8), dtype=np.uint8)
    out8[:, :w] = payload.reshape(n, w)
    return out8.view("<u8").ravel()


_WIDTH_DTYPE = {1: np.dtype(np.uint8), 2: np.dtype("<u2"), 4: np.dtype("<u4"), 8: np.dtype("<u8")}


def _gather_fixed(data: np.ndarray, byte_starts: np.ndarray, w: int) -> np.ndarray:
    """Gather ``len(byte_starts)`` little-endian ``w``-byte values out of
    ``data`` with ONE fancy-index + a zero-copy dtype view."""
    m = len(byte_starts)
    if w == 1:
        return data[byte_starts].astype(np.uint64)
    idx = (byte_starts[:, None] + np.arange(w, dtype=np.int64)).ravel()
    return data[idx].view(_WIDTH_DTYPE[w]).astype(np.uint64, copy=False).reshape(m)


def fixed_decode_cells(col, n_per_row: np.ndarray) -> np.ndarray:
    """Decode a column of fixed-width cells into one flat uint64 array
    (values in row order) — one byte gather per width actually present.

    Fast path: when every cell shares one width (the normal case for
    doc-gap streams, where 1- or 2-byte widths dominate) the whole decode
    is a single gather + little-endian view — no per-value branch, no
    terminator-bit scan."""
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    n_rows = len(arr)
    lens = np.asarray(n_per_row, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64)
    cell_starts = offs[:-1]
    width = data[cell_starts].astype(np.int64)
    row_ends = np.cumsum(lens)
    row_out_starts = row_ends - lens
    w0 = int(width[0])
    if (width == w0).all():
        # single-width fast path: value byte-starts across all cells
        val_row = np.repeat(np.arange(n_rows), lens)
        within = np.arange(total, dtype=np.int64) - np.repeat(row_out_starts, lens)
        byte_starts = cell_starts[val_row] + 1 + within * w0
        return _gather_fixed(data, byte_starts, w0)
    out = np.empty(total, dtype=np.uint64)
    for w in (1, 2, 4, 8):
        rows = np.flatnonzero(width == w)
        if not len(rows):
            continue
        rl = lens[rows]
        m = int(rl.sum())
        if m == 0:
            continue
        grp_ends = np.cumsum(rl)
        grp_starts = grp_ends - rl
        within = np.arange(m, dtype=np.int64) - np.repeat(grp_starts, rl)
        byte_starts = np.repeat(cell_starts[rows] + 1, rl) + within * w
        vals = _gather_fixed(data, byte_starts, w)
        out_pos = np.repeat(row_out_starts[rows], rl) + within
        out[out_pos] = vals
    return out


def encode_cells(values: np.ndarray, row_starts: np.ndarray, delta: bool, codec: str = "vbyte"):
    """Codec-dispatching row encoder (the writer-side seam): VByte or
    fixed-width cells, with the same per-row delta-gapping semantics."""
    if codec == "vbyte":
        return encode_rows(values, row_starts, delta)
    if codec != "fixed":
        raise ValueError(f"unknown postings codec {codec!r}")
    if delta:
        v = np.asarray(values, dtype=np.int64)
        gaps = v.copy()
        if len(v):
            gaps[1:] -= v[:-1]
            gaps[row_starts] = v[row_starts]
            if len(v) > 1 and gaps.min() < 0:
                raise ValueError("values must be ascending within each row")
        payload = gaps.astype(np.uint64)
    else:
        payload = np.asarray(values, dtype=np.uint64)
    return fixed_encode_cells(payload, np.asarray(row_starts, dtype=np.int64))


def decode_cells(col, n_per_row: np.ndarray, delta: bool, codec: str = "vbyte") -> np.ndarray:
    """Codec-dispatching row decoder — inverse of ``encode_cells``."""
    if codec == "vbyte":
        return decode_concat_rows(col, n_per_row, delta)
    if codec != "fixed":
        raise ValueError(f"unknown postings codec {codec!r}")
    vals = fixed_decode_cells(col, n_per_row)
    if not delta:
        return vals.astype(np.int64)
    n_per_row = np.asarray(n_per_row, dtype=np.int64)
    cum = np.cumsum(vals.astype(np.int64))
    row_ends = np.cumsum(n_per_row)
    bases = np.repeat(np.concatenate(([0], cum[row_ends[:-1] - 1])), n_per_row)
    return cum - bases


def decode_one(buf: bytes, count: int | None, codec: str) -> np.ndarray:
    """Decode one non-delta cell with the given codec."""
    return vbyte_decode(buf, count) if codec == "vbyte" else fixed_decode(buf, count)


def decode_one_delta(buf: bytes, count: int | None, codec: str) -> np.ndarray:
    """Decode one delta-gapped cell (ascending ids) with the given codec."""
    gaps = decode_one(buf, count, codec)
    return np.cumsum(gaps.astype(np.int64))


def index_codec(index_dir: str) -> str:
    """The postings codec an index was built with (stats.json; indexes
    written before the codec field default to vbyte)."""
    import json
    import os

    with open(os.path.join(index_dir, "stats.json")) as fh:
        return json.load(fh).get("codec", "vbyte")


def delta_encode(doc_ids: np.ndarray) -> bytes:
    """Delta-gap (strictly ascending ids) then VByte."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    if ids.size == 0:
        return b""
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    if ids.size > 1 and gaps[1:].min() <= 0:
        raise ValueError("doc_ids must be strictly ascending")
    return vbyte_encode(gaps.astype(np.uint64))


def delta_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    gaps = vbyte_decode(buf, count)
    return np.cumsum(gaps.astype(np.int64))
