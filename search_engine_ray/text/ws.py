"""Portable tokenization constants shared by the engine and the DuckDB
oracle SQL in ``__ray_entry__.py``.

Why this module exists: the engine's whitespace-tokenized operators
(token counts, quality/Gopher signals, sequence packing, DSIR hashing)
used ``\\s`` / ``\\S``, relying on Arrow's bundled RE2 and DuckDB's
bundled RE2 agreeing on the Perl class. They do agree in this sandbox
(Arrow 16.1 / DuckDB 1.0 both treat ``\\s`` as ``[\\t\\n\\f\\r ]``), but
the class changed across RE2 vintages (``\\v`` membership), so on a host
with a different Arrow/DuckDB pairing the same text tokenizes
differently and every integer-exact driver gate built on it diverges
(round-3 verdict, wrong-item #1). The fix is to spell the class out:
ONE escaped pattern string, used verbatim as the Arrow RE2 pattern and
embedded verbatim in the oracle SQL literals, so there is no ``\\s`` left
to disagree about.

The class is ``[\\t\\n\\v\\f\\r ]`` — Python ``str.split()`` / C
``isspace`` ASCII whitespace.  Escapes are kept in backslash form
(``\\x0B`` not a literal VT byte) so the identical byte string survives
both Python source and SQL string literals; RE2 interprets the escapes
on each side.

ASCII case folding: the engine lowercases with ``pc.ascii_lower`` (the
reference's M3 casefold is ASCII-only). DuckDB ``lower()`` is full
Unicode — identical on ASCII but not on e.g. fullwidth letters — so the
oracle must use ``translate(expr, 'A..Z', 'a..z')``; ``sql_ascii_lower``
renders that.
"""

from __future__ import annotations

# Escaped class interior: tab, newline, vertical tab, form feed, carriage
# return, space.  Identical byte sequence for Arrow RE2 and DuckDB RE2.
WS_CHARS = r"\t\n\x0B\x0C\r "

# Run of whitespace (split pattern) / run of non-whitespace (token pattern).
WS_RE = rf"[{WS_CHARS}]+"
NONWS_RE = rf"[^{WS_CHARS}]+"

_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"


def sql_ascii_lower(expr: str) -> str:
    """DuckDB expression equal to pyarrow.compute.ascii_lower(expr)."""
    return f"translate({expr}, '{_UPPER}', '{_LOWER}')"


def ws_token_flat(texts):
    """Flattened non-empty whitespace tokens of a string column — THE
    pinned tokenize-and-flatten sequence every whitespace-counting
    operator (heavy hitters, BPE word counts) must share, so a class or
    null-handling change lands everywhere at once.

    Accepts a pyarrow Array/ChunkedArray, returns a combined pyarrow
    StringArray."""
    import pyarrow as pa
    import pyarrow.compute as pc

    lists = pc.split_pattern_regex(pc.fill_null(texts, ""), pattern=WS_RE)
    flat = pc.list_flatten(lists)
    flat = flat.filter(pc.greater(pc.binary_length(flat), 0))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat


def ws_token_flat_with_row(texts):
    """(flat non-empty tokens, row index per token) — the ws_token_flat
    sequence plus provenance, for operators that need each token tied
    back to its source row (grouped counts).  Same pinned class and
    null handling."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    lists = pc.split_pattern_regex(pc.fill_null(texts, ""), pattern=WS_RE)
    flat = pc.list_flatten(lists)
    lens = np.asarray(pc.list_value_length(lists), dtype=np.int64)
    rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    keep = np.asarray(pc.greater(pc.binary_length(flat), 0))
    flat = flat.filter(pa.array(keep))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat, rows[keep]
