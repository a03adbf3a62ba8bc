"""HTML -> text extraction, the engine's analogue of the reference's
TREC doc-boundary parser (/root/reference/src/Indexing/Parser.cs:14-110).

The `pages.html` column wraps `pages.text` in a deterministic template
(``html_from_text``): escaped paragraph lines inside ``<p id=.. class=..>``
tags, optional comment noise between paragraphs, a head/title section that
never contains document text.  Extraction is defined by the five
regex+replace steps below; the scalar oracle and the vectorized Arrow
kernel share the same spec and must produce BYTE-IDENTICAL ``text`` per
``url`` (the north-rule per-row invariant; property-tested).

All regexes are RE2-compatible (pyarrow) and Python-re-compatible with the
same match semantics (lazy ``.*?``, anchored alternation, no backrefs).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# Escaping used by the template (order matters: & first on escape,
# & last on unescape).
_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]

_RE_HEAD = r"(?s)^.*?<body>"
_RE_TAIL = r"(?s)</body>.*$"
_RE_PARA_SEP = r"</p>(?:<!--[^>]*-->)?<p [^>]*>"
_RE_PARA_EDGE = r"^<p [^>]*>|</p>$"


def escape_text(s: str) -> str:
    for raw, esc in _ESCAPES:
        s = s.replace(raw, esc)
    return s


def html_from_text(
    text: str,
    title: str,
    noise_seed: int = 0,
    links: list[tuple[str, str]] | None = None,
) -> bytes:
    """Deterministic, exactly-invertible HTML wrapper for one page.

    ``links`` (optional ``[(url, raw_anchor), ...]``) are embedded as a
    ``<nav>`` block inside ``<head>`` (links.py grammar).  Extraction strips
    everything up to ``<body>``, so the extracted text is byte-identical
    with or without links; ``links=None`` produces byte-identical html to
    the pre-links template (cache/golden stability)."""
    from .links import nav_html  # local import: avoid a cycle at module load

    lines = text.split("\n")
    parts = [
        "<html><head><title>",
        escape_text(title),
        '</title><meta charset="utf-8">',
        nav_html(links) if links else "",
        "</head><body>",
    ]
    for i, line in enumerate(lines):
        if i > 0 and (noise_seed + i) % 3 == 0:
            parts.append(f"<!--noise {noise_seed & 0xFFFF}:{i}-->")
        parts.append(f'<p id="p{i}" class="c{i % 7}">{escape_text(line)}</p>')
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def extract_text_oracle(html: bytes) -> str:
    """Scalar reference extraction — the spec the vectorized kernel must match."""
    s = html.decode("utf-8")
    s = re.sub(_RE_HEAD, "", s)
    s = re.sub(_RE_TAIL, "", s)
    s = re.sub(_RE_PARA_SEP, "\n", s)
    s = re.sub(_RE_PARA_EDGE, "", s)
    for raw, esc in _ESCAPES[::-1]:
        s = s.replace(esc, raw)
    return s


def extract_text_batch(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized extraction over an Arrow binary/string column (zero-copy in)."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    s = html if pa.types.is_string(html.type) or pa.types.is_large_string(html.type) else html.cast(pa.string())
    s = pc.replace_substring_regex(s, pattern=_RE_HEAD, replacement="")
    s = pc.replace_substring_regex(s, pattern=_RE_TAIL, replacement="")
    s = pc.replace_substring_regex(s, pattern=_RE_PARA_SEP, replacement="\n")
    s = pc.replace_substring_regex(s, pattern=_RE_PARA_EDGE, replacement="")
    for raw, esc in _ESCAPES[::-1]:
        s = pc.replace_substring(s, pattern=esc, replacement=raw)
    return s
