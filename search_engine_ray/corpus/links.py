"""Web link graph: deterministic nav-link synthesis + vectorized ``<a href>``
extraction.

A real Common-Crawl page carries its outlinks in the html payload; the
text-extraction step throws them away.  This module keeps both halves
honest over the synthetic corpus:

* ``nav_links_for_doc`` derives each page's outlinks as a pure function of
  ``(doc_id, n_docs)`` — closed-form, so a SQL oracle can recompute the
  expected edge list without parsing html (``__ray_entry__`` gates
  ``link_graph`` / ``host_degree`` / ``anchor_agg`` this way).
* ``extract.html_from_text(..., links=...)`` embeds them as a ``<nav>``
  block INSIDE ``<head>`` — the extraction regexes strip everything up to
  ``<body>``, so the north-rule invariant (byte-identical extracted text
  per url) is untouched by the presence of links (property-tested in
  tests/test_links.py).
* ``extract_links_batch`` parses the anchors back out of an Arrow
  binary/string column with NO per-row Python: one ``split_pattern`` on the
  literal ``<a href="`` delimiter, offsets-derived parent indices, one
  anchored ``extract_regex`` over the flattened segments, vectorized
  unescaping.  ``extract_links_oracle`` is the scalar ``re`` reference spec
  the kernel must match (hypothesis-tested).

Template grammar (shared with the generator): ``<a href="URL">ANCHOR</a>``
where URL contains none of ``"&<>`` (the synthetic urls are plain ASCII
path urls) and ANCHOR is escaped with the same 3-entity table as body text
(&amp; &lt; &gt;), so anchors round-trip arbitrary ``&<>`` characters.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .extract import _ESCAPES, escape_text

# Anchor vocabulary — indexed by dst % len via a closed-form the SQL
# oracle replicates with a list literal.  Gives anchor-field ranking
# (bm25_anchor_top10) a meaningful tf/df distribution.
ANCHOR_WORDS = (
    "alpha", "beta", "gamma", "delta", "spark", "hash", "join", "merge",
    "stream", "window", "batch", "table", "scan", "sort", "index", "query",
)

_LINK_DELIM = '<a href="'
_LINK_TAIL_RE = r'^(?P<dst>[^"]*)">(?P<anchor>[^<]*)</a>'
_LINK_FINDALL = re.compile(r'<a href="([^"]*)">([^<]*)</a>')


def link_targets_for_doc(doc_id: int, n_docs: int) -> list[tuple[int, int]]:
    """The closed-form outlink rule: page ``i`` has ``i % 4`` outlinks;
    link ``j`` (1-based) targets doc ``(i*31 + 97*j*j + 7) % n_docs``.
    Returns ``[(j, dst_doc), ...]``."""
    k = doc_id % 4
    return [(j, (doc_id * 31 + 97 * j * j + 7) % n_docs) for j in range(1, k + 1)]


def link_url(dst_doc: int) -> str:
    """Target url for a doc id — host ``site{dst % 997}.example`` (the
    corpus' own host scheme, pages.py:132)."""
    return f"https://site{dst_doc % 997}.example/d{dst_doc}"


def link_anchor(dst_doc: int, j: int) -> str:
    """Raw (unescaped) anchor text: ``{word} & doc {dst} ref{j}`` — the
    ``&`` exercises entity round-tripping end to end."""
    return f"{ANCHOR_WORDS[dst_doc % len(ANCHOR_WORDS)]} & doc {dst_doc} ref{j}"


def nav_links_for_doc(doc_id: int, n_docs: int) -> list[tuple[str, str]]:
    """``[(url, raw_anchor), ...]`` for one page under the closed-form rule."""
    return [
        (link_url(dst), link_anchor(dst, j))
        for j, dst in link_targets_for_doc(doc_id, n_docs)
    ]


def nav_html(links: list[tuple[str, str]]) -> str:
    """The ``<nav>`` block for the head section; empty string for no links."""
    if not links:
        return ""
    parts = ["<nav>"]
    for url, anchor in links:
        parts.append(f'<a href="{url}">{escape_text(anchor)}</a>')
    parts.append("</nav>")
    return "".join(parts)


def extract_links_oracle(html: bytes | str) -> list[tuple[str, str]]:
    """Scalar reference extraction: all ``(href, unescaped_anchor)`` pairs
    in document order — the spec ``extract_links_batch`` must match."""
    s = html.decode("utf-8") if isinstance(html, bytes) else html
    out = []
    for dst, anchor in _LINK_FINDALL.findall(s):
        for raw, esc in _ESCAPES[::-1]:
            anchor = anchor.replace(esc, raw)
        out.append((dst, anchor))
    return out


def extract_links_batch(
    html: pa.Array | pa.ChunkedArray,
) -> tuple[np.ndarray, pa.Array, pa.Array]:
    """Vectorized multi-link extraction over an Arrow binary/string column.

    Returns ``(parent_row_indices, dst_urls, anchors)`` where
    ``parent_row_indices[i]`` is the input row that produced link ``i``
    (links kept in document order within a row).  Zero-copy in; the only
    Python-level work is Arrow kernel dispatch — no per-row loop.
    """
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    s = (
        html
        if pa.types.is_string(html.type) or pa.types.is_large_string(html.type)
        else html.cast(pa.string())
    )
    segs = pc.split_pattern(s, pattern=_LINK_DELIM)  # list<string>
    flat = pc.list_flatten(segs)
    counts = pc.list_value_length(segs).to_numpy(zero_copy_only=False)
    counts = np.nan_to_num(counts, nan=0).astype(np.int64)
    parents = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    # the first segment of each row precedes any link — mask it out
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    first_mask = np.zeros(int(offsets[-1]), dtype=bool)
    first_mask[offsets[:-1][counts > 0]] = True
    keep = ~first_mask
    flat = flat.filter(pa.array(keep))
    parents = parents[keep]
    m = pc.extract_regex(flat, pattern=_LINK_TAIL_RE)
    valid = pc.is_valid(m).to_numpy(zero_copy_only=False)
    m = m.filter(pa.array(valid))
    parents = parents[valid]
    dst = pc.struct_field(m, "dst")
    anchor = pc.struct_field(m, "anchor")
    for raw, esc in _ESCAPES[::-1]:
        anchor = pc.replace_substring(anchor, pattern=esc, replacement=raw)
    return parents, dst, anchor
