"""URL operators for web-corpus curation: normalization, host extraction,
registered-domain heuristic.

A Common-Crawl-style pipeline keys dedup, per-domain caps, and blocklists
on a CANONICAL url — so normalization must be deterministic and cheap.
Everything here is a chain of vectorized RE2 kernels
(``pc.extract_regex`` / ``pc.replace_substring_regex``) over the whole
batch; the identical patterns run in DuckDB ``regexp_extract`` /
``regexp_replace``, so the driver gate value-hash checks every rule.

Normalization rules (each one a standard canonicalization step):

1. strip the fragment (``#...``);
2. lowercase scheme and authority (path/query case is preserved —
   it is significant on most servers);
3. strip userinfo (``user:pw@``);
4. strip the default port (``:80`` for http, ``:443`` for https;
   non-default ports are kept);
5. remove tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``) and tidy the separators left behind.

The registered-domain heuristic takes the last two host labels, or the
last three when the two-label suffix is a known multi-label public suffix
(``co.uk`` etc.) — a deterministic stand-in for the full public-suffix
list, which is a data file, not an algorithm; swap ``_MULTI_SUFFIXES``
for the real list in production.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# scheme://authority rest  (authority = up to first / ? #); named groups —
# pc.extract_regex returns a struct with one field per NAMED group
_URL_RE = r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<auth>[^/?#]*)(?P<rest>[^#]*)"
_TRACKING_RE = r"([?&])(utm_[A-Za-z0-9_]+|fbclid|gclid|ref)=[^&]*"

_MULTI_SUFFIXES = (
    "co.uk", "ac.uk", "org.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "co.in", "co.kr", "com.cn",
)
_SUFFIX_ALT = "|".join(s.replace(".", r"\.") for s in _MULTI_SUFFIXES)
# last-3-labels when the 2-label tail is a multi-label suffix, else last 2
_DOMAIN3_RE = rf"(?P<d>[^.]+\.(?:{_SUFFIX_ALT}))$"
_DOMAIN2_RE = r"(?P<d>[^.]+\.[^.]+)$"


def _str_col(batch: pa.Table, column: str) -> pa.Array:
    col = batch[column]
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return pc.fill_null(arr, "")


def _clean_rest(rest: pa.Array) -> pa.Array:
    """Drop tracking params from the path+query part and tidy separators."""
    rest = pc.replace_substring_regex(rest, pattern=_TRACKING_RE, replacement=r"\1")
    rest = pc.replace_substring_regex(rest, pattern=r"\?&", replacement="?")
    rest = pc.replace_substring_regex(rest, pattern=r"&&+", replacement="&")
    return pc.replace_substring_regex(rest, pattern=r"[?&]$", replacement="")


def url_parts_batch(
    batch: pa.Table,
    url_column: str = "url",
    keep_columns: tuple[str, ...] = (),
) -> pa.Table:
    """Per-row ``url_norm`` / ``host`` / ``domain`` columns.

    Rows that do not parse as ``scheme://authority...`` get null host and
    domain and pass through with ``url_norm`` = the raw input — a
    curation pipeline filters or quarantines them downstream; silently
    dropping rows inside a map stage would corrupt per-partition counts.
    """
    urls = _str_col(batch, url_column)
    parts = pc.extract_regex(urls, pattern=_URL_RE)
    matched = pc.is_valid(parts)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    authority = pc.utf8_lower(pc.struct_field(parts, "auth"))
    rest = pc.struct_field(parts, "rest")

    # userinfo off, then default port off (conditionally on the scheme)
    authority = pc.replace_substring_regex(authority, pattern=r"^[^/@]*@", replacement="")
    http80 = pc.and_(pc.equal(scheme, "http"), pc.match_substring_regex(authority, r":80$"))
    https443 = pc.and_(pc.equal(scheme, "https"), pc.match_substring_regex(authority, r":443$"))
    stripped = pc.replace_substring_regex(authority, pattern=r":\d+$", replacement="")
    authority = pc.if_else(pc.or_(http80, https443), stripped, authority)
    host = pc.replace_substring_regex(authority, pattern=r":\d+$", replacement="")

    rest = _clean_rest(rest)
    # last positional arg of binary_join_element_wise is the separator
    rebuilt = pc.binary_join_element_wise(scheme, "://", authority, rest, "")
    url_norm = pc.if_else(matched, rebuilt, urls)

    d3 = pc.extract_regex(host, pattern=_DOMAIN3_RE)
    d2 = pc.extract_regex(host, pattern=_DOMAIN2_RE)
    domain = pc.if_else(
        pc.is_valid(d3),
        pc.struct_field(d3, "d"),
        pc.if_else(pc.is_valid(d2), pc.struct_field(d2, "d"), host),
    )

    cols = {c: batch[c] for c in keep_columns}
    cols["url_norm"] = url_norm
    cols["host"] = pc.if_else(matched, host, pa.nulls(len(urls), pa.string()))
    cols["domain"] = pc.if_else(matched, domain, pa.nulls(len(urls), pa.string()))
    return pa.table(cols)


def url_parts(ds: ray.data.Dataset, **kw) -> ray.data.Dataset:
    return ds.map_batches(url_parts_batch, fn_kwargs=kw, batch_format="pyarrow")


def domain_stats(
    ds: ray.data.Dataset,
    url_column: str = "url",
) -> ray.data.Dataset:
    """Docs per registered domain — the input to per-domain caps and
    blocklist joins.  One map pass + one native groupby count."""
    from ray.data.aggregate import Count

    parts = url_parts(ds, url_column=url_column)
    return parts.groupby("domain").aggregate(Count(alias_name="n_docs"))


def cap_per_domain(
    ds: ray.data.Dataset,
    n: int,
    url_column: str = "url",
    order_column: str = "doc_id",
    keep_columns: tuple[str, ...] = ("doc_id",),
) -> ray.data.Dataset:
    """Keep at most ``n`` docs per registered domain (ordered by
    ``order_column`` ascending) — the standard anti-boilerplate /
    anti-SEO-farm cap.  Reuses the head_per_key two-phase shape: per-batch
    partial heads bound the shuffle to n rows per (domain, batch)."""
    from .sample import head_per_key

    parts = url_parts(ds, url_column=url_column, keep_columns=keep_columns)
    return head_per_key(parts, "domain", n, order_column=order_column)


def filter_blocked_domains(
    ds: ray.data.Dataset,
    blocked,
    url_column: str = "url",
) -> ray.data.Dataset:
    """Crawl blocklist filter (the UT1/adult-list step in CCNet /
    RefinedWeb): DROP rows whose registered domain is in ``blocked``
    (exact match on the same registered-domain rule as url_parts_batch).
    Rows whose url does not parse (null domain) pass through — the
    quarantine-downstream convention of url_parts_batch.

    The blocklist broadcasts ONCE via ``ray.put`` (industry lists are a
    few million entries — tens of MB, the canonical broadcast-small-side
    case); one stateless vectorized pass per batch, no shuffle."""
    blocked = sorted({str(b) for b in blocked})
    blocked_ref = ray.put(pa.array(blocked, pa.string()))

    class BlockFilter:
        def __init__(self):
            self.blocked = ray.get(blocked_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            parts = url_parts_batch(batch, url_column=url_column)
            hit = pc.is_in(parts["domain"], value_set=self.blocked)
            keep = pc.or_kleene(pc.invert(hit), pc.is_null(hit))
            return batch.filter(pc.fill_null(keep, True))

    return ds.map_batches(BlockFilter, concurrency=(1, 4), batch_format="pyarrow")
