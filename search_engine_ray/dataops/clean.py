"""Corpus-cleaning operators for training-data pipelines: benchmark
decontamination, PII redaction, repetition signals.

All are single-pass vectorized ``map_batches`` kernels; decontamination
broadcasts its (small) test-set shingle table ONCE via ``ray.put`` and does
a vectorized membership test per batch — the canonical broadcast-small-side
pattern, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .dedup import _shingle_hashes, _token_lists

# PII patterns (RE2-compatible — the SAME regex strings run in DuckDB's
# regexp_replace, so redaction is SQL-reproducible).  Order matters: emails
# before phones (an email's digits must not be half-eaten by the phone rule).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{3}[-.]){2}\d{4}\b", "<PHONE>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def redact_pii(
    ds: ray.data.Dataset,
    text_column: str = "text",
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
) -> ray.data.Dataset:
    """Replace emails/phones/IPv4s with typed placeholder tokens (chained
    vectorized regex passes)."""

    def scrub(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch[text_column], "")
        for pattern, repl in patterns:
            col = pc.replace_substring_regex(col, pattern=pattern, replacement=repl)
        i = batch.column_names.index(text_column)
        return batch.set_column(i, text_column, col)

    return ds.map_batches(scrub, batch_format="pyarrow")


def test_set_shingles(test_texts: list[str], n: int = 8) -> np.ndarray:
    """The benchmark side of decontamination: distinct word-n-gram hashes
    of the held-out texts (tiny; computed on the driver, broadcast once)."""
    tok, offs = _token_lists(pa.array(test_texts, pa.string()))
    sh, _ = _shingle_hashes(tok, offs, n, short_mode="whole")
    return np.unique(sh)


def decontaminate(
    ds: ray.data.Dataset,
    test_texts: list[str],
    n: int = 8,
    text_column: str = "text",
    id_column: str = "doc_id",
    mode: str = "flag",
) -> ray.data.Dataset:
    """Benchmark decontamination: find corpus docs sharing ANY word-n-gram
    with the held-out test set.

    ``mode="flag"`` emits (doc_id, contaminated, n_hits); ``mode="drop"``
    returns the clean corpus.  The test shingle set is broadcast via
    ``ray.put`` (read once per task, never re-shipped per batch); each
    batch does one vectorized np.isin over its shingles — no shuffle."""
    test_sh = test_set_shingles(test_texts, n=n)
    test_ref = ray.put(test_sh)

    def check(batch: pa.Table) -> pa.Table:
        tset = ray.get(test_ref)
        texts = batch[text_column]
        texts = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
        tok, offs = _token_lists(texts)
        sh, sh_offs = _shingle_hashes(tok, offs, n, short_mode="drop")
        hits = np.isin(sh, tset)
        lens = np.diff(sh_offs)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        n_hits = np.bincount(doc_idx[hits], minlength=len(lens)).astype(np.int64)
        if mode == "drop":
            return batch.filter(pa.array(n_hits == 0))
        return pa.table(
            {
                "doc_id": batch[id_column],
                "contaminated": pa.array(n_hits > 0),
                "n_hits": pa.array(n_hits),
            }
        )

    return ds.map_batches(check, batch_format="pyarrow")


def repetition_stats(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """Within-document repetition signals (Gopher-style quality filters):
    line counts and the distinct-line fraction, plus the duplicate-token
    fraction — one vectorized pass, no per-doc Python."""

    def stats(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_column], "")
        n = len(texts)
        lines = pc.split_pattern(texts, pattern="\n")
        flat = pc.list_flatten(lines)
        lens_pre = np.asarray(pc.list_value_length(lines), dtype=np.int64)
        doc_idx = np.repeat(np.arange(n), lens_pre)
        nonempty = np.asarray(pc.not_equal(flat, ""))
        n_lines = np.bincount(doc_idx[nonempty], minlength=n).astype(np.int64)

        # distinct nonempty lines per doc: hash lines via dictionary codes,
        # then the lexsort+unique run-length pass
        denc = pc.dictionary_encode(flat)
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        codes = np.asarray(denc.indices, dtype=np.int64)
        d = doc_idx[nonempty]
        c = codes[nonempty]
        if len(d):
            order = np.lexsort((c, d))
            ds_, cs_ = d[order], c[order]
            first = np.empty(len(order), dtype=bool)
            first[0] = True
            np.logical_or(ds_[1:] != ds_[:-1], cs_[1:] != cs_[:-1], out=first[1:])
            n_distinct = np.bincount(ds_[first], minlength=n).astype(np.int64)
        else:
            n_distinct = np.zeros(n, dtype=np.int64)

        # duplicate-token fraction
        tok, offs = _token_lists(
            texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
        )
        tlens = np.diff(offs)
        tdoc = np.repeat(np.arange(n), tlens)
        if len(tok):
            order = np.lexsort((tok, tdoc))
            td, tv = tdoc[order], tok[order]
            first = np.empty(len(order), dtype=bool)
            first[0] = True
            np.logical_or(td[1:] != td[:-1], tv[1:] != tv[:-1], out=first[1:])
            tok_distinct = np.bincount(td[first], minlength=n).astype(np.int64)
        else:
            tok_distinct = np.zeros(n, dtype=np.int64)

        return pa.table(
            {
                "doc_id": batch[id_column],
                "n_lines": pa.array(n_lines),
                "n_distinct_lines": pa.array(n_distinct),
                "n_tokens": pa.array(tlens.astype(np.int64)),
                "n_distinct_tokens": pa.array(tok_distinct),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def normalize_nfc(
    ds: ray.data.Dataset,
    text_column: str = "text",
) -> ray.data.Dataset:
    """Unicode NFC normalization of a text column — the canonicalization
    pass a web corpus needs before hashing/dedup (the same logical text
    arrives composed AND decomposed; md5-exact dedup misses the aliases).

    Hot-path shape: ``pc.string_is_ascii`` splits each batch vectorized;
    ASCII rows (the overwhelming bulk of web text, and NFC-invariant by
    definition) pass through untouched, and only the non-ASCII minority
    pays the per-string ``unicodedata.normalize`` call — the one
    Unicode-correct implementation available without a C extension.
    Python's unicodedata and DuckDB's utf8proc implement the same
    normalization standard, so the op is SQL-checkable via
    ``nfc_normalize()`` (pinned by the hostile-text fixture's
    ligature/fullwidth/astral rows)."""
    import unicodedata

    def norm(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch[text_column], "")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ascii_mask = np.asarray(pc.string_is_ascii(col))
        if ascii_mask.all():
            out = col
        else:
            # ROW-granular fast path: only the non-ASCII subset crosses
            # into Python (one small to_pylist + normalize); ASCII rows —
            # the bulk of every real batch — stay zero-copy Arrow and
            # recombine via if_else against a null-scattered replacement
            idx = np.flatnonzero(~ascii_mask)
            sub = col.take(pa.array(idx, pa.int64())).to_pylist()
            repl = np.full(len(col), None, dtype=object)
            repl[idx] = [unicodedata.normalize("NFC", v) for v in sub]
            out = pc.if_else(
                pa.array(ascii_mask), col, pa.array(repl, pa.string())
            )
        i = batch.column_names.index(text_column)
        return batch.set_column(i, text_column, out)

    return ds.map_batches(norm, batch_format="pyarrow")


def extract_content(
    ds: ray.data.Dataset,
    min_tokens: int = 5,
    stop_density: tuple[int, int] = (1, 10),
    text_column: str = "text",
    id_column: str = "doc_id",
    sep: str = "\n",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """jusText-lite main-content extraction: keep paragraphs that read
    like prose — >= ``min_tokens`` whitespace tokens AND stopword density
    >= num/den (stopwords = the engine's pinned 41-word list,
    ASCII-casefolded) — and drop nav bars, button labels, tag soup and
    other low-density fragments.  The single-document complement to
    dedup.remove_domain_boilerplate (which needs cross-document
    repetition).  Returns ``(doc_id, content_text, n_kept)``; docs with
    no qualifying paragraph are absent (the SQL GROUP-BY-survivors
    semantics).

    ``stop_density`` is a RATIONAL (num, den): the gate compares
    ``stop_count * den >= num * n_tokens`` in exact integers, so the
    classification is SQL-bit-reproducible.

    One stateless vectorized pass (paragraph explode -> ws_token counts
    via the pinned class -> segmented stopword bincount) + the shared
    ordered-reassembly shuffle; no other exchange."""
    from ..text.stopwords import STOPWORDS_TUPLE
    from ..text.ws import ws_token_flat_with_row
    from .dedup import _PARA_IDX_LIMIT, reassemble_paragraphs

    num, den = int(stop_density[0]), int(stop_density[1])
    if num < 0 or den <= 0:
        raise ValueError(f"stop_density must be a nonneg/pos rational, got {stop_density}")
    if min_tokens < 1:
        raise ValueError(f"min_tokens must be >= 1, got {min_tokens}")
    stop_arr = pa.array(list(STOPWORDS_TUPLE), pa.string())

    def classify(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_column], "")
        lists = pc.split_pattern(texts, pattern=sep)
        flat = pc.list_flatten(lists)
        lens = np.asarray(pc.list_value_length(lists), dtype=np.int64)
        if (lens >= _PARA_IDX_LIMIT).any():
            raise ValueError(
                f"extract_content: a document has >= {_PARA_IDX_LIMIT} "
                "paragraphs; the para_idx encoding would overflow"
            )
        ids = np.repeat(np.asarray(batch[id_column], dtype=np.int64), lens)
        total = int(lens.sum())
        starts = (
            np.concatenate(([0], np.cumsum(lens)[:-1]))
            if len(lens)
            else np.empty(0, np.int64)
        )
        idx = np.arange(1, total + 1) - np.repeat(starts, lens)
        nonempty = np.asarray(pc.greater(pc.binary_length(flat), 0))
        paras = flat.filter(pa.array(nonempty))
        ids, idx = ids[nonempty], idx[nonempty]
        if isinstance(paras, pa.ChunkedArray):
            paras = paras.combine_chunks()

        # per-paragraph whitespace-token counts + stopword counts, one
        # segmented pass through THE pinned tokenize-and-flatten helper
        # (ws.py: class + null/empty handling change lands everywhere);
        # ascii_lower like M3
        toks, rows = ws_token_flat_with_row(paras)
        n_paras = len(paras)
        n_tok = np.bincount(rows, minlength=n_paras).astype(np.int64)
        is_stop = np.asarray(pc.is_in(pc.ascii_lower(toks), value_set=stop_arr))
        n_stop = np.bincount(rows[is_stop], minlength=n_paras).astype(np.int64)

        keep = (n_tok >= min_tokens) & (n_stop * den >= num * n_tok)
        km = pa.array(keep)
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "para_idx": pa.array(idx[keep]),
                "para": paras.filter(km),
            }
        )

    survivors = ds.map_batches(classify, batch_format="pyarrow")
    return reassemble_paragraphs(
        survivors, sep=sep, n_buckets=n_buckets, text_name="content_text"
    )


# C4 cleaning constants (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning..." §2.2, and the public c4_utils reference
# implementation's policy list).  Pinned here so the engine kernel, the
# oracle SQL in __ray_entry__.py and the tests share ONE source of truth.
C4_TERMINAL_RE = r'[.!?"]$'  # line must end in terminal punctuation
C4_POLICY_SUBSTRINGS: tuple[str, ...] = (
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "use of cookies",
    "use cookies",
)
C4_DOC_DROP_LOWER = "lorem ipsum"  # page-level drop, casefolded match
C4_DOC_DROP_EXACT = "{"  # page-level drop, raw match (code soup)
C4_LINE_DROP_LOWER = "javascript"  # line-level drop, casefolded match


def c4_line_filters(
    ds: ray.data.Dataset,
    min_words: int = 3,
    min_lines: int = 5,
    text_column: str = "text",
    id_column: str = "doc_id",
    sep: str = "\n",
    n_buckets: int = 64,
) -> ray.data.Dataset:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): per LINE,
    keep only lines that (after trimming the pinned whitespace class)
    end in terminal punctuation (``C4_TERMINAL_RE``), contain >=
    ``min_words`` whitespace tokens, and mention neither "javascript"
    nor any policy boilerplate phrase (``C4_POLICY_SUBSTRINGS``,
    ASCII-casefolded); per PAGE, drop the whole document when its raw
    text contains "lorem ipsum" (casefolded) or a curly brace, or when
    fewer than ``min_lines`` lines survive (the paper drops pages under
    5 *sentences*; kept-lines is the standard line-level proxy).

    Returns ``(doc_id, clean_text, n_lines)`` — survivors re-joined by
    ``sep`` in original line order.  Matching is exact substring /
    pinned-class arithmetic throughout, so the whole pipeline is
    SQL-bit-reproducible (gate q:`c4_filter`).

    Scale shape: the page-level drops and line classification are one
    stateless vectorized pass (doc-level masks BEFORE the line explode,
    so dropped pages never ship their lines); the only exchange is the
    shared doc-bucketed ordered-reassembly shuffle."""
    from ..text.ws import ws_token_flat_with_row
    from .dedup import _PARA_IDX_LIMIT, reassemble_paragraphs

    if min_words < 1:
        raise ValueError(f"min_words must be >= 1, got {min_words}")
    if min_lines < 1:
        raise ValueError(f"min_lines must be >= 1, got {min_lines}")
    # literal byte set for utf8_trim: the SAME class WS_RE spells as a
    # regex (ws.py pins the escapes; interpret them here once)
    trim_chars = "\t\n\x0b\x0c\r "

    def classify(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_column], "")
        # page-level drops first: dropped docs never explode
        bad_doc = pc.or_(
            pc.match_substring(pc.ascii_lower(texts), C4_DOC_DROP_LOWER),
            pc.match_substring(texts, C4_DOC_DROP_EXACT),
        )
        ok = pc.invert(bad_doc)
        texts = texts.filter(ok)
        doc_ids = pc.array_filter(batch[id_column], ok)

        lists = pc.split_pattern(texts, pattern=sep)
        flat = pc.list_flatten(lists)
        lens = np.asarray(pc.list_value_length(lists), dtype=np.int64)
        if (lens >= _PARA_IDX_LIMIT).any():
            raise ValueError(
                f"c4_line_filters: a document has >= {_PARA_IDX_LIMIT} "
                "lines; the para_idx encoding would overflow"
            )
        ids = np.repeat(np.asarray(doc_ids, dtype=np.int64), lens)
        total = int(lens.sum())
        starts = (
            np.concatenate(([0], np.cumsum(lens)[:-1]))
            if len(lens)
            else np.empty(0, np.int64)
        )
        idx = np.arange(1, total + 1) - np.repeat(starts, lens)
        trimmed = pc.utf8_trim(flat, trim_chars)
        nonempty = np.asarray(pc.greater(pc.binary_length(trimmed), 0))
        lines = trimmed.filter(pa.array(nonempty))
        ids, idx = ids[nonempty], idx[nonempty]
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()

        n_lines = len(lines)
        toks, rows = ws_token_flat_with_row(lines)
        n_tok = np.bincount(rows, minlength=n_lines).astype(np.int64)
        terminal = np.asarray(pc.match_substring_regex(lines, C4_TERMINAL_RE))
        low = pc.ascii_lower(lines)
        drop = np.asarray(pc.match_substring(low, C4_LINE_DROP_LOWER))
        for phrase in C4_POLICY_SUBSTRINGS:
            drop |= np.asarray(pc.match_substring(low, phrase))

        keep = terminal & (n_tok >= min_words) & ~drop
        km = pa.array(keep)
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "para_idx": pa.array(idx[keep]),
                "para": lines.filter(km),
            }
        )

    survivors = ds.map_batches(classify, batch_format="pyarrow")
    out = reassemble_paragraphs(
        survivors,
        sep=sep,
        n_buckets=n_buckets,
        text_name="clean_text",
        count_name="n_lines",
    )

    def page_gate(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["n_lines"], min_lines))

    return out.map_batches(page_gate, batch_format="pyarrow")
