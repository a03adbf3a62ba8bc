"""Document chunking — the RAG/embedding-prep stage: split each doc into
overlapping token windows, each chunk carrying (doc_id, chunk_id,
start_token, n_tokens, text).

Vectorized end-to-end: tokens come from ONE ``split_pattern_regex`` pass
(the pinned class, text/ws.py); chunk boundaries are numpy arithmetic
over the per-doc token counts; chunk text materializes with a single
``take`` (repeated indices encode the overlap) + ``binary_join`` — no
Python loop over docs or chunks.  Chunk text is the canonical
single-space join of its tokens, so a SQL oracle reproduces it exactly
(``array_to_string(toks[s:e], ' ')``).

Scale: a pure flat-map (rows out ~= tokens/step per doc), no shuffle, no
state; output is ~(1 + overlap/step)x the token volume of the input —
size ``chunk_tokens``/``overlap`` accordingly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..text.ws import WS_RE


def chunk_documents(
    ds: ray.data.Dataset,
    chunk_tokens: int = 256,
    overlap: int = 32,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """(doc_id, chunk_id, start_token, n_tokens, text) rows; chunks start
    every ``chunk_tokens - overlap`` tokens; the last chunk may be short;
    empty/whitespace-only docs produce no chunks."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    step = chunk_tokens - overlap

    def chunks(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(
            pc.fill_null(batch[text_column], ""), pattern=WS_RE
        )
        flat = pc.list_flatten(lists)
        nonempty = np.asarray(pc.greater(pc.binary_length(flat), 0))
        lens_pre = np.asarray(pc.list_value_length(lists), dtype=np.int64)
        doc_idx_tok = np.repeat(np.arange(len(lens_pre)), lens_pre)[nonempty]
        flat = flat.filter(pa.array(nonempty))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n_tok = np.bincount(doc_idx_tok, minlength=len(lens_pre)).astype(np.int64)
        tok_starts = np.concatenate(([0], np.cumsum(n_tok)[:-1]))

        # chunks per doc: ceil((n - overlap) / step) for n > 0, clamped >= 1
        n_chunks = np.where(
            n_tok > 0, np.maximum(1, -(-(n_tok - overlap) // step)), 0
        ).astype(np.int64)
        total = int(n_chunks.sum())
        empty = pa.table(
            {
                id_column: pa.array([], batch[id_column].type),
                "chunk_id": pa.array([], pa.int64()),
                "start_token": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
        if total == 0:
            return empty
        doc_of_chunk = np.repeat(np.arange(len(lens_pre)), n_chunks)
        chunk_starts_global = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
        chunk_id = np.arange(total) - chunk_starts_global[doc_of_chunk]
        start_token = chunk_id * step
        chunk_len = np.minimum(chunk_tokens, n_tok[doc_of_chunk] - start_token)

        # one take with repeated indices materializes every chunk's tokens
        offs = np.concatenate(([0], np.cumsum(chunk_len)))
        idx = (
            np.repeat(tok_starts[doc_of_chunk] + start_token, chunk_len)
            + np.arange(int(offs[-1]))
            - np.repeat(offs[:-1], chunk_len)
        )
        toks = flat.take(pa.array(idx, pa.int64()))
        # int64 offsets: a batch of long docs can push the repeated-token
        # total past 2^31 (overlap amplifies it) — large_list never overflows
        chunk_lists = pa.LargeListArray.from_arrays(pa.array(offs, pa.int64()), toks)
        text = pc.binary_join(chunk_lists, " ")

        return pa.table(
            {
                id_column: batch[id_column].take(pa.array(doc_of_chunk)),
                "chunk_id": pa.array(chunk_id),
                "start_token": pa.array(start_token),
                "n_tokens": pa.array(chunk_len),
                "text": text,
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow")


def cdc_chunks(
    ds: ray.data.Dataset,
    divisor: int = 64,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """Content-defined chunking (the Rabin/LBFS boundary rule at token
    granularity): a chunk boundary falls AFTER every token whose 64-bit
    md5be hash satisfies ``hash % divisor == 0``, so expected chunk
    length is ``divisor`` tokens and — the property fixed-width chunking
    lacks — an insertion or deletion only reshapes the chunks AROUND the
    edit, leaving every other chunk byte-identical.  That makes the
    chunk-hash table a shift-robust dedup/delta signal (the rsync/LBFS
    construction), complementing chunk_documents' fixed windows.

    Pure content rule, no min/max clamps: the boundary decision is a
    stateless per-token predicate, which keeps the operator ONE
    vectorized map_batches (no sequential scan, no shuffle) and the SQL
    oracle a window-function cumsum.  Degenerate runs (many consecutive
    boundary tokens) produce many 1-token chunks — the documented trade.

    Output rows: (doc_id, chunk_id, start_token, n_tokens, text) with
    chunk text the canonical single-space token join, exactly as
    chunk_documents emits.  Empty/whitespace-only docs produce no rows.
    """
    if divisor < 1:
        raise ValueError(f"cdc_chunks: divisor must be >= 1 (got {divisor})")

    def chunks(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_column: pa.array([], batch[id_column].type if batch.num_rows else pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "start_token": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
        if batch.num_rows == 0:
            return empty
        lists = pc.split_pattern_regex(
            pc.fill_null(batch[text_column], ""), pattern=WS_RE
        )
        flat = pc.list_flatten(lists)
        nonempty = np.asarray(pc.greater(pc.binary_length(flat), 0))
        lens_pre = np.asarray(pc.list_value_length(lists), dtype=np.int64)
        doc_idx_tok = np.repeat(np.arange(len(lens_pre)), lens_pre)[nonempty]
        flat = flat.filter(pa.array(nonempty))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if len(flat) == 0:
            return empty
        # md5be hash per token via the dictionary (only unique tokens
        # hash — the _token_lists trick, inlined on the already-filtered
        # flat stream so there is exactly ONE split pass)
        import hashlib

        denc = pc.dictionary_encode(flat)
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        uniq = denc.dictionary.to_pylist()
        uh = np.fromiter(
            (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") for t in uniq),
            dtype=np.uint64,
            count=len(uniq),
        )
        tok_hash = uh[np.asarray(denc.indices, dtype=np.int64)]
        boundary = (tok_hash % np.uint64(divisor)) == 0

        # chunk index per token: exclusive segmented cumsum of the
        # boundary flags, restarting at each doc
        cum_excl = np.concatenate(([0], np.cumsum(boundary[:-1])))
        n_tok = np.bincount(doc_idx_tok, minlength=len(lens_pre)).astype(np.int64)
        tok_starts = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
        chunk_of_tok = cum_excl - cum_excl[tok_starts[doc_idx_tok]]

        # chunk segments = runs where (doc, chunk idx) is constant; both
        # are nondecreasing within the flat stream
        key = doc_idx_tok * (int(chunk_of_tok.max()) + 1) + chunk_of_tok
        seg_start = np.concatenate(([True], key[1:] != key[:-1]))
        starts = np.flatnonzero(seg_start)
        seg_len = np.diff(np.concatenate((starts, [len(key)])))
        doc_of_chunk = doc_idx_tok[starts]
        chunk_id = chunk_of_tok[starts]
        start_token = starts - tok_starts[doc_of_chunk]

        offs = np.concatenate(([0], np.cumsum(seg_len)))
        chunk_lists = pa.LargeListArray.from_arrays(pa.array(offs, pa.int64()), flat)
        text = pc.binary_join(chunk_lists, " ")
        return pa.table(
            {
                id_column: batch[id_column].take(pa.array(doc_of_chunk)),
                "chunk_id": pa.array(chunk_id.astype(np.int64)),
                "start_token": pa.array(start_token.astype(np.int64)),
                "n_tokens": pa.array(seg_len.astype(np.int64)),
                "text": text,
            }
        )

    return ds.select_columns([id_column, text_column]).map_batches(
        chunks, batch_format="pyarrow"
    )


# sentence segmentation: the match semantics of regexp_extract_all(text,
# '[^.!?]+[.!?]*') — maximal runs of non-terminators plus their trailing
# terminator run; a LEADING pure-terminator run matches nothing
_SENT_SENTINEL = "\x00"
_WS_TRIM = "\t\n\x0b\x0c\r "


def split_sentences(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """(doc_id, sent_id, text): sentence segmentation for sentence-level
    dedup / RAG prep.  A sentence is a ``[^.!?]+[.!?]*`` match (so the
    terminator stays attached and lookbehind — which RE2 lacks — is never
    needed), trimmed with the pinned whitespace class; empty-after-trim
    matches are dropped and ``sent_id`` numbers the KEPT sentences 0-based
    per doc.

    Vectorized: one regex replace plants a NUL sentinel after every
    terminator run, one split explodes on it, numpy does the per-doc
    numbering — no Python loop over rows.  Pure flat-map, no shuffle.
    Documents containing NUL fail loud (the sentinel-collision rule, same
    convention as the '|' group-key guard in window_fns)."""

    def split(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_column], "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n_nul = pc.sum(pc.count_substring(texts, _SENT_SENTINEL)).as_py() or 0
        if n_nul:
            raise ValueError(
                f"split_sentences: {n_nul} NUL byte(s) in {text_column!r} "
                "collide with the sentence sentinel"
            )
        marked = pc.replace_substring_regex(
            texts, pattern=r"([.!?]+)", replacement="\\1" + _SENT_SENTINEL
        )
        lists = pc.split_pattern(marked, pattern=_SENT_SENTINEL)
        flat = pc.list_flatten(lists)
        lens = np.asarray(pc.list_value_length(lists), dtype=np.int64)
        rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        # only the FIRST segment of a doc can be a pure-terminator run
        # (every later segment starts right after a sentinel); regex
        # semantics skip it — and drop whitespace-only matches after trim
        has_nonterm = np.asarray(pc.match_substring_regex(flat, "[^.!?]"))
        trimmed = pc.utf8_trim(flat, characters=_WS_TRIM)
        if isinstance(trimmed, pa.ChunkedArray):
            trimmed = trimmed.combine_chunks()
        keep = has_nonterm & (np.asarray(pc.binary_length(trimmed)) > 0)
        kept_rows = rows[keep]
        first = np.searchsorted(kept_rows, kept_rows, side="left")
        sent_id = np.arange(len(kept_rows), dtype=np.int64) - first
        return pa.table(
            {
                id_column: batch[id_column].take(pa.array(kept_rows)),
                "sent_id": pa.array(sent_id),
                "text": trimmed.filter(pa.array(keep)),
            }
        )

    return ds.map_batches(split, batch_format="pyarrow")
