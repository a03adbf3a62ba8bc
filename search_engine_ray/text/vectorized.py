"""Vectorized (Arrow/numpy) tokenize+normalize kernel for map_batches stages.

Mirrors ``tokenizer.normalize_text_oracle`` token-for-token (property-tested
in tests/test_tokenizer.py) but runs as pyarrow.compute kernels over whole
Arrow batches:

- ``pc.ascii_lower``            == the reference's ASCII-only casefold
  (Indexer.cs:168-177);
- ``pc.split_pattern_regex``    on the delimiter codepoint class
  (Indexer.cs:133-135) — byte-equivalent for UTF-8, see tokenizer.py;
- ``pc.starts_with/ends_with``  == the XML-tag token rule (Indexer.cs:144);
- ``pc.is_in``                  == stopword membership (Indexer.cs:180-213);
- Porter stemming runs in Python over the *dictionary-encoded unique
  tokens only* with a process-wide memo (Zipf makes this a tiny fraction
  of token volume) — the one per-item loop, deliberately off the
  per-token hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import IndexOptions
from .porter import stem_word
from .stopwords import STOPWORDS_TUPLE
from .tokenizer import DELIM_REGEX

_STOPWORD_ARRAY = pa.array(STOPWORDS_TUPLE, type=pa.string())


@dataclass
class TokenizedBatch:
    """Normalized token stream for one batch of documents.

    terms      : unique normalized terms in this batch, sorted ascending
    term_codes : int32 index into ``terms`` per kept token
    doc_idx    : int32 row index (within the batch) per kept token,
                 non-decreasing in token order
    doc_lens   : int32 per-row count of kept tokens (== the reference's
                 _documentLength semantics, WriteableIndex.cs:68)
    """

    terms: np.ndarray
    term_codes: np.ndarray
    doc_idx: np.ndarray
    doc_lens: np.ndarray


def tokenize_batch(texts: pa.Array | pa.ChunkedArray, options: IndexOptions) -> TokenizedBatch:
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    texts = pc.fill_null(texts, "")
    if options.case_folding:
        texts = pc.ascii_lower(texts)

    token_lists = pc.split_pattern_regex(texts, pattern=DELIM_REGEX)
    flat = pc.list_flatten(token_lists)
    counts = np.asarray(pc.list_value_length(token_lists), dtype=np.int64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int32), counts)

    keep = pc.greater(pc.binary_length(flat), 0)
    keep = pc.and_kleene(keep, pc.invert(pc.starts_with(flat, pattern="<")))
    keep = pc.and_kleene(keep, pc.invert(pc.ends_with(flat, pattern=">")))
    if options.remove_stopwords:
        keep = pc.and_kleene(keep, pc.invert(pc.is_in(flat, value_set=_STOPWORD_ARRAY)))

    flat = flat.filter(keep)
    doc_idx = doc_idx[np.asarray(keep)]

    # Dictionary-encode so stemming touches unique tokens only.
    denc = pc.dictionary_encode(flat)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = np.asarray(denc.indices, dtype=np.int64)
    vocab = denc.dictionary.to_pylist()

    if options.stemming:
        vocab = [stem_word(t) for t in vocab]

    # Stemming can merge vocab entries; re-key to sorted unique terms.
    vocab_arr = np.asarray(vocab, dtype=object)
    terms, remap = np.unique(vocab_arr, return_inverse=True)
    term_codes = (
        remap.astype(np.int32)[codes] if len(codes) else np.empty(0, dtype=np.int32)
    )

    doc_lens = np.bincount(doc_idx, minlength=n_docs).astype(np.int32)
    return TokenizedBatch(
        terms=terms,
        term_codes=term_codes,
        doc_idx=doc_idx.astype(np.int32),
        doc_lens=doc_lens,
    )
