"""Tokenization / normalization semantics transcribed from the reference.

Index-side tokenizer (scalar oracle; the vectorized Arrow kernel in
``text.vectorized`` must match it token-for-token):

- Split document UTF-8 bytes on the delimiter set ``b <= 47 or b in
  {58 ':', 59 ';', 61 '=', 63 '?'}`` (/root/reference/src/Indexing/
  Indexer.cs:133-135).  Digits 48-57 and ``< > @`` are NOT delimiters.
  Multibyte UTF-8 sequences only contain bytes >= 0x80, so byte-level
  splitting never cuts inside a character and is equivalent to splitting
  on the same codepoint class.
- Drop empty tokens (Indexer.cs:142) and tokens whose first byte is '<'
  or whose last byte is '>' (the XML-tag rule, Indexer.cs:144).
- Case folding is ASCII-only A-Z -> a-z (Indexer.cs:168-177).
- Stopword removal: exact membership in the 41-word list, gated on
  length <= 4 in the reference purely as an optimization (all stopwords
  are <= 4 chars) (Indexer.cs:180,201-213).
- Porter stemming of the surviving token (length >= 3 acts; see porter.py).

Deviation (documented): the reference emits a token only when a delimiter
terminates it, so a document whose content does not end with a delimiter
silently drops its trailing token (Indexer.cs:131-161 has no post-loop
flush).  On TREC input the content always ends with a newline before
``</DOC>`` so the paths agree; we use standard split semantics (trailing
token kept), which is identical on any text ending with a delimiter.

Query-side splitter (TopicParser.cs:75-96) is deliberately different:
``Split(',',' ','.','(',')',';',':','?','/')`` — '=' is absent, hyphens
and quotes survive — then drop whitespace-only words and words starting
with '<', then casefold via full ``ToLower()`` (not ASCII-only),
stopword check, stem.  We keep the asymmetry to stay faithful.
"""

from __future__ import annotations

import re

from .porter import stem_word
from .stopwords import STOPWORDS

# Codepoint class equivalent to the reference's byte test
# (b <= 47 || b == 58 || b == 59 || b == 61 || b == 63).
DELIM_REGEX = r"[\x00-\x2f:;=?]"
_DELIM_RE = re.compile(DELIM_REGEX)

# Query-side splitter characters (TopicParser.cs:77).
QUERY_SPLIT_CHARS = ",.();:?/ "
_QUERY_SPLIT_RE = re.compile("[" + re.escape(QUERY_SPLIT_CHARS) + "]")


def _ascii_lower(token: str) -> str:
    # ASCII-only case folding (Indexer.cs:168-177): A-Z -> a-z, everything
    # else (including non-ASCII uppercase) untouched.
    return "".join(
        chr(ord(c) + 32) if "A" <= c <= "Z" else c for c in token
    )


def normalize_text_oracle(
    text: str,
    *,
    case_folding: bool = True,
    remove_stopwords: bool = True,
    stemming: bool = True,
) -> list[str]:
    """Index-side oracle: text -> ordered list of kept, normalized tokens."""
    out: list[str] = []
    for tok in _DELIM_RE.split(text):
        if not tok:
            continue
        if tok[0] == "<" or tok[-1] == ">":
            continue
        if case_folding:
            tok = _ascii_lower(tok)
        if remove_stopwords and len(tok) <= 4 and tok in STOPWORDS:
            continue
        if stemming:
            tok = stem_word(tok)
        out.append(tok)
    return out


def normalize_query_word(
    word: str,
    *,
    case_folding: bool = True,
    remove_stopwords: bool = True,
    stemming: bool = True,
) -> str:
    """Query-side ProcessWord (TopicParser.cs:98-125); '' means dropped."""
    if case_folding:
        word = word.lower()  # full Unicode lower, per the reference
    if remove_stopwords and len(word) <= 4 and word in STOPWORDS:
        return ""
    if stemming:
        return stem_word(word)
    return word


def split_query_line(line: str) -> list[str]:
    """Query-side splitter + pre-filters (TopicParser.cs:77-79)."""
    return [
        w
        for w in _QUERY_SPLIT_RE.split(line)
        if w and not w.isspace() and w[0] != "<"
    ]
