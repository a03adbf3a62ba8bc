"""TREC topic files: writer, parser, and deterministic topic synthesis.

Parser transcribes /root/reference/src/Query/TopicParser.cs:22-96: line
markers ``<num>`` (value at Substring(14), i.e. after "<num> Number: "),
``<title>`` (Substring(8), after "<title> "), stateful ``<desc>``/``<narr>``
section tracking, ``</top>`` terminator.  Keywords fold repeated normalized
terms into (term, qtf) pairs preserving first-seen order
(TopicParser.cs:84-93); normalization reuses the query-side splitter +
ProcessWord chain from text.tokenizer (the deliberate index/query splitter
asymmetry, SURVEY.md §2.2 M6).
"""

from __future__ import annotations

import numpy as np

from ..config import IndexOptions, QueryOptions
from ..text.tokenizer import normalize_query_word, split_query_line

Topic = tuple[int, list[tuple[str, int]]]


def _parse_line_into(keywords: list[tuple[str, int]], line: str, opts: IndexOptions) -> None:
    for word in split_query_line(line):
        result = normalize_query_word(
            word,
            case_folding=opts.case_folding,
            remove_stopwords=opts.remove_stopwords,
            stemming=opts.stemming,
        )
        if result == "":
            continue
        for i, (term, qtf) in enumerate(keywords):
            if term == result:
                keywords[i] = (term, qtf + 1)
                break
        else:
            keywords.append((result, 1))


def parse_topics_lines(
    lines: list[str], query_options: QueryOptions, index_options: IndexOptions
) -> list[Topic]:
    result: list[Topic] = []
    current_id = 0
    current_keywords: list[tuple[str, int]] = []
    last = ""
    for line in lines:
        if line.startswith("<num>"):
            current_id = int(line[14:])
        elif line.startswith("<title>") and query_options.use_title:
            _parse_line_into(current_keywords, line[8:], index_options)
        elif line.startswith("<desc>"):
            last = "desc"
        elif line.startswith("<narr>"):
            last = "narr"
        elif line.startswith("</top>"):
            result.append((current_id, current_keywords))
            current_id = 0
            current_keywords = []
        else:
            if last == "desc" and query_options.use_description:
                _parse_line_into(current_keywords, line, index_options)
            elif last == "narr" and query_options.use_narrative:
                _parse_line_into(current_keywords, line, index_options)
    return result


def parse_topics(
    path: str, query_options: QueryOptions, index_options: IndexOptions
) -> list[Topic]:
    with open(path, encoding="utf-8") as fh:
        return parse_topics_lines(fh.read().splitlines(), query_options, index_options)


def write_trec_topics(path: str, topics: list[tuple[int, str, str, str]]) -> None:
    """topics: (number, title, description, narrative)."""
    with open(path, "w", encoding="utf-8") as fh:
        for num, title, desc, narr in topics:
            fh.write("<top>\n")
            fh.write(f"<num> Number: {num}\n")
            fh.write(f"<title> {title}\n")
            fh.write("<desc> Description:\n")
            fh.write(desc + "\n")
            fh.write("<narr> Narrative:\n")
            fh.write(narr + "\n")
            fh.write("</top>\n")


def generate_topics(
    n_topics: int, vocab: list[str], seed: int = 7, first_number: int = 401
) -> list[tuple[int, str, str, str]]:
    """Deterministic topics over a corpus vocabulary: includes repeated query
    terms (qtf>1), out-of-vocabulary terms, stopword-only queries and
    hyphenated words (FIXTURES.md §2)."""
    rng = np.random.default_rng(seed)
    vocab_arr = np.asarray(vocab, dtype=object)
    out: list[tuple[int, str, str, str]] = []
    for t in range(n_topics):
        num = first_number + t
        n_title = int(rng.integers(2, 6))
        words = list(rng.choice(vocab_arr, size=n_title))
        if t % 4 == 0 and words:
            words.append(words[0])  # repeated term -> qtf 2
        if t % 5 == 0:
            words.append("zzzznotinindexzzzz")  # dropped at lookup
        if t % 7 == 0:
            words.append("state-of-the-art")  # hyphen survives query splitter
        if t % 11 == 0:
            words = ["the", "and", "with"]  # stopword-only title
        title = " ".join(str(w) for w in words)
        desc_words = [str(w) for w in rng.choice(vocab_arr, size=8)]
        desc = "Documents mentioning " + " ".join(desc_words) + " are relevant."
        narr = "A relevant document discusses " + " ".join(
            str(w) for w in rng.choice(vocab_arr, size=12)
        )
        out.append((num, title, desc, narr))
    return out
