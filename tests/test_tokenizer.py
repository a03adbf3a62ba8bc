"""Tokenizer/normalizer conformance: scalar oracle semantics + vectorized parity."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from search_engine_ray.config import IndexOptions
from search_engine_ray.text.stopwords import STOPWORDS
from search_engine_ray.text.tokenizer import (
    normalize_query_word,
    normalize_text_oracle,
    split_query_line,
)
from search_engine_ray.text.vectorized import tokenize_batch


def toks(text, **kw):
    return normalize_text_oracle(text, **kw)


class TestDelimiters:
    def test_delimiter_set(self):
        # ':' ';' '=' '?' and everything <= 0x2f split; digits do not.
        assert toks("a:b", remove_stopwords=False, stemming=False) == ["a", "b"]
        assert toks("a;b", remove_stopwords=False, stemming=False) == ["a", "b"]
        assert toks("a=b", remove_stopwords=False, stemming=False) == ["a", "b"]
        assert toks("a?b", remove_stopwords=False, stemming=False) == ["a", "b"]
        assert toks("a/b", remove_stopwords=False, stemming=False) == ["a", "b"]
        assert toks("a,b.c d", remove_stopwords=False, stemming=False) == ["a", "b", "c", "d"]
        assert toks("abc123", stemming=False) == ["abc123"]
        assert toks("a@b", remove_stopwords=False, stemming=False) == ["a@b"]

    def test_xml_tag_rule(self):
        assert toks("<tag> ok", stemming=False) == ["ok"]
        assert toks("word> ok", stemming=False) == ["ok"]
        assert toks("x<y keep<ok", stemming=False) == ["x<y", "keep<ok"]

    def test_empty_tokens_dropped(self):
        assert toks("  a,,b  ", remove_stopwords=False, stemming=False) == ["a", "b"]
        assert toks("", stemming=False) == []

    def test_non_ascii_preserved(self):
        # multibyte chars are never delimiters; casefold is ASCII-only
        assert toks("Über Straße", remove_stopwords=False, stemming=False) == ["Über", "straße"]


class TestStopwords:
    def test_all_41_removed(self):
        text = " ".join(sorted(STOPWORDS))
        assert toks(text, stemming=False) == []

    def test_prefix_not_removed(self):
        assert toks("thisx", stemming=False) == ["thisx"]

    def test_gate_is_cosmetic(self):
        # every stopword is <= 4 chars, so the <=4 gate never changes results
        assert all(len(w) <= 4 for w in STOPWORDS)

    def test_case_folding_before_stopword(self):
        assert toks("THE The the", stemming=False) == []
        assert toks("THE", case_folding=False, stemming=False) == ["THE"]


class TestCaseFold:
    def test_ascii_only(self):
        assert toks("WoRd", remove_stopwords=False, stemming=False) == ["word"]
        assert toks("ÄBC", remove_stopwords=False, stemming=False) == ["Äbc"]


class TestQuerySide:
    def test_splitter_asymmetry(self):
        # '=' is NOT a query splitter; '-' and quotes survive both
        assert split_query_line("a=b c-d 'e'") == ["a=b", "c-d", "'e'"]
        assert split_query_line("a,b.c(d)e;f:g?h/i j") == list("abcdefghij")

    def test_tag_words_dropped(self):
        assert split_query_line("<title> hello") == ["hello"]

    def test_process_word(self):
        assert normalize_query_word("The") == ""
        assert normalize_query_word("Running") == "run"
        assert normalize_query_word("Straße", stemming=False) == "straße"  # full lower


def _batch_parity(texts, options):
    tb = tokenize_batch(pa.array(texts, pa.string()), options)
    got = [[] for _ in texts]
    for code, d in zip(tb.term_codes, tb.doc_idx):
        got[d].append(tb.terms[code])
    for i, text in enumerate(texts):
        expected = normalize_text_oracle(
            text,
            case_folding=options.case_folding,
            remove_stopwords=options.remove_stopwords,
            stemming=options.stemming,
        )
        # vectorized kernel preserves token order within each doc
        assert got[i] == expected, (i, text, got[i], expected)
        assert tb.doc_lens[i] == len(expected)


OPTION_SETS = [
    IndexOptions(True, True, True),
    IndexOptions(True, False, False),
    IndexOptions(False, True, False),
    IndexOptions(True, True, False),
]


class TestVectorizedParity:
    def test_fixed_corpus(self):
        texts = [
            "The QUICK brown-fox; jumped over=the lazy dog? 42 times",
            "<html> <b>bold</b> plain a=b c:d",
            " ".join(sorted(STOPWORDS)),
            "",
            "caresses ponies TIES meetings agreed",
            "Über Straße naïve",
            "x" * 50,
            "a,b.c d@e f?g",
        ]
        for opts in OPTION_SETS:
            _batch_parity(texts, opts)

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("Ll", "Lu", "Nd", "Po", "Zs"),
                    whitelist_characters="<>=:;?/.,\n\t-'\"@&",
                    max_codepoint=0x24F,
                ),
                max_size=60,
            ),
            max_size=6,
        )
    )
    def test_hypothesis_parity(self, texts):
        _batch_parity(texts, IndexOptions(True, True, True))

    def test_doc_idx_nondecreasing(self):
        texts = ["b a c", "z y", "m"]
        tb = tokenize_batch(pa.array(texts), IndexOptions())
        assert (np.diff(tb.doc_idx) >= 0).all()
        assert list(tb.terms) == sorted(set(tb.terms))
