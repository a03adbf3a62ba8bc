"""HTML->text extraction: byte-identical per url between oracle and engine."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from search_engine_ray.corpus.extract import (
    extract_text_batch,
    extract_text_oracle,
    html_from_text,
)
from search_engine_ray.corpus.pages import generate_pages_table


def test_roundtrip_simple():
    for text in [
        "hello world",
        "line one\nline two\nline three",
        "a < b and c > d & e",
        "",
        "one\n\nthree",  # empty paragraph
        "&amp; literal entity &lt;",
        "trailing newline\n",
    ]:
        html = html_from_text(text, title="t & <x>", noise_seed=3)
        assert extract_text_oracle(html) == text


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
        max_size=200,
    ),
    st.integers(min_value=0, max_value=10_000),
)
def test_roundtrip_hypothesis(text, noise_seed):
    html = html_from_text(text, title="title", noise_seed=noise_seed)
    assert extract_text_oracle(html) == text


def test_vectorized_matches_oracle_byte_identical():
    table = generate_pages_table(80, seed=11)
    htmls = table["html"]
    got = extract_text_batch(htmls).to_pylist()
    for i in range(table.num_rows):
        oracle = extract_text_oracle(table["html"][i].as_py())
        assert got[i] == oracle
        # and both recover the original text column exactly (bytes)
        assert got[i].encode("utf-8") == table["text"][i].as_py().encode("utf-8")


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
            max_size=120,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_vectorized_parity_hypothesis(texts):
    htmls = pa.array([html_from_text(t, "ttl", noise_seed=i) for i, t in enumerate(texts)], pa.binary())
    got = extract_text_batch(htmls).to_pylist()
    assert got == texts
