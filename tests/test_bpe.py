"""BPE merge training (dataops/bpe.py) vs independent references."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from search_engine_ray.dataops.bpe import top_pair_counts, train_bpe, word_counts

TEXTS = [
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
    "low lower newest",
    "",
    " \t ",
    "x\vlow\fnewest",  # pinned whitespace class
]
DOC_IDS = list(range(len(TEXTS)))


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(DOC_IDS, pa.int64()), "text": pa.array(TEXTS)})
    )


def _brute_words(min_count: int) -> dict[str, int]:
    import re

    counts: dict[str, int] = {}
    for t in TEXTS:
        for w in re.split("[\t\n\x0b\x0c\r ]+", t):
            if w:
                counts[w] = counts.get(w, 0) + 1
    return {w: c for w, c in counts.items() if c >= min_count}


def _brute_merges(n_merges: int, min_count: int) -> list[tuple[str, str, int]]:
    """Independent reference: operates on the EXPANDED corpus (one entry
    per occurrence, no count weighting), so it exercises a different code
    path than the library's dictionary loop."""
    stream = [list(w) for w, c in _brute_words(min_count).items() for _ in range(c)]
    merges = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms in stream:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + 1
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((l, r, c))
        joined = l + r
        for syms in stream:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == l and syms[i + 1] == r:
                    syms[i : i + 2] = [joined]
                else:
                    i += 1
    return merges


def test_word_counts_pruned_and_invariant(docs_ds, ray_session):
    got = word_counts(docs_ds, min_count=2, max_vocab=None)
    exp = dict(sorted(_brute_words(2).items()))
    assert got["word"].to_pylist() == list(exp)
    assert got["count"].to_pylist() == list(exp.values())
    got3 = word_counts(docs_ds.repartition(3), min_count=2, max_vocab=None)
    assert got3.equals(got)
    # the cap keeps the most frequent, ties -> word ascending
    capped = word_counts(docs_ds, min_count=1, max_vocab=3)
    full = _brute_words(1)
    top3 = sorted(sorted(full.items()), key=lambda kv: -kv[1])[:3]
    assert set(capped["word"].to_pylist()) == {w for w, _ in top3}
    # max_vocab=None is still bounded: above max_driver_rows distinct
    # words the collect fail-louds instead of materializing the vocab
    with pytest.raises(ValueError, match="max_driver_rows"):
        word_counts(docs_ds, min_count=1, max_vocab=None, max_driver_rows=2)


@pytest.mark.parametrize("n_merges", [1, 5, 12])
def test_train_bpe_matches_expanded_reference(docs_ds, ray_session, n_merges):
    got = train_bpe(docs_ds, n_merges=n_merges, min_count=2, max_vocab=None)
    exp = _brute_merges(n_merges, min_count=2)
    assert got["rank"].to_pylist() == list(range(1, len(exp) + 1))
    assert list(
        zip(got["lhs"].to_pylist(), got["rhs"].to_pylist(), got["count"].to_pylist())
    ) == exp


def test_train_bpe_first_merges_sanity(docs_ds, ray_session):
    """The Sennrich-style corpus merges its dominant digraphs first."""
    got = train_bpe(docs_ds, n_merges=4, min_count=2, max_vocab=None)
    pairs = list(zip(got["lhs"].to_pylist(), got["rhs"].to_pylist()))
    # 'newest' x7 + 'widest' x3 share 'est'; 'low' appears 8 times
    assert ("e", "s") in pairs or ("s", "t") in pairs
    assert ("l", "o") in pairs or ("lo", "w") in pairs or ("o", "w") in pairs


def _brute_encode_len(word: str, merges: list[tuple[str, str]]) -> int:
    """Independent GPT-2-style bpe() loop: repeatedly apply the
    lowest-rank present pair greedily left-to-right."""
    ranks = {p: i for i, p in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        present = [
            ranks[(syms[i], syms[i + 1])]
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not present:
            break
        l, r = merges[min(present)]
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def test_bpe_encode_counts(docs_ds, ray_session):
    import re

    from search_engine_ray.dataops.bpe import bpe_encode_counts, train_bpe

    merges_tbl = train_bpe(docs_ds, n_merges=8, min_count=2, max_vocab=None)
    merges = list(zip(merges_tbl["lhs"].to_pylist(), merges_tbl["rhs"].to_pylist()))
    out = (
        bpe_encode_counts(docs_ds, merges_tbl, concurrency=2)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    exp = []
    for t in TEXTS:
        words = [w for w in re.split("[\t\n\x0b\x0c\r ]+", t) if w]
        exp.append(sum(_brute_encode_len(w, merges) for w in words))
    assert out["n_bpe_tokens"].tolist() == exp
    # merges compress: fewer tokens than characters, at least one per word
    n_words = sum(
        len([w for w in re.split("[\t\n\x0b\x0c\r ]+", t) if w]) for t in TEXTS
    )
    assert sum(exp) >= n_words
    assert sum(exp) < sum(len(t) for t in TEXTS)


def test_top_pair_counts_vs_duckdb(docs_ds, ray_session):
    got = top_pair_counts(docs_ds, k=10, min_count=2, max_vocab=None)
    con = duckdb.connect()
    con.register(
        "documents",
        pa.table({"doc_id": pa.array(DOC_IDS, pa.int64()), "text": pa.array(TEXTS)}),
    )
    exp = con.execute(
        r"""
        WITH words AS (
          SELECT t AS w, CAST(count(*) AS BIGINT) AS c
          FROM documents, UNNEST(regexp_split_to_array(text, '[\t\n\x0B\x0C\r ]+')) AS u(t)
          WHERE t <> '' GROUP BY t HAVING count(*) >= 2),
        pairs AS (
          SELECT substring(w, CAST(i AS INT), 1) AS lhs,
                 substring(w, CAST(i AS INT) + 1, 1) AS rhs, c
          FROM words, UNNEST(generate_series(1, length(w) - 1)) AS g(i))
        SELECT lhs, rhs, CAST(sum(c) AS BIGINT) AS count
        FROM pairs GROUP BY lhs, rhs
        ORDER BY count DESC, lhs, rhs LIMIT 10
        """
    ).fetch_arrow_table()
    assert got.equals(exp)
