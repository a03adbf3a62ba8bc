"""Regenerate the committed golden conformance corpus under tests/golden/.

Run manually (python tests/make_golden.py) ONLY when semantics are
deliberately changed; tests/test_golden.py compares the live oracle AND the
Ray engine against these files, so any accidental drift in tokenizer /
stemmer / scorer / index semantics fails loudly.
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from search_engine_ray.config import IndexOptions, QueryOptions
from search_engine_ray.corpus.pages import generate_pages_table
from search_engine_ray.corpus.topics import generate_topics, parse_topics_lines, write_trec_topics
from search_engine_ray.oracle.indexer import OracleIndex
from search_engine_ray.oracle.scorers import score_bm25, score_bm25_adpt, score_tfidf

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
N_DOCS = 64
SEED = 1234
K = 30


def corpus_and_oracle():
    table = generate_pages_table(N_DOCS, seed=SEED)
    docs = list(zip(table["url"].to_pylist(), table["text"].to_pylist()))
    oracle = OracleIndex.build(docs, IndexOptions(True, True, True))
    return table, oracle


def topics_for(oracle):
    vocab = sorted(oracle.postings)[:200]
    specs = generate_topics(12, vocab, seed=77)
    lines = []
    path = os.path.join(GOLDEN_DIR, "topics.txt")
    write_trec_topics(path, specs)
    with open(path) as fh:
        lines = fh.read().splitlines()
    return parse_topics_lines(lines, QueryOptions(use_title=True), IndexOptions(True, True, True))


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    _table, oracle = corpus_and_oracle()

    with open(os.path.join(GOLDEN_DIR, "postings.txt"), "w") as fh:
        for term in sorted(oracle.postings):
            ids, tfs = oracle.postings[term]
            fh.write(f"{term}\t{len(ids)}\t{sum(tfs)}\t{hashlib.sha256(repr((ids, tfs)).encode()).hexdigest()[:16]}\n")
    with open(os.path.join(GOLDEN_DIR, "docs.txt"), "w") as fh:
        for name, dl in zip(oracle.doc_names, oracle.doc_lens):
            fh.write(f"{name}\t{dl}\n")

    topics = topics_for(oracle)
    scorers = {
        "TfIdf": lambda kws: score_tfidf(oracle, kws, K),
        "BM25": lambda kws: score_bm25(oracle, kws, k=K),
        "BM25ADPT": lambda kws: score_bm25_adpt(oracle, kws, k=K),
    }
    for name, fn in scorers.items():
        with open(os.path.join(GOLDEN_DIR, f"run-{name}.txt"), "w") as fh:
            for topic, kws in topics:
                for rank, (doc, score) in enumerate(fn(kws), 1):
                    fh.write(f"{topic} Q0 {doc} {rank} {score!r} golden\n")
    print(f"golden files written to {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
