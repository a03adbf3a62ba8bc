"""Deterministic synthetic Common-Crawl-style `pages` corpus.

Schema per BASELINE.json `input_hint`:
    url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string

Everything is a pure function of (n_docs, seed): Zipf-sampled ~10k-term
vocabulary, 50-2000 tokens/doc chunked into newline paragraphs, mixed
casing, stopwords, digit-bearing tokens, delimiter punctuation, and a fixed
block of adversarial documents exercising every reference quirk
(FIXTURES.md §1).  `html` wraps `text` via the exactly-invertible template
in ``extract.html_from_text``.  Rows are written sorted by url — doc_id is
defined as the row position in this order (SURVEY.md §1.3).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..text.stopwords import STOPWORDS_TUPLE
from .extract import html_from_text
from .links import nav_links_for_doc

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_SUFFIXES = (
    "", "", "", "", "s", "es", "ed", "ing", "ly", "ness", "ful", "ation",
    "ization", "ational", "iveness", "ousli", "biliti", "icate", "alize",
    "ement", "ible", "ant", "ize", "ies", "eed",
)

_ADVERSARIAL_DOCS: tuple[str, ...] = (
    # 4-char/1-char stopwords + 5-char stopword-prefix token (must survive)
    "been from have will with page part that this were more a s 1 2 3 thisx parts pages",
    # tag-shaped tokens, delimiter behavior, digits are not delimiters
    "<tag> word> normal @word a=b c:d e;f g?h i/j abc123 x<y keep<ok",
    # Porter edge words incl. short-word stem guard
    "caresses ponies ties caress cats feed agreed disabled matting mating "
    "meeting milling messing meetings ion sky agreed to be it ab xy",
    # single term repeated 300x (tf accumulation)
    " ".join(["echo"] * 300),
    # mixed-case duplicates fold into one posting
    "Word word WORD wOrd Word word",
    # hyphenated + quoted forms (index splitter breaks none of these on - or ')
    "state-of-the-art 'quoted' don't re-use multi-part-term",
)

# A term planted in >half of all docs to force a negative BM25 idf.
_COMMON_TERM = "ubiquitous"


def _make_vocab(rng: np.random.Generator, size: int = 10_000) -> list[str]:
    consonants = np.array(list("bcdfghjklmnpqrstvwxz"))
    vowels = np.array(list("aeiouy"))
    vocab: list[str] = []
    seen: set[str] = set()
    while len(vocab) < size:
        n_syll = int(rng.integers(1, 5))
        word = "".join(
            str(rng.choice(consonants)) + str(rng.choice(vowels))
            for _ in range(n_syll)
        )
        word += str(rng.choice(_SUFFIXES))
        if rng.random() < 0.03:
            word += str(rng.integers(0, 99))  # digit-bearing tokens
        if word and word not in seen:
            seen.add(word)
            vocab.append(word)
    return vocab


def generate_pages_table(n_docs: int, seed: int = 42, adversarial: bool = True) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.asarray(_make_vocab(rng), dtype=object)
    v = len(vocab)
    vocab_cap = np.asarray([w.capitalize() for w in vocab], dtype=object)
    vocab_up = np.asarray([w.upper() for w in vocab], dtype=object)
    stop_arr = np.asarray(STOPWORDS_TUPLE, dtype=object)

    # Zipf probabilities over the vocabulary.
    ranks = np.arange(1, v + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.07
    probs /= probs.sum()

    texts: list[str] = []
    n_random = n_docs - (len(_ADVERSARIAL_DOCS) if adversarial else 0)
    n_random = max(n_random, 0)

    doc_lens = rng.integers(50, 700, size=n_random)
    for d in range(n_random):
        n_tok = int(doc_lens[d])
        idx = rng.choice(v, size=n_tok, p=probs)
        style = rng.random(n_tok)
        toks = np.where(
            style < 0.04, vocab_cap[idx], np.where(style < 0.05, vocab_up[idx], vocab[idx])
        ).astype(object)
        # sprinkle stopwords (they must be removed by the engine)
        stop_mask = rng.random(n_tok) < 0.12
        toks[stop_mask] = stop_arr[rng.integers(0, len(stop_arr), size=int(stop_mask.sum()))]
        if d % 2 == 0:
            toks[int(rng.integers(0, n_tok))] = _COMMON_TERM
        # punctuation from the delimiter set between tokens
        seps = np.full(n_tok, " ", dtype=object)
        sep_style = rng.random(n_tok)
        seps[sep_style < 0.05] = ", "
        seps[(sep_style >= 0.05) & (sep_style < 0.09)] = ". "
        seps[(sep_style >= 0.09) & (sep_style < 0.10)] = "? "
        # paragraph breaks every ~12 tokens
        para = rng.random(n_tok) < 1.0 / 12.0
        seps[para] = "\n"
        seps[n_tok - 1] = ""
        texts.append("".join(t + s for t, s in zip(toks, seps)))

    if adversarial:
        texts.extend(_ADVERSARIAL_DOCS[: n_docs - n_random])

    n = len(texts)
    digests = [
        hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()[:12] for i in range(n)
    ]
    urls = [f"https://site{i % 997}.example/{digests[i]}" for i in range(n)]
    ts_base = np.datetime64("2025-01-01T00:00:00", "us")
    warc_ts = ts_base + (np.arange(n) * 1337).astype("timedelta64[s]").astype("timedelta64[us]")
    langs = ["de" if i % 53 == 0 else "en" for i in range(n)]
    htmls = [
        html_from_text(
            texts[i],
            title=f"page {digests[i]}",
            noise_seed=i,
            links=nav_links_for_doc(i, n),
        )
        for i in range(n)
    ]

    order = np.argsort(np.asarray(urls, dtype=object), kind="stable")
    table = pa.table(
        {
            "url": pa.array([urls[i] for i in order], pa.string()),
            "warc_ts": pa.array(warc_ts[order], pa.timestamp("us")),
            "html": pa.array([htmls[i] for i in order], pa.binary()),
            "text": pa.array([texts[i] for i in order], pa.string()),
            "lang": pa.array([langs[i] for i in order], pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    return table


def write_pages_parquet(
    out_dir: str,
    n_docs: int,
    seed: int = 42,
    n_files: int = 4,
    row_group_size: int = 2048,
    adversarial: bool = True,
) -> str:
    """Write the corpus as a directory of Parquet files (url-sorted across
    files; file k holds the k-th contiguous url range).  Idempotent: returns
    immediately if a matching corpus was already written (marker file)."""
    # v2: html carries the head <nav> outlink block (links.py) — the marker
    # version invalidates pre-links cached corpora in shared /tmp caches.
    marker = os.path.join(out_dir, f".complete-v2-{n_docs}-{seed}-{n_files}-{row_group_size}")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    table = generate_pages_table(n_docs, seed=seed, adversarial=adversarial)
    n = table.num_rows
    per_file = (n + n_files - 1) // n_files
    for f in range(n_files):
        lo = f * per_file
        hi = min(n, lo + per_file)
        if lo >= hi:
            break
        pq.write_table(
            table.slice(lo, hi - lo),
            os.path.join(out_dir, f"pages-{f:05d}.parquet"),
            row_group_size=row_group_size,
        )
    with open(marker, "w") as fh:
        fh.write("ok")
    return out_dir
