"""Per-segment term Bloom filters: skip cold segments at query time.

Query-time federation (`pipelines.federated_bm25_f64`) probes every
segment's terms table for every query term.  At 10^12 docs a corpus is
thousands of segments, and most terms live in few of them — the probe
itself (a row-group-pruned parquet read per segment per term) becomes
the latency floor.  The classic fix is a per-segment term Bloom filter
(the same trick LSM stores use per SSTable): a few bits per distinct
term, built once at index time, loaded once per query worker, answering
"definitely absent / maybe present" before any IO happens.

Bloom filters have NO false negatives, so a gated reader returns the
exact same postings as an ungated one — federation results stay
bit-identical (asserted in tests and in the driver gate) — while
segments that cannot contain any query term are never touched.

Build is one distributed pass over the segment's terms table reusing
the sharded builder from `dataops.membership` (md5be halves +
Kirsch-Mitzenmacher probes, (shard, position) int rows through one
groupby — nothing term-payload-sized moves).  The filter persists as
`term_bloom.parquet` inside the index directory, sized at
``bits_per_term`` bits per distinct term (default 12 → ~0.05 % false
positives at 5 hashes; 12 bits * 10^8 terms = 150 MB per segment,
broadcast once per node, not per query).

Reference parity note: the reference holds ONE process-global index
(ReadableIndex, Searcher.cs) and never needs this; it exists for the
multi-segment serving shape the reference cannot reach.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..dataops.membership import (
    BloomFilter,
    bloom_positions,
    build_bloom,
    md5_halves,
)
from .terms_io import terms_source

TERM_BLOOM_FILE = "term_bloom.parquet"


def _round_up8(n: int) -> int:
    return (n + 7) & ~7


def build_term_bloom(
    index_dir: str,
    *,
    bits_per_term: int = 12,
    n_hashes: int = 5,
    n_shards: int = 4,
) -> str:
    """Build `term_bloom.parquet` for one index segment and return its
    path.  Sizing comes from the build's own stats.json (`n_terms`), so
    the false-positive rate is stable regardless of segment size; the
    write is tmp+rename atomic so a crashed build never leaves a
    half-filter a reader could load."""
    with open(os.path.join(index_dir, "stats.json")) as fh:
        n_terms = int(json.load(fh)["n_terms"])
    n_bits = _round_up8(max(1024, n_terms * bits_per_term))
    if n_bits > 1 << 32:
        n_bits = 1 << 32
    terms = ray.data.read_parquet(terms_source(index_dir), columns=["term"])
    bloom = build_bloom(
        terms, "term", n_bits=n_bits, n_hashes=n_hashes, n_shards=n_shards
    )
    path = os.path.join(index_dir, TERM_BLOOM_FILE)
    tmp = path + ".tmp"
    pq.write_table(bloom.to_table(), tmp)
    os.replace(tmp, path)
    return path


def load_term_bloom(index_dir: str) -> BloomFilter | None:
    """Load a segment's term Bloom, or None if the segment has none
    (gating degrades to plain probing — never an error)."""
    path = os.path.join(index_dir, TERM_BLOOM_FILE)
    if not os.path.exists(path):
        return None
    return BloomFilter.from_table(pq.read_table(path))


def probe_terms(bloom: BloomFilter, terms: list[str]) -> np.ndarray:
    """Local (driver/actor-side, no Ray) membership probe: bool per term,
    True = maybe present.  Same hash scheme as `dataops.membership`
    (md5be halves, Kirsch-Mitzenmacher), pure numpy gathers against the
    already-loaded bitmaps."""
    if not terms:
        return np.empty(0, dtype=bool)
    h1, h2 = md5_halves(pa.array(terms, pa.string()))
    pos = bloom_positions(h1, h2, bloom.n_hashes, bloom.n_bits)
    shard = (h1 % np.uint64(bloom.n_shards)).astype(np.int64)
    bitmaps = np.stack(bloom.bitmaps)
    byte = bitmaps[shard[:, None], (pos >> np.uint64(3)).astype(np.int64)]
    hit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
    return hit.all(axis=1)


class BloomGatedReader:
    """IndexReader wrapper that consults the segment's term Bloom before
    any postings/df probe.  Bloom-negative terms return None (exactly
    what the reader returns for absent terms — J1's silent-drop
    contract) without touching the terms table or postings files.

    Counters `n_probes` / `n_skipped` expose the gating effect for
    tests and diagnostics.  Every other attribute (n_docs, stats,
    doc_names, avgdl, deleted_mask, ...) delegates to the wrapped
    reader, so the wrapper drops into `federated_bm25_f64` and the
    scorer pipelines unchanged."""

    def __init__(self, reader, bloom: BloomFilter | None):
        self._reader = reader
        self._bloom = bloom
        self.n_probes = 0
        self.n_skipped = 0

    @classmethod
    def open(cls, index_dir: str, preload: bool = False) -> "BloomGatedReader":
        from .index_reader import IndexReader

        return cls(IndexReader(index_dir, preload=preload), load_term_bloom(index_dir))

    def _maybe_has(self, term: str) -> bool:
        if self._bloom is None:
            return True
        return bool(probe_terms(self._bloom, [term])[0])

    def postings(self, term: str):
        if not self._maybe_has(term):
            self.n_skipped += 1
            return None
        self.n_probes += 1
        return self._reader.postings(term)

    def df(self, term: str):
        if not self._maybe_has(term):
            self.n_skipped += 1
            return None
        self.n_probes += 1
        return self._reader.df(term)

    def __getattr__(self, name):
        return getattr(self._reader, name)
