"""Index maintenance: document tombstones (delete without rebuild).

Beyond-reference surface: the reference engine
(/root/reference/src/Indexing/WriteableIndex.cs) is build-once — removing
a document means re-indexing the corpus.  A long-lived web index needs
cheap deletes (takedowns, recrawls, spam removal); the standard design is
the Lucene-style tombstone: deleted doc names are recorded next to the
index, query-time scoring drops them from RESULTS while collection
statistics (df, avgdl) stay at their build values until the next rebuild
("compaction" here is simply rebuilding from the retained corpus — the
build is already resumable and incremental, engine/build.py).

Scale shape
-----------
``tombstones.parquet`` holds one ``name`` column — proportional to the
number of DELETED docs, not the corpus.  Readers turn it into a boolean
mask over doc ordinals once per actor (``IndexReader.deleted_mask``,
1 bit/doc in RAM — 125 MB per 10^9 docs, same footprint as the
filtered-retrieval mask).  At 10^12-doc scale the name->ordinal
resolution runs per doc-range shard (each shard actor resolves only
names that fall in its own docs partition), so no single process holds a
global name map.

Query semantics: tombstoned docs never appear in results; scores of
surviving docs are UNCHANGED (corpus-wide idf — the Lucene contract).
The WAND path's block-max bounds still count tombstoned postings, so
``score_topic`` falls back to exhaustive TAAT when tombstones exist
(auto mode; an explicit method='wand' request raises) — the same
stale-bounds discipline used for query-time BM25 params.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

TOMBSTONES_FILE = "tombstones.parquet"


def _path(index_dir: str) -> str:
    return os.path.join(index_dir, TOMBSTONES_FILE)


def tombstoned_names(index_dir: str) -> list[str]:
    """Currently tombstoned doc names (sorted; empty list if none)."""
    p = _path(index_dir)
    if not os.path.exists(p):
        return []
    return sorted(pq.read_table(p, columns=["name"])["name"].to_pylist())


def delete_docs(index_dir: str, names) -> int:
    """Tombstone ``names`` (idempotent union with any existing set).
    Returns the total number of tombstoned docs after the update.

    Names that are not in the index are recorded anyway (they may arrive
    before a pending incremental append lands) — the reader's mask build
    simply skips unresolvable names."""
    if not os.path.exists(os.path.join(index_dir, "stats.json")):
        raise FileNotFoundError(f"{index_dir} is not an index directory")
    merged = set(tombstoned_names(index_dir)) | {str(n) for n in names}
    out = sorted(merged)
    tmp = _path(index_dir) + ".tmp"
    pq.write_table(pa.table({"name": pa.array(out, pa.string())}), tmp)
    os.replace(tmp, _path(index_dir))
    return len(out)


def clear_tombstones(index_dir: str) -> int:
    """Remove all tombstones (e.g. after a compacting rebuild).  Returns
    how many were cleared."""
    n = len(tombstoned_names(index_dir))
    p = _path(index_dir)
    if os.path.exists(p):
        os.remove(p)
    return n
