"""Approximate set membership: a sharded distributed Bloom filter.

The crawl-frontier primitive the reference's "Do not add the same
document twice!" contract (WriteableIndex.cs:27-30) pushes onto the
caller: at 10^12 urls an exact seen-set is a key-sized shuffle on EVERY
incremental batch, while a Bloom filter answers "definitely new /
maybe seen" from a few GB of bits that broadcast once.

Build moves (shard, position) int rows — 16 bytes per key through ONE
hash-partitioned shuffle (the same order as any exact global dedup,
paid once) — and each shard group packs its own bitmap in a single
vectorized ``np.bitwise_or.reduceat``-free pass (np.unique + packbits).
Probe broadcasts the bitmap list via ``ray.put`` once and bit-tests
each batch with pure numpy; no per-probe shuffle ever happens, which is
the whole point at scale.

Hashing is SQL-reproducible by construction: the two independent
64-bit hashes are the big-endian halves of ``md5(key)`` (the repo's
md5be convention, dedup.py:60) and the k probe positions follow
Kirsch-Mitzenmacher ``(h1 + i*h2) mod m`` computed entirely below
2^63 (both operands pre-reduced mod m <= 2^32), so DuckDB UBIGINT
arithmetic reproduces every position without overflow and an EXISTS
over the inserted keys' positions reproduces membership — including
false positives — bit-exactly.

No false negatives, deterministic false positives: both are asserted
in tests and in the driver gate's self-check.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def md5_halves(col) -> tuple[np.ndarray, np.ndarray]:
    """Per-value (h1, h2) uint64 pairs: big-endian first/second 8 bytes of
    md5(value) — hashed once per DISTINCT value via dictionary encode
    (the dedup._token_lists pattern).  Null hashes as the empty string.

    SQL parity: ``('0x' || substr(md5(v), 1,16))::UBIGINT`` and
    ``('0x' || substr(md5(v),17,16))::UBIGINT``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
        col = pc.cast(col, pa.string())
    denc = pc.dictionary_encode(pc.fill_null(col, ""))
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    uniq = denc.dictionary.to_pylist()
    digs = [hashlib.md5(u.encode()).digest() for u in uniq]
    uh1 = np.fromiter(
        (int.from_bytes(d[:8], "big") for d in digs), dtype=np.uint64, count=len(digs)
    )
    uh2 = np.fromiter(
        (int.from_bytes(d[8:], "big") for d in digs), dtype=np.uint64, count=len(digs)
    )
    codes = np.asarray(denc.indices, dtype=np.int64)
    if len(codes) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    return uh1[codes], uh2[codes]


def bloom_positions(
    h1: np.ndarray, h2: np.ndarray, n_hashes: int, n_bits: int
) -> np.ndarray:
    """(n, n_hashes) uint64 bit positions, Kirsch-Mitzenmacher: position_i
    = (h1 % m + i * (h2 % m)) % m.  Pre-reducing both halves keeps every
    intermediate below n_hashes * 2^32 << 2^63, so the identical formula
    runs in DuckDB UBIGINT without overflow."""
    m = np.uint64(n_bits)
    a = h1 % m
    b = h2 % m
    i = np.arange(n_hashes, dtype=np.uint64)
    return (a[:, None] + i[None, :] * b[:, None]) % m


@dataclass
class BloomFilter:
    """n_shards packed bitmaps (uint8, LSB-first within a byte) + the
    hash-scheme parameters.  ``shard_of = h1 % n_shards``."""

    bitmaps: list[np.ndarray]
    n_bits: int
    n_hashes: int

    @property
    def n_shards(self) -> int:
        return len(self.bitmaps)

    def to_table(self) -> pa.Table:
        return pa.table(
            {
                "shard": pa.array(np.arange(self.n_shards, dtype=np.int64)),
                "bits": pa.array(
                    [b.tobytes() for b in self.bitmaps], pa.binary()
                ),
                "n_bits": pa.array([self.n_bits] * self.n_shards, pa.int64()),
                "n_hashes": pa.array([self.n_hashes] * self.n_shards, pa.int64()),
            }
        )

    @classmethod
    def from_table(cls, tbl: pa.Table) -> "BloomFilter":
        order = np.argsort(np.asarray(tbl["shard"], dtype=np.int64))
        bits = tbl["bits"].to_pylist()
        return cls(
            bitmaps=[np.frombuffer(bits[i], dtype=np.uint8).copy() for i in order],
            n_bits=int(tbl["n_bits"][0].as_py()),
            n_hashes=int(tbl["n_hashes"][0].as_py()),
        )


def build_bloom(
    ds: ray.data.Dataset,
    key_column: str,
    *,
    n_bits: int = 1 << 27,
    n_hashes: int = 3,
    n_shards: int = 16,
) -> BloomFilter:
    """Build a sharded Bloom filter over ``key_column``.

    Each key routes to shard ``h1 % n_shards`` and sets ``n_hashes`` bits
    in that shard's ``n_bits``-bit map.  The only exchange is the
    (shard, position) int rows — deduplicated per batch first, so Zipf
    keys collapse before they move; total filter size is
    n_shards * n_bits / 8 bytes, sized so ONE shard's bitmap fits a
    worker heap (the 100 TB shape: 256 shards x 2^33 bits = 256 GB of
    filter built without any single node holding more than 1 GB)."""
    if n_bits < 8 or n_bits % 8:
        raise ValueError("n_bits must be a positive multiple of 8")
    if n_hashes < 1 or n_shards < 1:
        raise ValueError("n_hashes and n_shards must be >= 1")
    if n_bits > 1 << 32:
        raise ValueError("n_bits must be <= 2^32 (SQL-overflow-safe domain)")

    def positions(batch: pa.Table) -> pa.Table:
        h1, h2 = md5_halves(batch[key_column])
        pos = bloom_positions(h1, h2, n_hashes, n_bits)
        shard = (h1 % np.uint64(n_shards)).astype(np.int64)
        flat = np.repeat(shard, n_hashes) * np.int64(n_bits) + pos.astype(
            np.int64
        ).reshape(-1)
        flat = np.unique(flat)  # per-batch dedup before the shuffle
        return pa.table(
            {
                "shard": pa.array(flat // np.int64(n_bits)),
                "pos": pa.array(flat % np.int64(n_bits)),
            }
        )

    def pack(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {"shard": pa.array([], pa.int64()), "bits": pa.array([], pa.binary())}
            )
        shard = int(group["shard"][0].as_py())
        pos = np.asarray(group["pos"], dtype=np.int64)
        # set bits directly in the PACKED array: an unpacked n_bits-byte
        # temp would be 8x the bitmap (4 GB at the 2^32 max) per task
        packed = np.zeros(n_bits // 8, dtype=np.uint8)
        np.bitwise_or.at(
            packed, pos >> 3, np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8))
        )
        return pa.table(
            {
                "shard": pa.array([shard], pa.int64()),
                "bits": pa.array([packed.tobytes()], pa.binary()),
            }
        )

    rows = (
        ds.map_batches(positions, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pack, batch_format="pyarrow")
        .take_all()
    )
    bitmaps = [np.zeros(n_bits // 8, dtype=np.uint8) for _ in range(n_shards)]
    for r in rows:
        bitmaps[int(r["shard"])] = np.frombuffer(r["bits"], dtype=np.uint8).copy()
    return BloomFilter(bitmaps=bitmaps, n_bits=n_bits, n_hashes=n_hashes)


def bloom_probe(
    ds: ray.data.Dataset,
    key_column: str,
    bloom: BloomFilter,
    *,
    out_column: str = "maybe_member",
) -> ray.data.Dataset:
    """Append a bool column: True iff ALL n_hashes bits for the key are
    set in its shard's bitmap (Bloom semantics — no false negatives,
    deterministic false positives).  The bitmaps ship via ``ray.put``
    ONCE; every batch bit-tests with three vectorized gathers."""
    bits_ref = ray.put(np.stack(bloom.bitmaps))  # (n_shards, n_bits/8)
    n_bits, n_hashes = bloom.n_bits, bloom.n_hashes
    n_shards = bloom.n_shards

    def probe(batch: pa.Table) -> pa.Table:
        bitmaps = ray.get(bits_ref)
        h1, h2 = md5_halves(batch[key_column])
        if len(h1) == 0:
            return batch.append_column(out_column, pa.array([], pa.bool_()))
        pos = bloom_positions(h1, h2, n_hashes, n_bits)
        shard = (h1 % np.uint64(n_shards)).astype(np.int64)
        byte = bitmaps[shard[:, None], (pos >> np.uint64(3)).astype(np.int64)]
        hit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        member = hit.all(axis=1)
        return batch.append_column(out_column, pa.array(member))

    return ds.map_batches(probe, batch_format="pyarrow")


def bloom_dedup_new(
    ds: ray.data.Dataset,
    key_column: str,
    bloom: BloomFilter,
) -> ray.data.Dataset:
    """The crawl-frontier filter: keep only rows whose key is DEFINITELY
    new (probe says not-member).  Sound — never drops a genuinely new
    key that the filter has seen — but lossy the other way: a false
    positive drops a new key, the documented Bloom trade."""
    probed = bloom_probe(ds, key_column, bloom, out_column="__seen")

    def keep_new(batch: pa.Table) -> pa.Table:
        mask = pc.invert(batch["__seen"])
        return batch.filter(mask).drop_columns(["__seen"])

    return probed.map_batches(keep_new, batch_format="pyarrow")
