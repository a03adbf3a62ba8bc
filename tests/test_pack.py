"""Sequence packing (dataops/pack.py): span math, fragment invariance,
bin fill stats."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.dataops.pack import bin_fill_stats, pack_sequences

TEXTS = [
    "one two three",
    "",
    "a b c d e f g",
    "single",
    "  spaced   out  tokens ",
    "x " * 50,
]
IDS = list(range(len(TEXTS)))


def _write(dirpath: str, row_group_size: int, n_files: int = 1):
    os.makedirs(dirpath, exist_ok=True)
    tbl = pa.table({"doc_id": pa.array(IDS, pa.int64()), "text": pa.array(TEXTS)})
    per = (len(IDS) + n_files - 1) // n_files
    for i in range(n_files):
        part = tbl.slice(i * per, per)
        if part.num_rows:
            pq.write_table(part, os.path.join(dirpath, f"f{i}.parquet"), row_group_size=row_group_size)


def _brute(seq_len: int):
    out = []
    start = 0
    for d, t in zip(IDS, TEXTS):
        n = len(t.split())
        if n > 0:
            out.append((d, n, start, start // seq_len, (start + n - 1) // seq_len))
        start += n
    return out


@pytest.mark.parametrize("row_group_size,n_files", [(100, 1), (2, 1), (3, 3)])
def test_pack_sequences_matches_brute_and_partition_invariant(
    ray_session, tmp_path, row_group_size, n_files
):
    d = str(tmp_path / f"c{row_group_size}_{n_files}")
    _write(d, row_group_size, n_files)
    got = (
        pack_sequences(d, seq_len=8)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    exp = _brute(8)
    assert list(map(tuple, got.to_numpy())) == exp


def test_pack_sequences_rejects_bad_seq_len(ray_session, tmp_path):
    d = str(tmp_path / "c")
    _write(d, 100)
    with pytest.raises(ValueError):
        pack_sequences(d, seq_len=0)


def test_bin_fill_stats(ray_session, tmp_path):
    d = str(tmp_path / "c")
    _write(d, 2, 2)
    seq_len = 8
    packed = pack_sequences(d, seq_len=seq_len)
    out = bin_fill_stats(packed, seq_len=seq_len).to_pandas()
    cnt_col = next(c for c in out.columns if c.startswith("count"))
    got = {
        int(r["bin"]): (int(r[cnt_col]), int(r["n_tokens"]))
        for _, r in out.iterrows()
    }

    exp_docs: dict[int, int] = {}
    exp_toks: dict[int, int] = {}
    for _, n, start, first, last in _brute(seq_len):
        for b in range(first, last + 1):
            lo, hi = b * seq_len, (b + 1) * seq_len
            used = min(start + n, hi) - max(start, lo)
            exp_docs[b] = exp_docs.get(b, 0) + 1
            exp_toks[b] = exp_toks.get(b, 0) + used
    assert got == {b: (exp_docs[b], exp_toks[b]) for b in exp_docs}
    # every full bin holds exactly seq_len tokens
    total = sum(n for _, n, *_ in _brute(seq_len))
    for b, (_, toks) in got.items():
        if b < total // seq_len:
            assert toks == seq_len
