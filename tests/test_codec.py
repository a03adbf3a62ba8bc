"""Delta+VByte codec: decode(encode(x)) == x, vectorized offsets correct."""

import numpy as np
from hypothesis import given, strategies as st

from search_engine_ray.engine.codec import (
    delta_decode,
    delta_encode,
    vbyte_decode,
    vbyte_encode,
    vbyte_encode_offsets,
)


def test_empty():
    assert vbyte_encode(np.array([], dtype=np.int64)) == b""
    assert len(vbyte_decode(b"")) == 0
    assert delta_encode(np.array([], dtype=np.int64)) == b""


def test_known_values():
    vals = np.array([0, 1, 127, 128, 255, 16383, 16384, 2**40, 2**63 - 1], dtype=np.uint64)
    out = vbyte_decode(vbyte_encode(vals), len(vals))
    assert (out == vals).all()


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_vbyte_roundtrip(values):
    vals = np.asarray(values, dtype=np.uint64)
    got = vbyte_decode(vbyte_encode(vals))
    assert got.tolist() == values


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200, unique=True)
)
def test_delta_roundtrip(values):
    ids = np.asarray(sorted(values), dtype=np.int64)
    got = delta_decode(delta_encode(ids), len(ids))
    assert got.tolist() == ids.tolist()


def test_offsets_slicing():
    vals = np.array([5, 300, 0, 2**21, 7], dtype=np.uint64)
    buf, ends = vbyte_encode_offsets(vals)
    # slicing the buffer at any value boundary yields a valid stream
    for split in range(1, len(vals)):
        left = buf[: ends[split - 1]].tobytes()
        right = buf[ends[split - 1] :].tobytes()
        assert vbyte_decode(left).tolist() == vals[:split].tolist()
        assert vbyte_decode(right).tolist() == vals[split:].tolist()


def test_delta_rejects_unsorted():
    import pytest

    with pytest.raises(ValueError):
        delta_encode(np.array([3, 2], dtype=np.int64))
