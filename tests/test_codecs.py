import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ivfadc_spark.functions.codecs import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_known():
    # 0 -> 0x00, 127 -> 0x7f, 128 -> 0x80 0x01, 300 -> 0xac 0x02
    assert varint_encode(np.array([0])) == b"\x00"
    assert varint_encode(np.array([127])) == b"\x7f"
    assert varint_encode(np.array([128])) == b"\x80\x01"
    assert varint_encode(np.array([300])) == b"\xac\x02"
    assert list(varint_decode(b"\x00\x7f\x80\x01\xac\x02")) == [0, 127, 128, 300]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
def test_varint_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    out = varint_decode(varint_encode(a), expected=len(vals))
    assert list(out) == vals


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300))
def test_delta_roundtrip(ids):
    a = np.array(sorted(ids), dtype=np.int64)
    out = delta_decode(delta_encode(a), expected=len(a))
    np.testing.assert_array_equal(out, a)


def test_delta_requires_sorted():
    with pytest.raises(ValueError):
        delta_encode(np.array([3, 1, 2]))


def test_delta_compression_wins():
    # dense docIDs compress to ~1 byte/posting vs 8 raw
    a = np.arange(10_000, dtype=np.int64) * 3 + 17
    assert len(delta_encode(a)) < 1.5 * len(a)
