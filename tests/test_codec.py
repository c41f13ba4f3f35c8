"""Varint/delta codec — round-trip property tests (the reference relies on
tantivy's own compression tests; ours must stand alone)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from cantine_spark.build.codec import (
    decode_deltas, decode_varint, encode_deltas, encode_varint,
)


def test_empty():
    assert encode_varint(np.array([], dtype=np.uint64)) == b""
    assert len(decode_varint(b"")) == 0


def test_known_values():
    # classic LEB128 vectors
    assert encode_varint(np.array([0], dtype=np.uint64)) == b"\x00"
    assert encode_varint(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert encode_varint(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert encode_varint(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@given(arrays(np.uint64, st.integers(0, 500),
              elements=st.integers(0, 2**64 - 1)))
@settings(max_examples=200)
def test_varint_round_trip(a):
    assert np.array_equal(decode_varint(encode_varint(a)), a)


@given(st.lists(st.integers(0, 2**40), min_size=0, max_size=300, unique=True))
def test_delta_round_trip(ids):
    a = np.array(sorted(ids), dtype=np.uint64)
    assert np.array_equal(decode_deltas(encode_deltas(a)), a)


def test_compression_wins_on_dense_ids():
    ids = np.arange(10_000, dtype=np.uint64) * 3 + 1_000_000
    enc = encode_deltas(ids)
    assert len(enc) < len(ids) * 2  # gaps of 3 → ~1 byte each + header
