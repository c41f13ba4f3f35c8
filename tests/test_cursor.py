"""Cursor codec — wire-format parity with cantine/src/model.rs:214-299 and
the property tests at model.rs:321-392."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given
from hypothesis import strategies as st

from cantine_spark.cursor import (
    ENCODED_LEN, SIZE, InvalidCursor, SearchCursor,
)

UUID = bytes(range(16))


def test_relevance_layout():
    c = SearchCursor.relevance(1.5, UUID)
    raw = c.to_bytes()
    assert len(raw) == SIZE
    # tag 0 + 4 zero-padding bytes, then f32 BE (model.rs:235-238,253-257)
    assert raw[0:5] == b"\x00\x00\x00\x00\x00"
    assert struct.unpack(">f", raw[5:9])[0] == 1.5
    assert raw[9:] == UUID


def test_u64_and_f64_layout():
    assert SearchCursor.u64_field(7, UUID).to_bytes()[0] == 1
    assert SearchCursor.f64_field(7.5, UUID).to_bytes()[0] == 2
    raw = SearchCursor.u64_field(300, UUID).to_bytes()
    assert struct.unpack(">Q", raw[1:9])[0] == 300


def test_encoded_length_is_34():
    assert len(SearchCursor.relevance(0.25, UUID).encode()) == ENCODED_LEN


@pytest.mark.parametrize("cur", [
    SearchCursor.relevance(3.25, UUID),
    SearchCursor.u64_field(2**63, UUID),
    SearchCursor.f64_field(-1.75e300, UUID),
])
def test_round_trip(cur):
    assert SearchCursor.decode(cur.encode()) == cur


def test_invalid_tag_rejected():
    raw = b"\x07" + bytes(24)
    with pytest.raises(InvalidCursor):
        SearchCursor.from_bytes(raw)
    # tag 0 with nonzero padding is also invalid (model.rs:235 checks 5 bytes)
    raw = b"\x00\x01\x00\x00\x00" + bytes(20)
    with pytest.raises(InvalidCursor):
        SearchCursor.from_bytes(raw)


@given(st.text(max_size=80))
def test_decode_never_crashes_on_text(s):
    try:
        SearchCursor.decode(s)
    except InvalidCursor:
        pass  # the only allowed failure mode (model.rs:321-392)


@given(st.binary(min_size=25, max_size=25))
def test_from_bytes_total(b):
    try:
        cur = SearchCursor.from_bytes(b)
        # valid parses must round-trip through bytes
        assert SearchCursor.from_bytes(cur.to_bytes()) == cur
    except InvalidCursor:
        pass
