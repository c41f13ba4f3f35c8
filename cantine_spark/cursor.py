"""Search cursor — wire-compatible port of cantine's SearchCursor
(cantine/src/model.rs:214-299) and its internal After counterpart
(cantine/src/index.rs:228-253).

Wire format: 25 bytes = tag(1) + sort-key(8) + uuid(16), url-safe base64
without padding (34 chars):
  tag 0: relevance — f32 big-endian in bytes 5..9, bytes 1..5 MUST be zero
  tag 1: u64 field — big-endian u64 in bytes 1..9
  tag 2: f64 field — big-endian f64 in bytes 1..9
Anything else → invalid (model.rs:235-247). Decode must never crash on
arbitrary input (property test at model.rs:321-392).
"""

from __future__ import annotations

import base64
import struct
from dataclasses import dataclass

SIZE = 25
ENCODED_LEN = 34

TAG_RELEVANCE = 0
TAG_U64 = 1
TAG_F64 = 2


class InvalidCursor(ValueError):
    pass


@dataclass(frozen=True)
class SearchCursor:
    tag: int
    value: float | int     # f32 for relevance, int for u64, float for f64
    uuid: bytes            # 16 raw bytes

    @classmethod
    def relevance(cls, score: float, uuid: bytes) -> SearchCursor:
        # round-trip through f32 — the wire slot is 4 bytes (model.rs:235-238)
        f32 = struct.unpack(">f", struct.pack(">f", score))[0]
        return cls(TAG_RELEVANCE, f32, uuid)

    @classmethod
    def u64_field(cls, value: int, uuid: bytes) -> SearchCursor:
        return cls(TAG_U64, int(value), uuid)

    @classmethod
    def f64_field(cls, value: float, uuid: bytes) -> SearchCursor:
        return cls(TAG_F64, float(value), uuid)

    def to_bytes(self) -> bytes:
        if len(self.uuid) != 16:
            raise InvalidCursor("uuid must be 16 bytes")
        if self.tag == TAG_RELEVANCE:
            head = b"\x00\x00\x00\x00\x00" + struct.pack(">f", self.value)
        elif self.tag == TAG_U64:
            head = b"\x01" + struct.pack(">Q", self.value)
        elif self.tag == TAG_F64:
            head = b"\x02" + struct.pack(">d", self.value)
        else:
            raise InvalidCursor(f"bad tag {self.tag}")
        return head + self.uuid

    @classmethod
    def from_bytes(cls, raw: bytes) -> SearchCursor:
        if len(raw) != SIZE:
            raise InvalidCursor("cursor must be 25 bytes")
        if raw[0:5] == b"\x00\x00\x00\x00\x00":
            return cls(TAG_RELEVANCE, struct.unpack(">f", raw[5:9])[0], raw[9:])
        if raw[0] == TAG_U64:
            return cls(TAG_U64, struct.unpack(">Q", raw[1:9])[0], raw[9:])
        if raw[0] == TAG_F64:
            return cls(TAG_F64, struct.unpack(">d", raw[1:9])[0], raw[9:])
        raise InvalidCursor("invalid payload")

    def encode(self) -> str:
        return base64.urlsafe_b64encode(self.to_bytes()).decode().rstrip("=")

    @classmethod
    def decode(cls, s: str) -> SearchCursor:
        """Total: raises InvalidCursor (never anything else) on bad input."""
        if not isinstance(s, str) or len(s) != ENCODED_LEN:
            raise InvalidCursor("wrong encoded length")
        try:
            raw = base64.urlsafe_b64decode(s + "==")
        except Exception as e:  # noqa: BLE001 — any decode failure is invalid
            raise InvalidCursor("bad base64") from e
        return cls.from_bytes(raw)
