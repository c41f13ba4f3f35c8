"""Pure-Python XXH64 — bit-identical to Spark's `xxhash64` expression.

The query planner needs bucket = pmod(xxhash64(field, term), N_BUCKETS) for
partition pruning (build/builder.py writes postings partitioned by it).
Launching a 1-row Spark job per term to compute it costs ~100ms of driver
latency per first-seen term; this implementation is exact and free.

Spark semantics (org.apache.spark.sql.catalyst.expressions.XxHash64):
multi-argument hashing chains — result = 42 (default seed), then for each
column: result = XXH64(utf8_bytes(col), seed=result). XXH64 itself follows
the public xxHash spec (Yann Collet, BSD). Parity is locked by
tests/test_xxhash.py against the Spark expression.
"""

from __future__ import annotations

import struct

_M = 0xFFFFFFFFFFFFFFFF
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & _M
    return (_rotl(acc, 31) * P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * P1 + P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed & _M
        v4 = (seed - P1) & _M
        while i <= n - 32:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, i)
            v1, v2 = _round(v1, l1), _round(v2, l2)
            v3, v4 = _round(v3, l3), _round(v4, l4)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        (k1,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k1)
        h = (_rotl(h, 27) * P1 + P4) & _M
        i += 8
    if i <= n - 4:
        (k1,) = struct.unpack_from("<I", data, i)
        h ^= (k1 * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def spark_xxhash64_strings(*cols: str, seed: int = 42) -> int:
    """Spark's multi-column xxhash64 over string columns → SIGNED i64."""
    h = seed
    for c in cols:
        h = xxh64(c.encode("utf-8"), h)
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of(field: str, term: str, n_buckets: int) -> int:
    """pmod(xxhash64(field, term), n_buckets) — Spark pmod semantics."""
    return spark_xxhash64_strings(field, term) % n_buckets
