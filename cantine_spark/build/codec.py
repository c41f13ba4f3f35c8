"""Posting-list compression codec — delta + varint, fully vectorized numpy.

The reference delegates compression to tantivy's segment format (bitpacked
doc-id gaps + tfs); this is our from-scratch equivalent for the SPIMI
segment tables (north rule: "delta-encodes and varint/bitpacks docID gaps and
term frequencies into segment files").

Both encode and decode are O(max_varint_len)=10 numpy passes over the whole
array — no per-element Python (input_hint mandate). LEB128 layout: 7 value
bits per byte, little-endian chunks, high bit = continuation.
"""

from __future__ import annotations

import numpy as np


def encode_varint_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """uint64 array → (LEB128 bytes, per-value byte count). The lengths let
    a caller slice the one big encoded buffer into per-block blobs without
    re-encoding per block (the whole-column encode is one vectorized pass)."""
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    if len(vals) == 0:
        return b"", np.empty(0, dtype=np.int64)
    nb = np.ones(len(vals), dtype=np.int64)
    v = vals.copy()
    for _ in range(1, 10):
        v >>= np.uint64(7)
        nz = v > 0
        if not nz.any():
            break  # all remaining bytes would be 0 — tf/dl/gap columns are
            # overwhelmingly 1-2 byte values, so this skips ~7 full passes
        nb += nz
    total = int(nb.sum())
    out = np.zeros(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
    for i in range(10):
        mask = nb > i
        if not mask.any():
            break
        chunk = ((vals[mask] >> np.uint64(7 * i)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[mask] > i + 1).astype(np.uint8) << 7
        out[starts[mask] + i] = chunk | cont
    return out.tobytes(), nb


def encode_varint(values: np.ndarray) -> bytes:
    """uint64 array → LEB128 bytes."""
    return encode_varint_with_lengths(values)[0]


def decode_varint(buf: bytes) -> np.ndarray:
    """LEB128 bytes → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    n_vals = int(is_last.sum())
    # value index of each byte: 0-based, increments after each terminal byte
    val_id = np.zeros(len(b), dtype=np.int64)
    val_id[1:] = np.cumsum(is_last[:-1])
    # position of each byte within its value
    starts_mask = np.ones(len(b), dtype=bool)
    starts_mask[1:] = is_last[:-1]
    start_idx = np.flatnonzero(starts_mask)
    pos_in_val = np.arange(len(b)) - start_idx[val_id]
    out = np.zeros(n_vals, dtype=np.uint64)
    np.add.at(out, val_id,
              (b & 0x7F).astype(np.uint64) << (np.uint64(7) * pos_in_val.astype(np.uint64)))
    return out


def encode_deltas(sorted_ids: np.ndarray) -> bytes:
    """strictly-increasing int64 ids → varint(first, gaps-1... ) actually
    varint([first, d1, d2, ...]) with d = diff (≥1 for strict order)."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if len(a) == 0:
        return b""
    deltas = np.empty(len(a), dtype=np.uint64)
    deltas[0] = a[0]
    deltas[1:] = a[1:] - a[:-1]
    return encode_varint(deltas)


def decode_deltas(buf: bytes) -> np.ndarray:
    deltas = decode_varint(buf)
    if len(deltas) == 0:
        return deltas
    return np.cumsum(deltas, dtype=np.uint64)
