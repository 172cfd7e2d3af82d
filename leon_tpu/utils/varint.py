"""LEB128 varints + zigzag, with numpy-vectorized bulk paths.

The reference's per-stream payloads are byte streams produced by tight C++
loops; here bulk encode/decode is vectorized numpy so the host never loops
per value in Python.
"""

from __future__ import annotations

import numpy as np


def encode_one(value: int, out: bytearray) -> None:
    v = int(value)
    if v < 0:
        raise ValueError("varint is unsigned")
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def decode_one(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def zigzag(v: np.ndarray | int):
    v = np.asarray(v, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def unzigzag(u: np.ndarray | int):
    u = np.asarray(u, dtype=np.uint64)
    return ((u >> 1).astype(np.int64)) ^ -(u & 1).astype(np.int64)


_THRESHOLDS = np.array([1 << (7 * g) for g in range(1, 10)], dtype=np.uint64)


def encode_array(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of a uint array (any values < 2^63)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value
    nbytes = np.ones(v.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += (v >= t).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    total = int(offsets[-1] + nbytes[-1])
    out = np.zeros(total, dtype=np.uint8)
    maxg = int(nbytes.max())
    for g in range(maxg):
        mask = nbytes > g
        idx = offsets[mask] + g
        byte = ((v[mask] >> np.uint64(7 * g)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] - 1 > g).astype(np.uint8) << 7
        out[idx] = byte | cont
    return out.tobytes()


def decode_array(buf: bytes, count: int | None = None) -> np.ndarray:
    """Vectorized LEB128 decode of a whole buffer; returns uint64 array.

    If count is given, asserts that exactly `count` values were decoded.
    """
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        out = np.zeros(0, dtype=np.uint64)
        if count:
            raise ValueError(f"expected {count} varints, got 0")
        return out
    term = np.flatnonzero((b & 0x80) == 0)
    starts = np.concatenate(([0], term[:-1] + 1))
    lengths = term - starts + 1
    values = np.zeros(term.size, dtype=np.uint64)
    maxg = int(lengths.max())
    for g in range(maxg):
        mask = lengths > g
        values[mask] |= (b[starts[mask] + g].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * g)
    if count is not None and values.size != count:
        raise ValueError(f"expected {count} varints, got {values.size}")
    return values
