"""Ragged slice moves between flat uint8 buffers.

The hot host loops (parser field gathers, block stream assembly, record
writing) are all "copy slice i of src to slice i of dst". numpy does this
with materialized per-byte int64 index arrays — 8x the payload in memory
traffic, which dominates on the throttled shared host. The native path
(leon_native.cpp leon_ragged_move) is a memcpy per slice.

All entry points bounds-check against the buffers (starts/lens may come
from a parsed container, i.e. untrusted), then dispatch to C++ or the
numpy fallback.
"""

from __future__ import annotations

import numpy as np

from leon_tpu.native import get_lib


def _ragged_dst(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Per-byte indices: slice i occupies [starts[i], starts[i]+lens[i])."""
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    rep = np.repeat(starts.astype(np.int64), lens)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(lens, dtype=np.int64) - lens, lens
    )
    return rep + within


def _check(buf: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> None:
    if starts.size == 0:
        return
    if int(starts.min()) < 0 or int(lens.min()) < 0:
        raise ValueError("ragged move: negative start or length")
    if int((starts + lens).max()) > buf.size:
        raise ValueError("ragged move: slice out of bounds")


def _as_i64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.int64))


def move(dst: np.ndarray, dst_starts, src: np.ndarray, src_starts, lens) -> None:
    """dst[dst_starts[i]:+lens[i]] = src[src_starts[i]:+lens[i]] for all i."""
    dst_starts, src_starts, lens = _as_i64(dst_starts), _as_i64(src_starts), _as_i64(lens)
    _check(dst, dst_starts, lens)
    _check(src, src_starts, lens)
    lib = get_lib()
    if (lib is not None and dst.dtype == np.uint8 and src.dtype == np.uint8
            and dst.flags.c_contiguous and src.flags.c_contiguous):
        lib.leon_ragged_move(
            dst.ctypes.data, dst_starts.ctypes.data, src.ctypes.data,
            src_starts.ctypes.data, lens.ctypes.data, len(lens),
        )
        return
    dst[_ragged_dst(dst_starts, lens)] = src[_ragged_dst(src_starts, lens)]


def gather(src: np.ndarray, starts, lens) -> np.ndarray:
    """Concatenate slices [starts[i], starts[i]+lens[i]) of src."""
    starts, lens = _as_i64(starts), _as_i64(lens)
    csum = np.cumsum(lens, dtype=np.int64)
    out = np.empty(int(csum[-1]) if lens.size else 0, dtype=np.uint8)
    move(out, csum - lens, src, starts, lens)
    return out


def scatter(dst: np.ndarray, starts, lens, src: np.ndarray) -> None:
    """Spread consecutive slices of src to [starts[i], ...) of dst."""
    starts, lens = _as_i64(starts), _as_i64(lens)
    csum = np.cumsum(lens, dtype=np.int64)
    if src.dtype != np.uint8:
        src = np.asarray(src, dtype=np.uint8)
    move(dst, starts, src, csum - lens, lens)


def fill(dst: np.ndarray, starts, lens, value: int) -> None:
    """dst[starts[i]:+lens[i]] = value for all i."""
    starts, lens = _as_i64(starts), _as_i64(lens)
    _check(dst, starts, lens)
    lib = get_lib()
    if lib is not None and dst.dtype == np.uint8 and dst.flags.c_contiguous:
        lib.leon_ragged_fill(dst.ctypes.data, starts.ctypes.data,
                             lens.ctypes.data, len(lens), value & 0xFF)
        return
    dst[_ragged_dst(starts, lens)] = value
