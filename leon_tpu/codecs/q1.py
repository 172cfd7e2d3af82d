"""Position-aware quality coder (FORMAT.md §7 method 4).

Adaptive binary range coder whose context is (previous quality value,
quantized quality two back, machine-cycle bucket) — the fqzcomp/Quip
context family, matched to how Illumina quality strings actually
correlate. Needs the per-read lengths (context resets at read starts),
which the decoder takes from the block's readlen stream. Implemented in
C++ (leon_tpu/native/leon_native.cpp). Replaces the reference's zlib
deflate of the quality stream ([R] Leon.cpp qual stream) at 2-4x
smaller on realistic quality data.
"""

from __future__ import annotations

import ctypes

import numpy as np


def _lens_ptr(lens: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(lens, dtype=np.int64))


def encode(data: bytes, lens: np.ndarray) -> bytes | None:
    from leon_tpu import native

    lib = native.get_lib()
    if lib is None or not data:
        return None
    lens = _lens_ptr(lens)
    if int(lens.sum()) != len(data):
        return None
    # random data can expand a few % under the fast-adapting model; the
    # frame chooser drops oversized results, so size the buffer generously
    cap = len(data) + len(data) // 4 + 64
    out = ctypes.create_string_buffer(cap)
    n = lib.leon_q1_encode(data, len(data), lens.ctypes.data, len(lens), out, cap)
    if n <= 0:
        return None
    return out.raw[:n]


def decode(payload: bytes, rawlen: int, lens: np.ndarray) -> bytes:
    from leon_tpu import native

    lib = native.get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable; cannot decode method-4 frame")
    lens = _lens_ptr(lens)
    if int(lens.sum()) != rawlen:
        raise ValueError("method-4 frame: read lengths do not sum to stream length")
    out = ctypes.create_string_buffer(rawlen)
    n = lib.leon_q1_decode(payload, len(payload), lens.ctypes.data, len(lens), out, rawlen)
    if n != rawlen:
        raise ValueError(f"q1 decode failed ({n} != {rawlen})")
    return out.raw[:rawlen]
