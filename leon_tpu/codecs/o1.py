"""Order-1 adaptive binary range coder (FORMAT.md §7 method 3).

Context = previous byte; LZMA-style bit-tree per context, implemented in
C++ (leon_tpu/native/leon_native.cpp). Used for quality streams, where it
beats both zlib (the reference's choice, [R] Leon.cpp) and static order-0
rANS by a wide margin.
"""

from __future__ import annotations

import ctypes


def encode(data: bytes) -> bytes | None:
    from leon_tpu import native

    lib = native.get_lib()
    if lib is None or not data:
        return None
    # random data can expand a few % under the fast-adapting model; the
    # frame chooser drops oversized results, so size the buffer generously
    cap = len(data) + len(data) // 4 + 64
    out = ctypes.create_string_buffer(cap)
    n = lib.leon_o1_encode(data, len(data), out, cap)
    if n <= 0:
        return None
    return out.raw[:n]


def decode(payload: bytes, rawlen: int) -> bytes:
    from leon_tpu import native

    lib = native.get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable; cannot decode method-3 frame")
    out = ctypes.create_string_buffer(rawlen)
    n = lib.leon_o1_decode(payload, len(payload), out, rawlen)
    if n != rawlen:
        raise ValueError(f"order-1 decode failed ({n} != {rawlen})")
    return out.raw[:rawlen]
