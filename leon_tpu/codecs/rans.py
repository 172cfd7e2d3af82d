"""Static order-0 rANS entropy coder (FORMAT.md §7 method 2).

TPU-native replacement for the reference's serial adaptive range coder
([R] gatb-core tools/compression/RangeCoder.{hpp,cpp}): static per-stream
frequency tables (two-pass) + interleaved rANS states so both encode and
decode vectorize. v1 stub: encode() returns None so framing falls back to
zlib; the real implementation lands with the M3 performance milestone.
"""

from __future__ import annotations


def encode(data: bytes) -> bytes | None:
    return None


def decode(payload: bytes, rawlen: int) -> bytes:
    raise NotImplementedError("rANS frames not produced yet (method 2)")
