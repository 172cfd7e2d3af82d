"""Header codec (FORMAT.md §8).

Behavior contract from the reference's HeaderCoder ([R] gatb-core
tools/compression/HeaderCoder.{hpp,cpp}): sequencing headers are highly
structured (instrument:run:flowcell:lane:tile:x:y ...) and compress best
field-wise against the previous header. v1 payload: headers joined with
'\\n' (headers are lines, so '\\n' cannot occur inside one); the field-delta
transform is applied as a byte-stream preconditioner before framing.

When header_mode=0 at decode, reads are named `read_<i>` (global 0-based
index), mirroring the reference's -noheader reconstruction.
"""

from __future__ import annotations


def encode(headers: list[bytes]) -> bytes:
    return b"\n".join(headers)


def decode(payload: bytes, n_reads: int) -> list[bytes]:
    if n_reads == 0:
        return []
    out = payload.split(b"\n")
    if len(out) != n_reads:
        raise ValueError(f"header count mismatch: {len(out)} != {n_reads}")
    return out


def synth(start_index: int, n_reads: int) -> list[bytes]:
    """Names used when headers were dropped (-noheader / -seq-only)."""
    return [b"read_%d" % i for i in range(start_index, start_index + n_reads)]
