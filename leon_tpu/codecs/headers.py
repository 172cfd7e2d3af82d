"""Header codec (FORMAT.md §8).

Behavior contract from the reference's HeaderCoder ([R] gatb-core
tools/compression/HeaderCoder.{hpp,cpp}): sequencing headers are highly
structured (instrument:run:flowcell:lane:tile:x:y ...) and compress best
field-wise against the previous header. Headers are tokenized into runs of
digits and non-digits; when the token structure matches the previous
header, non-digit tokens are implied and numeric tokens are stored as
zigzag value deltas (0 = identical string). Anything irregular (structure
change, huge numbers, leading-zero width changes) falls back to a literal.

Payload layout (all four sections are framed streams, FORMAT.md §7):
  frame A: modes, 1 byte/header (0 = literal, 1 = token-delta)
  frame B: literal header lengths (varints, in literal order)
  frame C: literal header bytes (concatenated)
  frame D: numeric token codes (varints: 0 = same string as previous
           header's token, else 1 + zigzag(value - prev_value)), in
           COLUMN-major order (format v3): all headers' field-0 codes,
           then field-1, ... — same-field codes share a distribution
           (constant tiles, random x/y), measured ~18% smaller than the
           interleaved row-major layout after entropy coding. The decoder
           recovers each delta header's numeric-token count from the token
           structure (inherited from the last literal header), so the
           ragged transpose is reversible before any value is read.

When header_mode=0 at decode, reads are named `read_<i>` (global 0-based
index), mirroring the reference's -noheader reconstruction.
"""

from __future__ import annotations

import re

import numpy as np

from leon_tpu.codecs import frames
from leon_tpu.utils import varint

_TOKEN_RE = re.compile(rb"\d+|\D+")
_MAX_DIGITS = 18


def _tokenize(h: bytes) -> list[bytes]:
    return _TOKEN_RE.findall(h)


def _deltas(tokens: list[bytes], prev: list[bytes]) -> list[int] | None:
    """Numeric token codes vs prev, or None when literal fallback is needed."""
    if len(tokens) != len(prev):
        return None
    out: list[int] = []
    for t, p in zip(tokens, prev):
        t_num = t[:1].isdigit()
        p_num = p[:1].isdigit()
        if t_num != p_num:
            return None
        if not t_num:
            if t != p:
                return None
            continue
        if t == p:
            out.append(0)
            continue
        if len(t) > _MAX_DIGITS or len(p) > _MAX_DIGITS:
            return None
        tv, pv = int(t), int(p)
        # the delta is usable only if the decoder's reconstruction rule
        # (zero-pad to prev's width when prev had leading zeros) yields the
        # exact original string
        recon = str(tv).encode()
        if p[:1] == b"0" and len(p) > 1:
            recon = recon.rjust(len(p), b"0")
        if recon != t:
            return None
        out.append(1 + int(varint.zigzag(tv - pv)))
    return out


def _colmajor_order(counts: np.ndarray) -> np.ndarray:
    """Permutation mapping row-major code positions to column-major file
    order for ragged rows: position p of the row-major listing goes to
    file slot order^-1... concretely `col_vals = row_vals[perm]` encodes
    and `row_vals[perm] = col_vals` decodes."""
    if counts.size == 0:
        return np.zeros(0, dtype=np.int64)
    rows = np.repeat(np.arange(counts.size, dtype=np.int64), counts)
    cols = np.arange(rows.size, dtype=np.int64) - np.repeat(
        np.cumsum(counts, dtype=np.int64) - counts, counts
    )
    return np.lexsort((rows, cols))


def _encode_py(headers: list[bytes]):
    """Python reference loop -> (modes bytes, lit mask unused, lit_lens,
    lit blob, row counts, row-major code values)."""
    modes = bytearray()
    lit_lens: list[int] = []
    lit_parts: list[bytes] = []
    code_rows: list[list[int]] = []
    prev_tokens: list[bytes] | None = None
    for h in headers:
        tokens = _tokenize(h)
        d = _deltas(tokens, prev_tokens) if prev_tokens is not None else None
        if d is None:
            modes.append(0)
            lit_lens.append(len(h))
            lit_parts.append(h)
        else:
            modes.append(1)
            code_rows.append(d)
        prev_tokens = tokens
    counts = np.fromiter((len(r) for r in code_rows), dtype=np.int64,
                         count=len(code_rows))
    row_vals = np.concatenate(
        [np.asarray(r, dtype=np.uint64) for r in code_rows]
    ) if code_rows else np.zeros(0, np.uint64)
    return (bytes(modes), np.asarray(lit_lens, dtype=np.uint64),
            b"".join(lit_parts), counts, row_vals)


def _encode_native(headers: list[bytes]):
    """Native per-header loop (leon_native.leon_hdr_encode); None when the
    toolchain is unavailable. Byte-identical to _encode_py (tested)."""
    import ctypes

    from leon_tpu import native

    lib = native.get_lib()
    if lib is None or not hasattr(lib, "leon_hdr_encode"):
        return None
    n = len(headers)
    flat = b"".join(headers)
    lens = np.fromiter((len(h) for h in headers), dtype=np.int64, count=n)
    modes = np.zeros(n, np.uint8)
    row_counts = np.zeros(n, np.int32)
    # worst case: every token numeric, <= len/1 codes; headers average
    # far fewer — start at total/2 and retry once at the true bound
    for cap in (max(16, flat and len(flat) // 2 or 16), max(16, len(flat) + 16)):
        codes = np.zeros(cap, np.uint64)
        ncodes = lib.leon_hdr_encode(
            flat, lens.ctypes.data, n, modes.ctypes.data,
            row_counts.ctypes.data, codes.ctypes.data, cap,
        )
        if ncodes >= 0:
            break
    else:
        return None
    if ncodes < 0:
        return None
    lit = modes == 0
    lit_lens = lens[lit].astype(np.uint64)
    if lit.all():
        lit_blob = flat
    else:
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        lit_blob = b"".join(
            flat[s : s + ln] for s, ln in zip(starts[lit], lens[lit])
        )
    counts = row_counts[~lit].astype(np.int64)
    return modes.tobytes(), lit_lens, lit_blob, counts, codes[:ncodes]


def encode(headers: list[bytes]) -> bytes:
    r = _encode_native(headers)
    if r is None:
        r = _encode_py(headers)
    modes, lit_lens, lit_blob, counts, row_vals = r
    col_vals = row_vals[_colmajor_order(counts)]
    out = bytearray()
    out += frames.frame(bytes(modes))
    out += frames.frame(varint.encode_array(lit_lens))
    out += frames.frame(lit_blob)
    out += frames.frame(varint.encode_array(col_vals), try_o1=True)
    return bytes(out)


def decode(payload: bytes, n_reads: int) -> list[bytes]:
    if n_reads == 0:
        return []
    modes, pos = frames.unframe(payload, 0)
    lit_lens_b, pos = frames.unframe(payload, pos)
    lit_bytes, pos = frames.unframe(payload, pos)
    codes_b, pos = frames.unframe(payload, pos)
    n_lit = sum(1 for m in modes if m == 0)
    lit_lens = varint.decode_array(lit_lens_b, n_lit).astype(np.int64)
    col_vals = varint.decode_array(codes_b)

    # undo the column-major layout (frame D): each delta header's numeric
    # count equals that of the structure in force (set by the last literal
    # header), so all row counts are known before any value is read
    counts: list[int] = []
    cur_numeric = 0
    lo = 0
    li = 0
    for m in modes:
        if m == 0:
            ln = int(lit_lens[li])
            li += 1
            cur_numeric = sum(
                1 for t in _tokenize(lit_bytes[lo : lo + ln]) if t[:1].isdigit()
            )
            lo += ln
        else:
            counts.append(cur_numeric)
    carr = np.asarray(counts, dtype=np.int64)
    codes = np.zeros(int(carr.sum()), dtype=np.uint64)
    if codes.size:
        codes[_colmajor_order(carr)] = col_vals[: codes.size]

    native_out = _decode_native(modes, lit_bytes, lit_lens, codes)
    if native_out is not None:
        if len(native_out) != n_reads:
            raise ValueError(
                f"header count mismatch: {len(native_out)} != {n_reads}"
            )
        return native_out

    out: list[bytes] = []
    prev_tokens: list[bytes] = []
    lit_off = 0
    lit_i = 0
    code_i = 0
    for m in modes:
        if m == 0:
            ln = int(lit_lens[lit_i])
            lit_i += 1
            h = lit_bytes[lit_off : lit_off + ln]
            lit_off += ln
            tokens = _tokenize(h)
        else:
            tokens = []
            for p in prev_tokens:
                if not p[:1].isdigit():
                    tokens.append(p)
                    continue
                c = int(codes[code_i])
                code_i += 1
                if c == 0:
                    tokens.append(p)
                else:
                    v = int(p) + int(varint.unzigzag(np.uint64(c - 1)))
                    t = str(v).encode()
                    if p[0:1] == b"0" and len(p) > 1:
                        t = t.rjust(len(p), b"0")
                    tokens.append(t)
            h = b"".join(tokens)
        out.append(h)
        prev_tokens = tokens
    if len(out) != n_reads:
        raise ValueError(f"header count mismatch: {len(out)} != {n_reads}")
    return out


def _decode_native(modes: bytes, lit_bytes: bytes, lit_lens: np.ndarray,
                   codes: np.ndarray) -> list[bytes] | None:
    """Native decode loop; None when unavailable (Python loop runs)."""
    from leon_tpu import native

    lib = native.get_lib()
    if lib is None or not hasattr(lib, "leon_hdr_decode"):
        return None
    n = len(modes)
    ll = np.ascontiguousarray(lit_lens.astype(np.int64))
    cd = np.ascontiguousarray(codes.astype(np.uint64))
    out_lens = np.zeros(n, np.int64)
    cap = max(64, len(lit_bytes) * 2 + n * 64)
    for _ in range(3):
        out_flat = np.zeros(cap, np.uint8)
        total = lib.leon_hdr_decode(
            modes, n, lit_bytes, ll.ctypes.data, ll.size,
            cd.ctypes.data, cd.size,
            out_flat.ctypes.data, cap, out_lens.ctypes.data,
        )
        if total == -1:
            return None  # malformed: let the Python loop raise precisely
        if total >= 0:
            blob = out_flat[:total].tobytes()
            starts = np.concatenate(([0], np.cumsum(out_lens)[:-1]))
            return [blob[s : s + l] for s, l in zip(starts, out_lens)]
        cap = -int(total)
    return None


def synth(start_index: int, n_reads: int) -> list[bytes]:
    """Names used when headers were dropped (-noheader / -seq-only)."""
    return [b"read_%d" % i for i in range(start_index, start_index + n_reads)]
