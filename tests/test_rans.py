"""rANS codec tests: exact round-trip over adversarial byte distributions,
plus the frame-level dispatch (FORMAT.md §7)."""

import numpy as np
import pytest

from leon_tpu.codecs import frames, rans


def _roundtrip(data: bytes):
    payload = rans.encode(data)
    assert payload is not None, "native rANS unavailable"
    out = rans.decode(payload, len(data))
    assert out == data
    return payload


def test_uniform_bytes(rng):
    data = rng.integers(0, 256, 100_000).astype(np.uint8).tobytes()
    _roundtrip(data)


def test_skewed_bytes(rng):
    # DNA-event-like: tiny alphabet, heavy skew
    data = rng.choice([0, 1, 2, 3], size=50_000, p=[0.9, 0.06, 0.03, 0.01]).astype(np.uint8).tobytes()
    payload = _roundtrip(data)
    assert len(payload) < len(data) * 0.3  # ~0.6 bits/sym entropy


def test_single_symbol():
    data = b"\x07" * 10_000
    payload = _roundtrip(data)
    assert len(payload) < 64


def test_small_inputs(rng):
    for n in (1, 2, 3, 7, 63, 64, 65, 4095, 4096, 4097):
        data = rng.integers(0, 17, n).astype(np.uint8).tobytes()
        _roundtrip(data)


def test_all_256_symbols(rng):
    data = bytes(range(256)) * 64
    _roundtrip(data)


def test_quality_like(rng):
    # FASTQ quality strings: ~40 symbols, moderate skew
    data = (rng.normal(60, 6, 200_000).clip(33, 104).astype(np.uint8)).tobytes()
    payload = _roundtrip(data)
    assert len(payload) < len(data) * 0.8


def test_frame_dispatch_rans(rng):
    data = rng.choice([0, 1, 2], size=20_000, p=[0.8, 0.15, 0.05]).astype(np.uint8).tobytes()
    fr = frames.frame(data)
    assert fr[0] == frames.METHOD_RANS  # beats zlib on skewed small-alphabet
    dec, pos = frames.unframe(fr)
    assert dec == data and pos == len(fr)


def test_frame_corrupt_rans_payload(rng):
    """rANS has no internal integrity check (container CRC32 covers that):
    corruption must either raise or decode to different bytes — never
    silently return the original."""
    data = rng.choice([0, 1, 2], size=20_000).astype(np.uint8).tobytes()
    fr = bytearray(frames.frame(data))
    if fr[0] == frames.METHOD_RANS:
        # flip mid-payload (the final byte can land in a lane state that is
        # never read again, which legitimately decodes identically)
        fr[len(fr) // 2] ^= 0xFF
        try:
            dec, _ = frames.unframe(bytes(fr))
            assert dec != data
        except ValueError:
            pass
