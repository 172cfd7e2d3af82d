"""Order-1 adaptive range coder tests (FORMAT.md §7 method 3)."""

import zlib

import numpy as np

from leon_tpu.codecs import frames, o1


def _roundtrip(data: bytes):
    payload = o1.encode(data)
    assert payload is not None
    assert o1.decode(payload, len(data)) == data
    return payload


def test_qual_like_beats_zlib(rng):
    # correlated Phred-like stream (random walk over ~40 symbols)
    n = 200_000
    steps = rng.integers(-2, 3, n)
    q = np.clip(60 + np.cumsum(steps) % 20, 33, 104).astype(np.uint8).tobytes()
    payload = _roundtrip(q)
    assert len(payload) < len(zlib.compress(q, 6))


def test_edge_sizes(rng):
    for n in (1, 2, 17, 255, 256, 4096):
        _roundtrip(rng.integers(0, 256, n).astype(np.uint8).tobytes())


def test_all_bytes():
    _roundtrip(bytes(range(256)) * 8)
    _roundtrip(b"\x00" * 5000)
    _roundtrip(b"\xff" * 5000)


def test_frame_method3(rng):
    steps = rng.integers(-1, 2, 50_000)
    q = np.clip(60 + np.cumsum(steps), 33, 104).astype(np.uint8).tobytes()
    fr = frames.frame(q, try_o1=True)
    assert fr[0] == frames.METHOD_O1
    dec, _ = frames.unframe(fr)
    assert dec == q
