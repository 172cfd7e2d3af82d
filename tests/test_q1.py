"""Position-aware quality coder (FORMAT.md §7 method 4)."""

import numpy as np
import pytest

from leon_tpu.codecs import frames, q1


def _make_quals(rng, n_reads, lmin=60, lmax=120):
    """Illumina-shaped qualities: position-dependent mean with 3'-decay,
    Markov-correlated adjacent cycles."""
    reads, lens = [], []
    for _ in range(n_reads):
        L = int(rng.integers(lmin, lmax))
        base = 70 - (np.arange(L) / max(1, L)) ** 2 * 25
        noise = np.cumsum(rng.integers(-2, 3, L)) * 0.5
        q = np.clip(base + noise, 35, 73).astype(np.uint8)
        reads.append(q.tobytes())
        lens.append(L)
    return b"".join(reads), np.asarray(lens, np.int64)


def _roundtrip(data: bytes, lens: np.ndarray):
    enc = q1.encode(data, lens)
    assert enc is not None
    assert q1.decode(enc, len(data), lens) == data
    return enc


def test_roundtrip_and_ratio(rng):
    data, lens = _make_quals(rng, 500)
    enc = _roundtrip(data, lens)
    import zlib

    assert len(enc) < len(zlib.compress(data, 6))


def test_edge_lens(rng):
    # empty reads, len-1 reads, mixed
    parts = [b"", b"F", b"FFFF", bytes(rng.integers(33, 100, 57).astype(np.uint8))]
    data = b"".join(parts)
    lens = np.array([len(p) for p in parts], np.int64)
    _roundtrip(data, lens)


def test_all_byte_values(rng):
    # any byte is codable (quals outside 33..104 clamp only the CONTEXT)
    data = bytes(range(256)) * 4
    lens = np.array([256] * 4, np.int64)
    _roundtrip(data, lens)


def test_lens_mismatch_rejected(rng):
    data, lens = _make_quals(rng, 20)
    enc = q1.encode(data, lens)
    with pytest.raises(ValueError):
        q1.decode(enc, len(data), lens[:-1])


def test_frame_method4(rng):
    """Quality data with strong machine-cycle structure (and weak
    adjacent-cycle correlation) must select method 4 and round-trip
    through the frame layer with lens context."""
    L = 112
    cycle_mean = rng.integers(38, 72, L // 16 + 1)  # per-16-cycle level
    reads = []
    for _ in range(600):
        noise = rng.integers(-3, 4, L)
        q = np.clip(cycle_mean[np.arange(L) // 16] + noise, 33, 104)
        reads.append(q.astype(np.uint8).tobytes())
    data = b"".join(reads)
    lens = np.full(600, L, np.int64)
    fr = frames.frame(data, try_rans=False, try_o1=True, lens=lens)
    assert fr[0] == frames.METHOD_Q1
    dec, _ = frames.unframe(fr, 0, lens=lens)
    assert dec == data
    # method-4 frame without lens context must raise, not crash
    with pytest.raises(ValueError):
        frames.unframe(fr, 0)


def test_context_resets_per_read(rng):
    """Splitting the same bytes differently must change the coded stream
    (context resets at read boundaries) but still round-trip."""
    data, lens = _make_quals(rng, 100, lmin=80, lmax=81)
    total = int(lens.sum())
    lens2 = np.array([40] * (total // 40) + ([total % 40] if total % 40 else []), np.int64)
    e1 = _roundtrip(data, lens)
    e2 = _roundtrip(data, lens2)
    assert e1 != e2
