"""Frame method selection (FORMAT.md §7), including the sampled-trial
path for payloads >= 1 MB (ranking on a deterministic prefix sample)."""

import numpy as np

from leon_tpu.codecs import frames


def test_small_payload_roundtrip():
    data = bytes(range(16)) * 8
    fr = frames.frame(data)
    out, pos = frames.unframe(fr, 0)
    assert out == data and pos == len(fr)


def test_sampled_large_payload_roundtrip_and_determinism():
    rng = np.random.default_rng(7)
    # quality-like payload: low-entropy bytes in a narrow band, > 1 MB
    n_reads, L = 15_000, 100
    data = (rng.integers(60, 75, n_reads * L).astype(np.uint8)).tobytes()
    lens = np.full(n_reads, L, dtype=np.int64)
    assert len(data) >= frames._SAMPLE_TRIGGER
    fr1 = frames.frame(data, try_rans=False, try_o1=True, lens=lens)
    fr2 = frames.frame(data, try_rans=False, try_o1=True, lens=lens)
    assert fr1 == fr2  # pure function of (data, lens)
    assert len(fr1) < len(data)  # an entropy coder won, not RAW
    out, pos = frames.unframe(fr1, 0, lens=lens)
    assert out == data and pos == len(fr1)


def test_sampled_large_payload_no_lens():
    rng = np.random.default_rng(11)
    data = rng.integers(0, 4, 2 << 20).astype(np.uint8).tobytes()
    fr = frames.frame(data, try_o1=True)
    out, _ = frames.unframe(fr, 0)
    assert out == data


def test_sample_cut_lands_on_read_boundary():
    lens = np.array([100_000, 300_000, 900_000], dtype=np.int64)
    data = b"x" * int(lens.sum())
    sdata, slens = frames._sample(data, lens)
    assert len(sdata) == int(np.cumsum(lens)[len(slens) - 1])
    assert len(sdata) >= frames._SAMPLE_BYTES or len(slens) == len(lens)
