import numpy as np
import pytest

from leon_tpu.ops import bloom, count
from leon_tpu.ops import kmer as K


@pytest.mark.parametrize("W", [1, 2, 4])
def test_hash_np_jnp_identical(rng, W):
    import jax.numpy as jnp

    words = rng.integers(0, 1 << 32, (257, W), dtype=np.uint64).astype(np.uint32)
    h1n, h2n = bloom.hash2(words, 0xABCD, np)
    h1j, h2j = bloom.hash2(jnp.asarray(words), 0xABCD, jnp)
    np.testing.assert_array_equal(h1n, np.asarray(h1j))
    np.testing.assert_array_equal(h2n, np.asarray(h2j))
    assert np.all(h2n & 1 == 1)


def test_bloom_membership(rng):
    W = 2
    members = rng.integers(0, 1 << 32, (500, W), dtype=np.uint64).astype(np.uint32)
    others = rng.integers(0, 1 << 32, (5000, W), dtype=np.uint64).astype(np.uint32)
    log2_m = bloom.choose_log2_m(500, 12.0)
    bits = bloom.build_np(members, log2_m, 4, 7)
    assert np.all(bloom.probe_np(bits, members, 4, log2_m, 7))
    import jax.numpy as jnp

    got = np.asarray(bloom.probe(jnp.asarray(bits), jnp.asarray(members), 4, log2_m, 7))
    assert np.all(got)
    # false positive rate sane (< 5% at 12 bits/kmer, 4 hashes)
    fp = bloom.probe_np(bits, others, 4, log2_m, 7).mean()
    assert fp < 0.05


@pytest.mark.parametrize("k", [15, 31, 33])
def test_count_batch_matches_numpy(rng, k):
    B, L = 8, 120
    codes = rng.integers(0, 4, (B, L), dtype=np.uint8)
    lengths = rng.integers(k, L + 1, B).astype(np.int32)
    canon, _, valid = K.kmer_scan(codes, lengths, k)
    uniq, counts = count.count_batch(np.asarray(canon), np.asarray(valid))
    # numpy oracle
    canon_np, valid_np = np.asarray(canon), np.asarray(valid)
    flat = canon_np[valid_np]
    view = np.ascontiguousarray(flat).view([("", np.uint32)] * flat.shape[1])
    u, c = np.unique(view, return_counts=True)
    assert uniq.shape[0] == u.shape[0]
    assert counts.sum() == valid_np.sum()
    # counts per kmer must match (order: device sort is MSW-major;
    # rebuild dict for comparison)
    got = {bytes(uniq[i].tobytes()): int(counts[i]) for i in range(uniq.shape[0])}
    want = {bytes(np.asarray(u[i]).tobytes()): int(c[i]) for i in range(u.shape[0])}
    assert got == want


def test_merge_counts(rng):
    a = np.array([[1, 0], [2, 0], [5, 1]], dtype=np.uint32)
    ca = np.array([3, 1, 2], dtype=np.int64)
    b = np.array([[2, 0], [5, 1], [9, 9]], dtype=np.uint32)
    cb = np.array([1, 1, 4], dtype=np.int64)
    u, c = count.merge_counts([(a, ca), (b, cb)])
    got = {tuple(u[i]): int(c[i]) for i in range(u.shape[0])}
    assert got == {(1, 0): 3, (2, 0): 2, (5, 1): 3, (9, 9): 4}


def test_auto_cutoff():
    h = np.zeros(256, dtype=np.int64)
    h[1], h[2], h[3], h[4], h[5] = 1000, 300, 50, 80, 200  # valley at 3
    assert count.auto_cutoff(h) == 3
    h2 = np.zeros(256, dtype=np.int64)
    h2[1], h2[2], h2[3] = 100, 10, 1  # monotone decreasing -> fallback
    assert count.auto_cutoff(h2) == 2
