import jax.numpy as jnp
import numpy as np
import pytest

from leon_tpu.ops import bloom, count
from leon_tpu.ops import kmer as K


@pytest.mark.parametrize("k", [15, 31, 33, 63])
def test_hash_np_jnp_identical(rng, k):
    """Decoder determinism requires numpy and jnp hash paths bit-identical
    (FORMAT.md §4 v2)."""
    import jax.numpy as jnp

    W = K.words_for_k(k)
    codes = rng.integers(0, 4, (257, k), dtype=np.uint8)
    words = np.stack([K.kmer_words_np(codes[i], k) for i in range(40)])
    hn = bloom.hash_words(words, k, 0xABCD, np)
    hj = bloom.hash_words(jnp.asarray(words), k, 0xABCD, jnp)
    for a, b in zip(hn, hj):
        np.testing.assert_array_equal(a, np.asarray(b))


@pytest.mark.parametrize("k", [15, 31, 33])
def test_hash_strand_invariance(rng, k):
    """The unordered (min, max) strand pair must be identical for a k-mer
    and its reverse complement — the v4 strand-invariance contract."""
    codes = rng.integers(0, 4, (100, k), dtype=np.uint8)
    fwd = K.pack_codes_batch_np(codes, k)
    rc = K.pack_codes_batch_np((3 - codes)[:, ::-1], k)
    f, r = bloom.hash_words(fwd, k, 99, np)
    g, s = bloom.hash_words(rc, k, 99, np)
    # reverse hash of s == forward hash of revcomp(s)
    np.testing.assert_array_equal(r, g)
    np.testing.assert_array_equal(f, s)
    np.testing.assert_array_equal(np.minimum(f, r), np.minimum(g, s))
    np.testing.assert_array_equal(np.maximum(f, r), np.maximum(g, s))


def test_rolling_equals_scratch(rng):
    """The rolling updates (FORMAT.md §4) must reproduce the from-scratch
    hashes at every window position, both directions."""
    k, seed = 31, 0x1234ABCD
    seq = rng.integers(0, 4, 200, dtype=np.uint8)
    tab = bloom.tables(seed, k)

    def rol(x, r):
        r %= 32
        return ((int(x) << r) | (int(x) >> (32 - r))) & 0xFFFFFFFF

    T, Tc, Trot, Tcrot = (tab[i] for i in range(4))

    # from-scratch at position p
    def scratch(p):
        f = r = 0
        for i in range(k):
            f ^= rol(T[seq[p + i]], k - 1 - i)
            r ^= rol(Tc[seq[p + i]], i)
        return f, r

    # roll right across the sequence
    f, r = scratch(0)
    for p in range(1, 100):
        o, x = seq[p - 1], seq[p + k - 1]
        f = (rol(int(f) ^ int(Trot[o]), 1) ^ int(T[x])) & 0xFFFFFFFF
        r = (rol(int(r) ^ int(Tc[o]), 31) ^ int(Tcrot[x])) & 0xFFFFFFFF
        assert (f, r) == scratch(p), f"right roll diverged at {p}"
    # roll left back down
    f, r = scratch(99)
    for p in range(98, 50, -1):
        x, o = seq[p], seq[p + k]
        f = (int(Trot[x]) ^ rol(int(f) ^ int(T[o]), 31)) & 0xFFFFFFFF
        r = (rol(int(r) ^ int(Tcrot[o]), 1) ^ int(Tc[x])) & 0xFFFFFFFF
        assert (f, r) == scratch(p), f"left roll diverged at {p}"


@pytest.mark.parametrize("k", [15, 31, 33, 63])
def test_build_np_native_matches_numpy(rng, k):
    """The native per-row Bloom build must set the byte-identical bitset
    to the numpy wordmask build (the filter is the decode contract)."""
    from leon_tpu import native

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    codes = rng.integers(0, 4, (4000, k), dtype=np.uint8)
    words = K.pack_codes_batch_np(codes, k)
    n_words = bloom.choose_n_words(4000, 13.0)
    for H in (2, 4, 8):
        got = bloom.build_np(words, n_words, H, 0xBEEF, k)
        ref = np.zeros(n_words, dtype=np.uint32)
        wi, mask = bloom.wordmask(words, H, n_words, 0xBEEF, np, k)
        np.bitwise_or.at(ref, wi.reshape(-1), mask.reshape(-1))
        np.testing.assert_array_equal(got, ref)


def test_bloom_membership(rng):
    k = 31
    codes = rng.integers(0, 4, (5500, k), dtype=np.uint8)
    words = K.pack_codes_batch_np(codes, k)
    members, others = words[:500], words[500:]
    n_words = bloom.choose_n_words(500, 12.0)
    bits = bloom.build_np(members, n_words, 4, 7, k)
    assert np.all(bloom.probe_np(bits, members, 4, n_words, 7, k))
    import jax.numpy as jnp

    got = np.asarray(bloom.probe(jnp.asarray(bits), jnp.asarray(members), 4, n_words, 7, k))
    assert np.all(got)
    # false positive rate sane (< 5% at 12 bits/kmer, 4 hashes)
    fp = bloom.probe_np(bits, others, 4, n_words, 7, k).mean()
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


@pytest.mark.parametrize("n_words", [1 << 15, 99_968, 3_000_064, (1 << 31) - 64])
def test_wordbit_np_jnp_identical(rng, n_words):
    """Hash family v4 (blocked + fastrange, FORMAT.md §4) must be
    bit-identical between the numpy and jnp implementations — decoder
    determinism depends on it — and the per-bit view must agree with the
    fused word+mask view the probes use. Sizes include non-powers-of-two
    (exact sizing is the point of fastrange) and the int32 ceiling."""
    f, r = (rng.integers(0, 2**32, 2048, dtype=np.uint32) for _ in range(2))
    win, bin_ = bloom.wordbit_from_hashes(f, r, 4, n_words, np)
    wij, bij = bloom.wordbit_from_hashes(
        *(jnp.asarray(x) for x in (f, r)), 4, n_words, jnp
    )
    assert np.array_equal(win.astype(np.int64), np.asarray(wij).astype(np.int64))
    assert np.array_equal(bin_, np.asarray(bij))
    assert int(win.max()) < n_words and int(win.min()) >= 0
    # blocked: all H bits of a key live in the SAME word
    assert (win == win[:, :1]).all()
    wm, mask = bloom.wordmask_from_hashes(f, r, 4, n_words, np)
    wmj, maskj = bloom.wordmask_from_hashes(
        *(jnp.asarray(x) for x in (f, r)), 4, n_words, jnp
    )
    assert np.array_equal(wm.astype(np.int64), np.asarray(wmj).astype(np.int64))
    assert np.array_equal(mask, np.asarray(maskj))
    assert np.array_equal(wm, win[:, 0])
    or_bits = np.zeros_like(mask)
    for i in range(4):
        or_bits |= np.uint32(1) << bin_[:, i]
    assert np.array_equal(mask, or_bits)


def test_bloom_large_nonpow2_membership(rng):
    """A large non-power-of-two filter: members all found via both
    backends; fastrange spreads word indexes across the whole range."""
    k = 31
    members = rng.integers(0, 2**32, (5000, 2), dtype=np.uint32)
    n_words = 5_000_128  # 160 Mbit, not a power of two
    bits = bloom.build_np(members, n_words, 4, 7, k)
    assert bits.nbytes == 4 * n_words
    assert bool(np.all(bloom.probe_np(bits, members, 4, n_words, 7, k)))
    got = np.asarray(bloom.probe(jnp.asarray(bits), jnp.asarray(members), 4, n_words, 7, k))
    assert got.all()
    wi, _ = bloom.wordbit(members, 4, n_words, 7, np, k)
    assert int(wi.max()) >= n_words // 2  # high half used
    others = rng.integers(0, 2**32, (20000, 2), dtype=np.uint32)
    assert bloom.probe_np(bits, others, 4, n_words, 7, k).mean() < 0.001


def test_build_device_matches_build_np(rng):
    """The device sort-dedup-scatter Bloom build must equal the host
    bitwise_or build bit-for-bit."""
    k = 31
    uniq = rng.integers(0, 2**32, (4000, 2), dtype=np.uint32)
    counts = rng.integers(1, 6, 4000).astype(np.int32)
    for n_words in (8192, 150_016):  # incl. non-power-of-two
        dev = np.asarray(
            bloom.build_device(
                jnp.asarray(uniq), jnp.asarray(counts), jnp.int32(3), n_words, 4, 7, k
            )
        )
        ref = bloom.build_np(uniq[counts >= 3], n_words, 4, 7, k)
        # device build returns an alloc_words-padded bitset; pad is zero
        assert dev.size == bloom.alloc_words(n_words)
        assert np.array_equal(dev[:n_words], ref)
        assert not dev[n_words:].any()


def test_saturation_warning():
    assert bloom.saturation_warning(500_000, 1 << 15, 12.0) is not None  # clipped
    assert bloom.saturation_warning(10_000, 1 << 15, 12.0) is None       # healthy


def test_merge_counts_native_matches_lexsort(rng):
    from leon_tpu import native
    from leon_tpu.ops.count import _merge_counts_native

    runs = []
    for _ in range(5):
        n = int(rng.integers(1, 5000))
        k = rng.integers(0, 50, (n, 2)).astype(np.uint32)
        # sort MSW-major (column 1 most significant) and dedupe
        order = np.lexsort((k[:, 0], k[:, 1]))
        k = k[order]
        keep = np.ones(n, dtype=bool)
        keep[1:] = (k[1:] != k[:-1]).any(axis=1)
        k = k[keep]
        c = rng.integers(1, 100, k.shape[0]).astype(np.int64)
        runs.append((k, c))
    got = _merge_counts_native(runs)
    if got is None:  # no toolchain: fallback covered elsewhere
        assert native.get_lib() is None
        return
    # numpy oracle: concat + lexsort + sum per group
    allk = np.concatenate([r[0] for r in runs])
    allc = np.concatenate([r[1] for r in runs])
    order = np.lexsort((allk[:, 0], allk[:, 1]))
    sk, sc = allk[order], allc[order]
    new = np.ones(sk.shape[0], dtype=bool)
    new[1:] = (sk[1:] != sk[:-1]).any(axis=1)
    gid = np.cumsum(new) - 1
    want_c = np.zeros(int(gid[-1]) + 1, dtype=np.int64)
    np.add.at(want_c, gid, sc)
    assert np.array_equal(got[0], sk[new])
    assert np.array_equal(got[1], want_c)


def test_merge_counts_unsorted_fallback():
    a = np.array([[5, 0], [1, 0]], dtype=np.uint32)  # NOT sorted
    ca = np.array([2, 3], dtype=np.int64)
    u, c = count.merge_counts([(a, ca)])
    got = {tuple(u[i]): int(c[i]) for i in range(u.shape[0])}
    assert got == {(1, 0): 3, (5, 0): 2}


def test_auto_params_free_filter_floor():
    """stored_filter=False (UNITIGS-section regime): bits_per_kmer floors
    at 24 with H=4 — the filter costs HBM only, so the sizing detaches
    from the stored-bytes tradeoff (bloom.auto_params docstring)."""
    from leon_tpu.ops import bloom

    hist = np.zeros(256, np.int64)
    hist[7] = 1_000_000  # mean solid coverage 7 -> stored bpk ~8.4
    bpk_s, h_s = bloom.auto_params(hist, 3)
    bpk_f, h_f = bloom.auto_params(hist, 3, stored_filter=False)
    assert bpk_s < 12 and bpk_f == 24.0 and h_f == 4
    # never DECREASES an already-denser stored choice
    hist2 = np.zeros(256, np.int64)
    hist2[40] = 1_000_000
    bpk_s2, _ = bloom.auto_params(hist2, 3)
    bpk_f2, _ = bloom.auto_params(hist2, 3, stored_filter=False)
    assert bpk_f2 >= bpk_s2
    # lossy rule floors too
    bpk_lo, h_lo = bloom.auto_params(hist, 3, lossy_quals=True,
                                     stored_filter=False)
    assert bpk_lo >= 24.0 and h_lo == 4
