"""Walk encode/decode property tests: the round-trip oracle at tensor level.

Mirrors the reference's only real correctness oracle (byte-exact round-trip,
/root/reference/scripts/simple_test.sh:59-69) at the kernel boundary."""

import numpy as np
import pytest

from leon_tpu.ops import bloom, count, walk
from leon_tpu.ops import kmer as K


def build_batch(reads, L=None):
    B = len(reads)
    L = L or max(len(r) for r in reads)
    codes = np.zeros((B, L), dtype=np.uint8)
    lengths = np.zeros(B, dtype=np.int32)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = r
        lengths[i] = len(r)
    return codes, lengths


def solid_bloom(codes, lengths, k, abundance=2, H=4, seed=0x1234ABCD):
    canon, _, valid = K.kmer_scan(codes, lengths, k)
    uniq, counts = count.count_batch(np.asarray(canon), np.asarray(valid))
    solid = uniq[counts >= abundance]
    n_words = bloom.choose_n_words(max(1, solid.shape[0]), 12.0)
    bits = bloom.build_np(solid, n_words, H, seed, k)
    return bits, n_words, solid


@pytest.mark.parametrize("k", [15, 31, 33])
def test_walk_roundtrip(sim_reads, k):
    codes, lengths = build_batch(sim_reads)
    B, L = codes.shape
    H, seed = 4, 0x1234ABCD
    bits, n_words, solid = solid_bloom(codes, lengths, k)
    assert solid.shape[0] > 0

    import jax.numpy as jnp

    bits_j = jnp.asarray(bits)
    enc = walk.encode_batch(codes, lengths, bits_j, k, H, n_words, seed)
    enc = {kk: np.asarray(v) for kk, v in enc.items()}
    anchored = enc["anchored"]
    assert anchored.mean() > 0.8  # high-coverage sim: most reads anchor

    # host re-derives forward-orientation anchor words from codes + apos
    # (the device no longer ships k-mer words, see kmer_words_batch_np)
    canon_w, is_rc = K.kmer_words_batch_np(codes, enc["apos"].astype(np.int64), k)
    afwd = np.zeros_like(canon_w)
    for i in range(B):
        if not anchored[i]:
            continue
        afwd[i] = K.revcomp_words_np(canon_w[i], k) if is_rc[i] else canon_w[i]

    dec = walk.decode_batch(
        enc["apos"], anchored, lengths, afwd, bits_j,
        enc["nbif_r"], enc["bif_r"], enc["nerr_r"], enc["errpos_r"], enc["errnt_r"],
        enc["nbif_l"], enc["bif_l"], enc["nerr_l"], enc["errpos_l"], enc["errnt_l"],
        k, H, n_words, seed, L,
    )
    dec = np.asarray(dec)
    for i in range(B):
        if anchored[i]:
            np.testing.assert_array_equal(
                dec[i, : lengths[i]], codes[i, : lengths[i]], err_msg=f"read {i}"
            )


def test_walk_short_and_degenerate_reads(rng):
    # Zhang-2017 breaker class (reference README.md:91): reads < k, exactly k
    k, H, seed = 31, 4, 1
    contig = rng.integers(0, 4, 300, dtype=np.uint8)
    reads = [contig[i : i + 80] for i in range(0, 200, 4)]
    reads += [contig[5:20], contig[10 : 10 + k], np.array([0], dtype=np.uint8)]
    codes, lengths = build_batch(reads)
    # seed must match between Bloom build and probe — it is part of the
    # format contract (FORMAT.md §4)
    bits, n_words, _ = solid_bloom(codes, lengths, k, abundance=2, seed=seed)

    import jax.numpy as jnp

    enc = walk.encode_batch(codes, lengths, jnp.asarray(bits), k, H, n_words, seed)
    anchored = np.asarray(enc["anchored"])
    # reads shorter than k can never anchor
    assert not anchored[-3] and not anchored[-1]
    # the exactly-k read should anchor (its kmer is solid: appears in many reads)
    assert anchored[-2]
    assert np.asarray(enc["apos"])[-2] == 0


def test_confirmed_mask(sim_reads):
    k, H, seed = 31, 4, 0x1234ABCD
    codes, lengths = build_batch(sim_reads)
    bits, n_words, _ = solid_bloom(codes, lengths, k)
    import jax.numpy as jnp

    enc = walk.encode_batch(codes, lengths, jnp.asarray(bits), k, H, n_words, seed)
    conf = np.asarray(enc["confirmed"])
    anchored = np.asarray(enc["anchored"])
    apos = np.asarray(enc["apos"])
    for i in range(len(sim_reads)):
        if not anchored[i]:
            assert not conf[i].any()
        else:
            # anchor span is never "confirmed" (bases stored via dict)
            assert not conf[i, apos[i] : apos[i] + k].any()
            assert not conf[i, lengths[i] :].any()
