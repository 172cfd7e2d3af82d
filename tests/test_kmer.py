import numpy as np
import pytest

from leon_tpu.ops import kmer as K


def py_kmer_int(codes, p, k):
    v = 0
    for i in range(k):
        v = (v << 2) | int(codes[p + i])
    return v


def py_rc_int(codes, p, k):
    v = 0
    for i in range(k - 1, -1, -1):
        v = (v << 2) | (3 - int(codes[p + i]))
    return v


def words_to_int(w):
    v = 0
    for j in range(len(w) - 1, -1, -1):
        v = (v << 32) | int(w[j])
    return v


@pytest.mark.parametrize("k", [5, 15, 16, 17, 31, 32, 33, 48, 63, 64])
def test_kmer_scan_matches_python(rng, k):
    B, L = 4, 80
    codes = rng.integers(0, 4, (B, L), dtype=np.uint8)
    lengths = np.array([L, k, k + 3, L - 7], dtype=np.int32)
    canon, is_rc, valid = K.kmer_scan(codes, lengths, k)
    canon, is_rc, valid = map(np.asarray, (canon, is_rc, valid))
    P = L - k + 1
    assert canon.shape == (B, P, K.words_for_k(k))
    for b in range(B):
        for p in range(P):
            expect_valid = p <= lengths[b] - k
            assert valid[b, p] == expect_valid
            f = py_kmer_int(codes[b], p, k)
            r = py_rc_int(codes[b], p, k)
            got = words_to_int(canon[b, p])
            assert got == min(f, r), (b, p, k)
            assert bool(is_rc[b, p]) == (r < f)


@pytest.mark.parametrize("k", [7, 31, 33, 64])
def test_np_helpers_roundtrip(rng, k):
    codes = rng.integers(0, 4, k, dtype=np.uint8)
    w = K.kmer_words_np(codes, k)
    assert words_to_int(w) == py_kmer_int(codes, 0, k)
    back = K.words_to_codes_np(w, k)
    np.testing.assert_array_equal(back, codes)
    rc = K.revcomp_words_np(w, k)
    assert words_to_int(rc) == py_rc_int(codes, 0, k)


def test_encode_bases_and_pack(rng):
    seq = b"ACGTNacgtACGT\rA"
    codes, exc = K.encode_bases_np(seq)
    np.testing.assert_array_equal(exc, [c not in b"ACGT" for c in seq])
    assert codes.tolist()[:4] == [0, 1, 2, 3]
    n = 13
    c = rng.integers(0, 4, n, dtype=np.uint8)
    assert K.unpack_2bit_np(K.pack_2bit_np(c), n).tolist() == c.tolist()


def test_varints(rng):
    from leon_tpu.utils import varint as V

    vals = np.concatenate(
        [
            rng.integers(0, 128, 100, dtype=np.uint64),
            rng.integers(0, 1 << 20, 100, dtype=np.uint64),
            rng.integers(0, 1 << 60, 10, dtype=np.uint64),
            np.array([0, 127, 128, 16383, 16384, (1 << 62)], dtype=np.uint64),
        ]
    )
    enc = V.encode_array(vals)
    # cross-check against scalar encoder
    ba = bytearray()
    for v in vals:
        V.encode_one(int(v), ba)
    assert bytes(ba) == enc
    dec = V.decode_array(enc, count=vals.size)
    np.testing.assert_array_equal(dec, vals)
    # zigzag
    s = rng.integers(-(1 << 40), 1 << 40, 50)
    np.testing.assert_array_equal(V.unzigzag(V.zigzag(s)), s)
