"""Bloom filter over canonical solid k-mers — the probabilistic de Bruijn
graph (reference behavior: /root/reference/README.md:13 "inserts solid kmers
in a bloom-filter"; [R] gatb-core tools/collections/impl/Bloom.hpp).

TPU-first: the bitset is a flat uint32 array resident in HBM; membership is
H gathered word loads + bit tests, batched over lanes. Hash family v2
(FORMAT.md §4) is an ntHash-style 32-bit ROLLING family: during the graph
walk each of the 4 successor candidates costs a couple of XOR/rotates
instead of a full multiword re-hash, and strand-invariance comes from
per-function min(forward, reverse) — no canonical big-int compare on the
hot path. Decoder determinism depends on the numpy and jnp paths being
bit-identical; both are implemented here from the same table constants.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# FORMAT.md §4 frozen constants
_C1 = 0x5BF03635
_C2 = 0x334F1361
_PHI = 0x9E3779B9
_M32 = 0xFFFFFFFF


def _fmix32_int(x: int) -> int:
    x &= _M32
    x ^= x >> 16
    x = (x * 0x85EBCA6B) & _M32
    x ^= x >> 13
    x = (x * 0xC2B2AE35) & _M32
    x ^= x >> 16
    return x


def _rol_int(x: int, r: int) -> int:
    r %= 32
    return ((x << r) | (x >> (32 - r))) & _M32


def tables(seed: int, k: int) -> np.ndarray:
    """All table constants for hash family v2, shape (2, 4, 4) uint32:
    [m][kind][base] with kind 0=T, 1=Tc, 2=Trot, 3=Tcrot."""
    out = np.zeros((2, 4, 4), dtype=np.uint32)
    for m, c in enumerate((_C1, _C2)):
        base = _fmix32_int(seed ^ c)
        T = [_fmix32_int((base + b * _PHI) & _M32) for b in range(4)]
        Tc = [T[3 - b] for b in range(4)]
        Trot = [_rol_int(v, k - 1) for v in T]
        Tcrot = [_rol_int(v, k - 1) for v in Tc]
        out[m, 0] = T
        out[m, 1] = Tc
        out[m, 2] = Trot
        out[m, 3] = Tcrot
    return out


def rol1(x, xp):
    u = xp.uint32
    return (x << u(1)) | (x >> u(31))


def ror1(x, xp):
    u = xp.uint32
    return (x >> u(1)) | (x << u(31))


def hash_codes(codes, k: int, seed: int, xp):
    """From-scratch (f1, r1, f2, r2) of the k-mer codes[..., 0:k].

    codes: (..., k) integer base codes. Works for numpy and jnp.
    """
    tab = tables(seed, k)
    shape = codes.shape[:-1]
    f = [xp.zeros(shape, xp.uint32), xp.zeros(shape, xp.uint32)]
    r = [xp.zeros(shape, xp.uint32), xp.zeros(shape, xp.uint32)]
    for i in range(k):
        b = codes[..., i].astype(xp.uint32) if hasattr(codes[..., i], "astype") else codes[..., i]
        for m in range(2):
            T = xp.asarray(tab[m, 0])
            Tc = xp.asarray(tab[m, 1])
            rf = (k - 1 - i) % 32
            rr = i % 32
            tv = xp.take(T, b.astype(xp.int32) if xp is jnp else b.astype(np.int64))
            cv = xp.take(Tc, b.astype(xp.int32) if xp is jnp else b.astype(np.int64))
            u = xp.uint32
            f[m] = f[m] ^ (((tv << u(rf)) | (tv >> u((32 - rf) % 32))) if rf else tv)
            r[m] = r[m] ^ (((cv << u(rr)) | (cv >> u((32 - rr) % 32))) if rr else cv)
    return f[0], r[0], f[1], r[1]


def hash_words(words, k: int, seed: int, xp):
    """From-scratch hashes of packed k-mer words (..., W) without
    materializing the (..., k) code array: extracts base columns on the fly."""
    tab = tables(seed, k)
    shape = words.shape[:-1]
    u = xp.uint32
    f1 = xp.zeros(shape, xp.uint32)
    r1 = xp.zeros(shape, xp.uint32)
    f2 = xp.zeros(shape, xp.uint32)
    r2 = xp.zeros(shape, xp.uint32)
    for i in range(k):
        t = 2 * (k - 1 - i)
        b = (words[..., t // 32] >> u(t % 32)) & u(3)
        bi = b.astype(xp.int32 if xp is jnp else np.int64)
        rf = (k - 1 - i) % 32
        rr = i % 32
        for m, (fh, rh) in enumerate(((f1, r1), (f2, r2))):
            tv = xp.take(xp.asarray(tab[m, 0]), bi)
            cv = xp.take(xp.asarray(tab[m, 1]), bi)
            fh ^= ((tv << u(rf)) | (tv >> u((32 - rf) % 32))) if rf else tv
            rh ^= ((cv << u(rr)) | (cv >> u((32 - rr) % 32))) if rr else cv
            if m == 0:
                f1, r1 = fh, rh
            else:
                f2, r2 = fh, rh
    return f1, r1, f2, r2


def positions_from_hashes(f1, r1, f2, r2, n_hashes: int, log2_m: int, xp):
    """(..., H) uint32 bit positions from the four strand hashes."""
    u = xp.uint32
    h1 = xp.minimum(f1, r1)
    h2 = xp.minimum(f2, r2) | u(1)
    mask = u((1 << log2_m) - 1 if log2_m < 32 else _M32)
    pos = [(h1 + u(i) * h2) & mask for i in range(n_hashes)]
    return xp.stack(pos, axis=-1)


def bit_positions(words, n_hashes: int, log2_m: int, seed: int, xp, k: int):
    """(..., H) uint32 bit positions of packed k-mer words."""
    f1, r1, f2, r2 = hash_words(words, k, seed, xp)
    return positions_from_hashes(f1, r1, f2, r2, n_hashes, log2_m, xp)


def choose_log2_m(n_solid: int, bits_per_kmer: float) -> int:
    want = max(64.0, n_solid * bits_per_kmer)
    log2_m = max(6, int(np.ceil(np.log2(want))))
    return min(log2_m, 32)  # v1 cap (FORMAT.md §4)


def build_np(solid_words: np.ndarray, log2_m: int, n_hashes: int, seed: int, k: int) -> np.ndarray:
    """Host build: returns uint32 bitset of shape (2^log2_m / 32,)."""
    bitset = np.zeros(1 << max(0, log2_m - 5), dtype=np.uint32)
    if solid_words.shape[0]:
        pos = bit_positions(solid_words, n_hashes, log2_m, seed, np, k).reshape(-1)
        np.bitwise_or.at(bitset, (pos >> 5).astype(np.int64), np.uint32(1) << (pos & np.uint32(31)))
    return bitset


def probe_positions(bitset, pos, xp):
    """True iff all bits at pos (..., H) are set."""
    u = xp.uint32
    w = bitset[(pos >> 5).astype(xp.int32 if xp is jnp else np.int64)]
    hit = (w >> (pos & u(31))) & u(1)
    return (hit == 1).all(axis=-1)


def probe(bitset, words, n_hashes: int, log2_m: int, seed: int, k: int):
    """Device probe of packed k-mer words (..., W) -> bool (...)."""
    pos = bit_positions(words, n_hashes, log2_m, seed, jnp, k)
    return probe_positions(bitset, pos, jnp)


def probe_np(bitset: np.ndarray, words: np.ndarray, n_hashes: int, log2_m: int, seed: int, k: int):
    pos = bit_positions(words, n_hashes, log2_m, seed, np, k)
    return probe_positions(bitset, pos, np)
