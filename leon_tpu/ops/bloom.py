"""Bloom filter over canonical solid k-mers — the probabilistic de Bruijn
graph (reference behavior: /root/reference/README.md:13 "inserts solid kmers
in a bloom-filter"; [R] gatb-core tools/collections/impl/Bloom.hpp).

TPU-first: the bitset is a flat uint32 array resident in HBM; membership is
H gathered word loads + bit tests, batched over read lanes. The hash family
is pure 32-bit arithmetic (FORMAT.md §4) so the numpy build path and the
jnp probe path are bit-identical — decoder determinism depends on this.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# FORMAT.md §4 frozen constants
_SEED1_XOR = 0x5BF03635
_SEED2_XOR = 0x334F1361
_WC1 = 0x9E3779B1
_WC2 = 0x85EBCA77


def _fmix32(x, xp):
    u = xp.uint32
    x = x ^ (x >> u(16))
    x = x * u(0x85EBCA6B)
    x = x ^ (x >> u(13))
    x = x * u(0xC2B2AE35)
    x = x ^ (x >> u(16))
    return x


def hash2(words, seed: int, xp):
    """(h1, h2) uint32 for k-mer word vectors. words: (..., W) u32."""
    u = xp.uint32
    W = words.shape[-1]
    h1 = xp.full(words.shape[:-1], (seed ^ _SEED1_XOR) & 0xFFFFFFFF, dtype=xp.uint32)
    h2 = xp.full(words.shape[:-1], (seed ^ _SEED2_XOR) & 0xFFFFFFFF, dtype=xp.uint32)
    for j in range(W):
        w = words[..., j]
        h1 = _fmix32(h1 ^ _fmix32(w + u((_WC1 * (j + 1)) & 0xFFFFFFFF), xp), xp)
        h2 = _fmix32(h2 ^ _fmix32(w + u((_WC2 * (j + 1)) & 0xFFFFFFFF), xp), xp)
    h2 = h2 | u(1)
    return h1, h2


def bit_positions(words, n_hashes: int, log2_m: int, seed: int, xp):
    """(..., H) uint32 bit positions in a 2^log2_m-bit filter."""
    h1, h2 = hash2(words, seed, xp)
    mask = xp.uint32((1 << log2_m) - 1 if log2_m < 32 else 0xFFFFFFFF)
    pos = [(h1 + xp.uint32(i) * h2) & mask for i in range(n_hashes)]
    return xp.stack(pos, axis=-1)


def choose_log2_m(n_solid: int, bits_per_kmer: float) -> int:
    want = max(64.0, n_solid * bits_per_kmer)
    log2_m = max(6, int(np.ceil(np.log2(want))))
    return min(log2_m, 32)  # v1 cap (FORMAT.md §4)


def build_np(solid_words: np.ndarray, log2_m: int, n_hashes: int, seed: int) -> np.ndarray:
    """Host build: returns uint32 bitset of shape (2^log2_m / 32,)."""
    bitset = np.zeros(1 << max(0, log2_m - 5), dtype=np.uint32)
    if solid_words.shape[0]:
        pos = bit_positions(solid_words, n_hashes, log2_m, seed, np).reshape(-1)
        np.bitwise_or.at(bitset, (pos >> 5).astype(np.int64), np.uint32(1) << (pos & np.uint32(31)))
    return bitset


def probe(bitset, words, n_hashes: int, log2_m: int, seed: int):
    """Device probe: True iff all H bits set. words (..., W) -> bool (...)."""
    pos = bit_positions(words, n_hashes, log2_m, seed, jnp)
    w = bitset[(pos >> 5).astype(jnp.int32)]
    hit = (w >> (pos & jnp.uint32(31))) & jnp.uint32(1)
    return jnp.all(hit == 1, axis=-1)


def probe_np(bitset: np.ndarray, words: np.ndarray, n_hashes: int, log2_m: int, seed: int):
    pos = bit_positions(words, n_hashes, log2_m, seed, np)
    w = bitset[(pos >> 5).astype(np.int64)]
    hit = (w >> (pos & np.uint32(31))) & np.uint32(1)
    return np.all(hit == 1, axis=-1)
