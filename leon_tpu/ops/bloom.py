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


MAX_LOG2_M = 36  # word index (2^(log2_m-5)) must stay below 2^31 for i32 gathers


def wordmask_from_hashes(f1, r1, f2, r2, n_hashes: int, log2_m: int, xp):
    """BLOCKED Bloom addressing (hash family v3, FORMAT.md §4): all H bits
    of a key live in ONE u32 bitset word, so membership is a single
    gathered word + mask test. On TPU the walk is gather-bound (4
    candidates x H hashes x every step, random HBM access); blocking cuts
    the gather count H-fold for a modest false-positive penalty (~2-3x at
    12 bits/kmer, still <1.5%).

    word index (strand-invariant):
      log2_m <= 32:      w = h1 mod 2^(log2_m-5)
      log2_m in (32,36]: w = ((h2 & (2^(log2_m-32)-1)) << 27) | (h1 >> 5)
    with h1 = min(f1,r1), h2 = min(f2,r2)|1.
    bit positions: bit_i = (x2 >> 5i) & 31 for i < 6, then
    ((x1 >> 5(i-6)) & 31) for i in [6, 8), with x2 = f2^r2, x1 = f1^r1
    (both strand-invariant). mask = OR of (1 << bit_i); a key sets <= H
    distinct bits. Bit-identical in numpy and jnp.

    Returns (word_index int32 (...,), mask uint32 (...,)).
    """
    u = xp.uint32
    i32 = xp.int32 if xp is jnp else np.int64
    h1 = xp.minimum(f1, r1)
    h2 = xp.minimum(f2, r2) | u(1)
    if log2_m <= 32:
        wi = (h1 & u((1 << (log2_m - 5)) - 1)).astype(i32)
    elif log2_m <= MAX_LOG2_M:
        himask = u((1 << (log2_m - 32)) - 1)
        wi = (((h2 & himask) << u(27)) | (h1 >> u(5))).astype(i32)
    else:
        raise ValueError(f"log2_m {log2_m} > {MAX_LOG2_M}")
    x2 = f2 ^ r2
    x1 = f1 ^ r1
    mask = xp.zeros(h1.shape, xp.uint32) if hasattr(h1, "shape") else u(0)
    for i in range(n_hashes):
        b = ((x2 >> u(5 * i)) if i < 6 else (x1 >> u(5 * (i - 6)))) & u(31)
        mask = mask | (u(1) << b)
    return wi, mask


def wordbit_from_hashes(f1, r1, f2, r2, n_hashes: int, log2_m: int, xp):
    """Per-bit view of the blocked addressing: (word int32 (..., H), bit
    uint32 (..., H)) — the SAME bits wordmask_from_hashes tests, unrolled
    for build paths that deduplicate (word, bit) pairs."""
    u = xp.uint32
    wi, _ = wordmask_from_hashes(f1, r1, f2, r2, n_hashes, log2_m, xp)
    x2 = f2 ^ r2
    x1 = f1 ^ r1
    bits = []
    for i in range(n_hashes):
        bits.append((((x2 >> u(5 * i)) if i < 6 else (x1 >> u(5 * (i - 6)))) & u(31)))
    wis = [wi] * n_hashes
    return xp.stack(wis, axis=-1), xp.stack(bits, axis=-1)


def wordbit(words, n_hashes: int, log2_m: int, seed: int, xp, k: int):
    """(word_index, bit) of packed k-mer words (..., W)."""
    f1, r1, f2, r2 = hash_words(words, k, seed, xp)
    return wordbit_from_hashes(f1, r1, f2, r2, n_hashes, log2_m, xp)


def wordmask(words, n_hashes: int, log2_m: int, seed: int, xp, k: int):
    """(word_index, 32-bit mask) of packed k-mer words (..., W)."""
    f1, r1, f2, r2 = hash_words(words, k, seed, xp)
    return wordmask_from_hashes(f1, r1, f2, r2, n_hashes, log2_m, xp)


def choose_log2_m(n_solid: int, bits_per_kmer: float) -> int:
    want = max(64.0, n_solid * bits_per_kmer)
    log2_m = max(6, int(np.ceil(np.log2(want))))
    return min(log2_m, MAX_LOG2_M)


def saturation_warning(n_solid: int, log2_m: int, n_hashes: int) -> str | None:
    """Projected false-positive rate when the filter is (over)loaded; the
    reference never warns — we do, because a saturated filter silently
    collapses the ratio. Returns a message when FP > 1%."""
    m = float(1 << log2_m)
    fill = 1.0 - np.exp(-n_solid * n_hashes / m)
    fp = fill**n_hashes
    if fp > 0.01:
        return (
            f"Bloom filter overloaded: {n_solid} solid k-mers in 2^{log2_m} "
            f"bits -> projected FP rate {fp:.1%}; compression ratio will "
            "degrade (raise bloom_bits_per_kmer or abundance)"
        )
    return None


def build_np(solid_words: np.ndarray, log2_m: int, n_hashes: int, seed: int, k: int) -> np.ndarray:
    """Host build: returns uint32 bitset of shape (2^log2_m / 32,)."""
    bitset = np.zeros(1 << max(0, log2_m - 5), dtype=np.uint32)
    if solid_words.shape[0]:
        wi, mask = wordmask(solid_words, n_hashes, log2_m, seed, np, k)
        np.bitwise_or.at(bitset, wi.reshape(-1), mask.reshape(-1))
    return bitset


def probe_wordbit(bitset, wi, bit, xp):
    """True iff all bits at (wi, bit) pairs (..., H) are set."""
    u = xp.uint32
    w = bitset[wi]
    hit = (w >> bit) & u(1)
    return (hit == 1).all(axis=-1)


def probe_wordmask(bitset, wi, mask, xp):
    """Blocked membership: ONE gathered word per key, all mask bits set."""
    w = bitset[wi]
    return (w & mask) == mask


def probe(bitset, words, n_hashes: int, log2_m: int, seed: int, k: int):
    """Device probe of packed k-mer words (..., W) -> bool (...)."""
    wi, mask = wordmask(words, n_hashes, log2_m, seed, jnp, k)
    return probe_wordmask(bitset, wi, mask, jnp)


def probe_np(bitset: np.ndarray, words: np.ndarray, n_hashes: int, log2_m: int, seed: int, k: int):
    wi, mask = wordmask(words, n_hashes, log2_m, seed, np, k)
    return probe_wordmask(bitset, wi, mask, np)


def build_device(uniq_words, counts, cutoff, log2_m: int, n_hashes: int,
                 seed: int, k: int):
    """Device build from a distinct-kmer run: (M, W) u32 words + (M,) i32
    counts (0 = pad). Sort-dedup-scatter: sorting the (word, bit) pairs and
    dropping duplicates makes scatter-ADD equal bitwise OR (each set bit
    contributes exactly once) without the 2^log2_m byte-per-bit scratch the
    old path needed — that scratch is what capped log2_m at 32."""
    from functools import partial

    import jax

    @partial(jax.jit, static_argnames=("log2_m", "H", "seed", "k"))
    def _build(uw, cnt, co, log2_m: int, H: int, seed: int, k: int):
        nwords = 1 << (log2_m - 5)
        wi, bit = wordbit(uw, H, log2_m, seed, jnp, k)  # (M, H)
        solid = cnt >= co
        wif = jnp.where(solid[:, None], wi.astype(jnp.uint32), jnp.uint32(nwords)).reshape(-1)
        bitf = jnp.where(solid[:, None], bit, jnp.uint32(0)).reshape(-1)
        swi, sbit = jax.lax.sort((wif, bitf), num_keys=2)
        first = jnp.concatenate(
            [jnp.ones(1, bool), (swi[1:] != swi[:-1]) | (sbit[1:] != sbit[:-1])]
        )
        idx = jnp.where(first, swi, jnp.uint32(nwords)).astype(jnp.int32)
        out = jnp.zeros(nwords + 1, jnp.uint32).at[idx].add(
            jnp.uint32(1) << sbit, mode="drop"
        )
        return out[:nwords]

    return _build(uniq_words, counts, cutoff, log2_m, n_hashes, seed, k)
