"""Canonical k-mer counting and the solidity threshold.

Reference behavior: DSK disk-streaming sorting-count ([R] gatb-core
kmer/impl/SortingCountAlgorithm, /root/reference/README.md:13) with an
automatic abundance cutoff from the count histogram (README.md:54).

TPU-first shape (device-resident, transfer-minimal): per-chunk canonical
k-mers accumulate in HBM; ONE `lax.sort` over the whole multiset (W uint32
keys — no 64-bit anywhere) + segment run-length count + on-device count
histogram. Only the 256-entry histogram crosses to the host (to pick the
abundance cutoff); the Bloom filter is then built on device straight from
the sorted array (no compaction, no host merge). The disk-partition dance
of DSK is replaced by HBM accumulation; multi-chip sharding of the k-mer
space comes via the parallel/ layer.

The legacy host-merge path (count_batch/merge_counts) remains for tests
and as the fallback when the k-mer multiset exceeds the HBM budget.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@partial(jax.jit, static_argnames=("k",))
def _sort_count_device(words_t: tuple, valid, k: int = 0):
    """words_t: tuple of W (N,) uint32 arrays, most-significant first.
    Returns sorted words (tuple), boundary mask, and per-position counts
    (count at first occurrence, 0 elsewhere). Invalid entries sort last.

    When k is given and not a multiple of 16, the top word of a real k-mer
    can never be all-ones (unused high bits are masked), so the all-ones
    sentinel doubles as the validity marker and the sort drops one
    operand (~1/3 less sort work)."""
    W = len(words_t)
    # force invalid entries to all-ones so they cluster at the end
    inv = ~valid
    keys = tuple(jnp.where(inv, jnp.uint32(0xFFFFFFFF), w) for w in words_t)
    if k and k % 16 != 0:
        sorted_ops = lax.sort(keys, num_keys=W)
        skeys = sorted_ops
        svalid = skeys[0] != jnp.uint32(0xFFFFFFFF)  # MSW all-ones = invalid
    else:
        sorted_ops = lax.sort(keys + (valid.astype(jnp.uint32),), num_keys=W)
        skeys, svalid = sorted_ops[:W], sorted_ops[W].astype(bool)
    n = skeys[0].shape[0]
    # boundary: any word differs from the previous position (invalids sort
    # to the end and are never boundaries; they contribute 0 to the sums)
    prev_ne = jnp.zeros(n, dtype=bool)
    for w in skeys:
        prev_ne = prev_ne | jnp.concatenate([jnp.ones(1, dtype=bool), w[1:] != w[:-1]])
    boundary = prev_ne & svalid
    seg = jnp.maximum(jnp.cumsum(boundary.astype(jnp.int32)) - 1, 0)
    counts_per_seg = jax.ops.segment_sum(svalid.astype(jnp.int32), seg, num_segments=n)
    counts = jnp.where(boundary, counts_per_seg[seg], 0)
    return skeys, boundary, counts


def count_batch(canon: np.ndarray | jnp.ndarray, valid) -> tuple[np.ndarray, np.ndarray]:
    """Count one batch of canonical k-mers on device.

    canon: (B, P, W) uint32, valid: (B, P) bool.
    Returns host arrays (unique (M, W) uint32, counts (M,) int64).
    """
    canon = jnp.asarray(canon)
    B, P, W = canon.shape
    flat = canon.reshape(-1, W)
    v = jnp.asarray(valid).reshape(-1)
    words_t = tuple(flat[:, W - 1 - j] for j in range(W))  # MSW first
    skeys, boundary, counts = _sort_count_device(words_t, v)
    boundary = np.asarray(boundary)
    counts = np.asarray(counts)
    idx = np.flatnonzero(boundary)
    uniq = np.stack([np.asarray(skeys[W - 1 - j])[idx] for j in range(W)], axis=1)
    return uniq, counts[idx].astype(np.int64)


def merge_counts(partials: list[tuple[np.ndarray, np.ndarray]]) -> tuple[np.ndarray, np.ndarray]:
    """Merge per-batch (unique, counts) partials on host (sorted merge)."""
    if not partials:
        return np.zeros((0, 1), dtype=np.uint32), np.zeros(0, dtype=np.int64)
    allk = np.concatenate([p[0] for p in partials], axis=0)
    allc = np.concatenate([p[1] for p in partials], axis=0)
    if allk.shape[0] == 0:
        return allk, allc
    W = allk.shape[1]
    # lexsort: most significant word = last key
    order = np.lexsort(tuple(allk[:, j] for j in range(W)))
    sk, sc = allk[order], allc[order]
    newgrp = np.ones(sk.shape[0], dtype=bool)
    newgrp[1:] = (sk[1:] != sk[:-1]).any(axis=1)
    gid = np.cumsum(newgrp) - 1
    out_counts = np.zeros(int(gid[-1]) + 1, dtype=np.int64)
    np.add.at(out_counts, gid, sc)
    return sk[newgrp], out_counts


def histogram(counts: np.ndarray, max_count: int = 255) -> np.ndarray:
    return np.bincount(np.minimum(counts, max_count), minlength=max_count + 1)


# ---------------------------------------------------------------------------
# Device-resident counting (the production path)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("max_count", "k"))
def _sort_count_hist_device(words_t: tuple, valid, max_count: int = 255, k: int = 0):
    """One-shot sort + run-length count + histogram of the whole k-mer
    multiset. Returns (sorted words tuple MSW-first, boundary, counts,
    hist (max_count+1,)). hist[c] = number of distinct k-mers with
    min(count, max_count) == c; hist[0] = 0."""
    skeys, boundary, counts = _sort_count_device(words_t, valid, k)
    cc = jnp.where(boundary, jnp.minimum(counts, max_count), 0)
    hist = jnp.zeros(max_count + 1, jnp.int32).at[cc].add(1, mode="drop")
    hist = hist.at[0].set(0)
    return skeys, boundary, counts, hist


@partial(jax.jit, static_argnames=("log2_m", "H", "seed", "k"))
def _bloom_from_sorted(skeys: tuple, boundary, counts, cutoff, log2_m: int, H: int, seed: int, k: int):
    """Build the Bloom bitset on device from the sorted multiset: scatter
    the bits of every boundary k-mer whose count >= cutoff. No compaction —
    non-solid entries scatter into an overflow slot."""
    from leon_tpu.ops import bloom

    W = len(skeys)
    words = jnp.stack([skeys[W - 1 - j] for j in range(W)], axis=-1)  # LSW-first
    solid = boundary & (counts >= cutoff)
    m = 1 << log2_m
    pos = bloom.bit_positions(words, H, log2_m, seed, jnp, k)  # (N, H)
    idx = jnp.where(solid[:, None], pos, jnp.uint32(m)).reshape(-1).astype(jnp.int32)
    by = jnp.zeros(m + 1, jnp.uint8).at[idx].max(jnp.uint8(1))[:m]
    b = by.reshape(-1, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
    return jnp.sum(b * weights, axis=1, dtype=jnp.uint32)


class DeviceCounter:
    """Accumulates canonical k-mers in HBM, then counts + builds the Bloom
    filter entirely on device. Host traffic: one 256-entry histogram."""

    def __init__(self, k: int):
        from leon_tpu.ops.kmer import words_for_k

        self.k = k
        self.W = words_for_k(k)
        self._chunks: list = []   # device (n, W) uint32
        self._valids: list = []   # device (n,) bool
        self.n_total = 0

    def add(self, canon, valid) -> None:
        """canon (B, P, W) device array, valid (B, P) device bool."""
        B, P, W = canon.shape
        self._chunks.append(canon.reshape(B * P, W))
        self._valids.append(valid.reshape(B * P))
        self.n_total += B * P

    def finalize(self, abundance, bits_per_kmer: float, H: int, seed: int):
        """Returns (bitset device array, log2_m, cutoff, n_solid, hist)."""
        from leon_tpu.ops import bloom

        W = self.W
        if not self._chunks:
            hist = np.zeros(256, np.int64)
            cutoff = abundance if abundance is not None else 2
            log2_m = bloom.choose_log2_m(1, bits_per_kmer)
            bitset = jnp.zeros(1 << (log2_m - 5), jnp.uint32)
            return bitset, log2_m, cutoff, 0, hist
        flat = jnp.concatenate(self._chunks, axis=0)
        valid = jnp.concatenate(self._valids, axis=0)
        # pad to a 1/8-octave size bucket: few compile shapes, little waste
        n = flat.shape[0]
        gran = max(1 << 12, 1 << (max(1, (n - 1).bit_length()) - 3))
        bucket = -(-n // gran) * gran
        if bucket > n:
            flat = jnp.concatenate(
                [flat, jnp.zeros((bucket - n, W), jnp.uint32)], axis=0
            )
            valid = jnp.concatenate([valid, jnp.zeros(bucket - n, bool)])
        self._chunks, self._valids = [], []
        words_t = tuple(flat[:, W - 1 - j] for j in range(W))
        skeys, boundary, counts, hist_d = _sort_count_hist_device(words_t, valid, k=self.k)
        hist = np.asarray(hist_d)  # the one transfer
        cutoff = abundance if abundance is not None else auto_cutoff(hist)
        n_solid = int(hist[min(cutoff, 255) :].sum())
        log2_m = bloom.choose_log2_m(max(1, n_solid), bits_per_kmer)
        bitset = _bloom_from_sorted(
            skeys, boundary, counts, jnp.int32(cutoff), log2_m, H, seed, self.k
        )
        return bitset, log2_m, cutoff, n_solid, hist


def auto_cutoff(hist: np.ndarray) -> int:
    """Automatic abundance threshold (reference: README.md:54 'default:
    automatic'). Our frozen rule: the first valley of the count histogram —
    smallest c in [2, 50] with 0 < hist[c] <= hist[c+1] (a rise after the
    error peak, with a non-empty valley); fallback 2."""
    top = min(50, hist.size - 2)
    for c in range(2, top + 1):
        if 0 < hist[c] <= hist[c + 1]:
            return c
    return 2
