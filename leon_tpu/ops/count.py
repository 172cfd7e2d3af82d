"""Canonical k-mer counting and the solidity threshold.

Reference behavior: DSK disk-streaming sorting-count ([R] gatb-core
kmer/impl/SortingCountAlgorithm, /root/reference/README.md:13) with an
automatic abundance cutoff from the count histogram (README.md:54).

TPU-first shape: per-batch k-mers are sorted on device (`lax.sort` with W
uint32 keys — no 64-bit needed) and run-length counted with segment ops;
the host merges per-batch (kmer, count) partials. The disk-partition dance
of DSK is replaced by device sort + host merge; multi-chip sharding of the
k-mer space comes via the parallel/ layer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@partial(jax.jit, static_argnames=())
def _sort_count_device(words_t: tuple, valid):
    """words_t: tuple of W (N,) uint32 arrays, most-significant first.
    Returns sorted words (tuple), boundary mask, and per-position counts
    (count at first occurrence, 0 elsewhere). Invalid entries sort last."""
    W = len(words_t)
    # force invalid entries to all-ones so they cluster at the end
    inv = ~valid
    keys = tuple(jnp.where(inv, jnp.uint32(0xFFFFFFFF), w) for w in words_t)
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
