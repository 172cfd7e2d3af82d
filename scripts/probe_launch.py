"""Measure degraded-mode per-launch cost of the walk-encode kernel vs
batch size, and of the count-pass kmer scan. Run on the real chip.

The axon tunnel enters a degraded per-launch mode after a process's first
D2H (PARITY.md); production runs live in that mode from the first drain
on, so per-launch overhead x launch count is the end-to-end encode cost.
This probe decides the chunk-size tradeoff.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from leon_tpu.ops import bloom, walk
from leon_tpu.ops import kmer as K

k, H, seed = 31, 2, 0x1234ABCD
n_words = 1 << 16
L = 128


def chunk_args(B, rng):
    codes = rng.integers(0, 4, (B, L), dtype=np.uint8)
    lens = np.full(B, 100, np.int32)
    packed = K.pack_codes_np(codes)
    return jnp.asarray(packed), jnp.asarray(lens)


def time_walk(B, bitset_j, rng, reps=3):
    packed, lens = chunk_args(B, rng)
    cap_err = 4 * B
    cap_bif = 8 * B
    outs = []
    t0 = time.time()
    for _ in range(reps):
        buf = walk.encode_batch_compact_packed(
            packed, lens, bitset_j, k, H, np.uint32(n_words), seed,
            cap_err, cap_bif, False, L)
        outs.append(buf)
    for b in outs:
        b.block_until_ready()
    dt = (time.time() - t0) / reps
    return dt


def time_scan(B, rng, reps=3):
    packed, lens = chunk_args(B, rng)
    t0 = time.time()
    outs = []
    for _ in range(reps):
        canon, _, valid = K.kmer_scan_packed(packed, lens, k, L)
        outs.append(canon)
    for c in outs:
        c.block_until_ready()
    return (time.time() - t0) / reps


def main():
    rng = np.random.default_rng(7)
    bitset = rng.integers(0, 2**32, bloom.alloc_words(n_words), dtype=np.uint32)
    bitset_j = jnp.asarray(bitset)

    sizes = [16384, 32768, 65536]
    # compile pass (before degradation; compiles hit the cache next runs)
    for B in sizes:
        time_walk(B, bitset_j, rng, reps=1)
        time_scan(B, rng, reps=1)
    print("compiled", flush=True)

    # clean-mode timings
    for B in sizes:
        print(f"clean walk B={B}: {time_walk(B, bitset_j, rng):.4f}s "
              f"scan: {time_scan(B, rng):.4f}s", flush=True)

    # enter degraded mode: one D2H
    _ = np.asarray(jnp.arange(1024)[:8])
    print("--- degraded mode ---", flush=True)
    for B in sizes:
        print(f"degraded walk B={B}: {time_walk(B, bitset_j, rng):.4f}s "
              f"scan: {time_scan(B, rng):.4f}s", flush=True)

    # degraded with D2H drain (the production pattern): dispatch, async, drain
    for B in sizes:
        packed, lens = chunk_args(B, rng)
        cap_err, cap_bif = 4 * B, 8 * B
        t0 = time.time()
        reps = 3
        bufs = []
        for _ in range(reps):
            buf = walk.encode_batch_compact_packed(
                packed, lens, bitset_j, k, H, np.uint32(n_words), seed,
                cap_err, cap_bif, False, L)
            buf.copy_to_host_async()
            bufs.append(buf)
        hosts = [np.asarray(b) for b in bufs]
        dt = (time.time() - t0) / reps
        per_read = dt / B
        print(f"degraded walk+drain B={B}: {dt:.4f}s/chunk "
              f"({1/per_read:,.0f} reads/s)", flush=True)


if __name__ == "__main__":
    main()
