"""Round-5 probe: batch-size scaling of the hot kernels + count-sort cost,
degraded-mode methodology (see PARITY.md round-4 correction): enter
degraded mode first, then time fn(); np.asarray(small_reduction).

Questions this answers:
  1. Does the walk/anchor kernel run FASTER per read at larger B (scan
     per-step overhead amortization)?  -> batch_reads tuning
  2. What does the 33.5M-row count slab sort actually cost, and how does
     it scale with slab size?          -> count.finalize attribution
  3. What does a compact-buffer D2H drain cost per chunk at each B?
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

from leon_tpu.ops import bloom, count, walk
from leon_tpu.ops import kmer as K

k, H, seed = 31, 2, 0x1234ABCD
n_words = 1 << 16
L = 104


def timed(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jnp.ravel(out)[:4])  # compile + sync
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jnp.ravel(out)[:4])
        ts.append(time.time() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(7)
    bitset = jnp.asarray(
        rng.integers(0, 2**32, bloom.alloc_words(n_words), dtype=np.uint32))
    _ = np.asarray(jnp.arange(16))  # enter degraded mode

    # --- 1. full encode kernel vs B ---
    for B in (16384, 32768, 65536):
        codes_np = rng.integers(0, 4, (B, L), dtype=np.uint8)
        packed = jnp.asarray(K.pack_codes_np(codes_np))
        lengths = jnp.asarray(np.full(B, 100, np.int32))
        cap_err, cap_bif = 4 * B, 8 * B
        full_fn = jax.jit(lambda p, l: walk.encode_batch_compact_packed(
            p, l, bitset, k, H, np.uint32(n_words), seed, cap_err, cap_bif,
            False, L))
        t = timed(full_fn, packed, lengths)
        print(f"encode B={B}: {t:.4f}s ({B/t:,.0f} reads/s)", flush=True)

        # D2H drain cost of the compact buffer at this B
        buf = full_fn(packed, lengths)
        np.asarray(buf[:4])
        ts = []
        for _ in range(3):
            buf = full_fn(packed, lengths)
            buf.copy_to_host_async()
            t0 = time.time()
            np.asarray(buf)
            ts.append(time.time() - t0)
        nb = buf.size * 2
        print(f"  drain D2H {nb/1e6:.2f} MB: {min(ts):.4f}s", flush=True)

    # --- 2. count slab sort cost vs rows (k=31 -> W=2 keys) ---
    for n in (1 << 23, 1 << 24, 1 << 25):
        w0 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
        w1 = jnp.asarray(rng.integers(0, 2**30, n, dtype=np.uint32))
        valid = jnp.ones(n, bool)
        fn = jax.jit(lambda a, b, v: count._sort_count_device(
            (b, a), v, k)[2].sum())
        t = timed(fn, w0, w1, valid)
        print(f"sort_count n={n/1e6:.1f}M: {t:.3f}s "
              f"({n/t/1e6:.1f} M rows/s)", flush=True)

    # sort alone (no segment count) for attribution
    n = 1 << 25
    w0 = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    w1 = jnp.asarray(rng.integers(0, 2**30, n, dtype=np.uint32))
    fn = jax.jit(lambda a, b: jax.lax.sort((b, a), num_keys=2)[0].sum())
    print(f"lax.sort 2key n=33.5M: {timed(fn, w0, w1):.3f}s", flush=True)
    fn1 = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1)[0].sum())
    print(f"lax.sort 1key n=33.5M: {timed(fn1, w0):.3f}s", flush=True)

    # --- 3. kmer_scan cost at the two Bs ---
    for B in (16384, 65536):
        codes_np = rng.integers(0, 4, (B, L), dtype=np.uint8)
        packed = jnp.asarray(K.pack_codes_np(codes_np))
        lengths = jnp.asarray(np.full(B, 100, np.int32))
        fn = jax.jit(lambda p, l: K.kmer_scan_packed(p, l, k, L)[0].sum())
        print(f"kscan B={B}: {timed(fn, packed, lengths):.4f}s", flush=True)

    # --- 4. scatter-add counting table probe (alternative count design) ---
    n = 1 << 25
    idx = jnp.asarray(rng.integers(0, 1 << 26, n, dtype=np.int32))
    tbl_fn = jax.jit(lambda i: jnp.zeros(1 << 26, jnp.int32).at[i].add(1).sum())
    print(f"scatter-add 33.5M -> 64M table: {timed(tbl_fn, idx):.3f}s",
          flush=True)


if __name__ == "__main__":
    main()
