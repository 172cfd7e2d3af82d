"""Decompose the walk-encode kernel cost with the chained-dependency
methodology (block_until_ready is unreliable before a D2H on this
tunnel; a data-dependency chain with one final sync is not).

Parts measured per 16384x128 chunk:
  anchor  — _anchor_state (anchor scan + position probes + argmin)
  walk    — _walk_fused (97-step scan, 4 probes/step)
  compact — event-stream compaction scatters + packing
  full    — encode_batch_compact_packed
  noprobe — walk variant with gathers replaced by constant (gather cost)
"""
import os
import sys
import time
from functools import partial

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
B = 16384
ME = L - k


@partial(jax.jit, static_argnames=())
def anchor_part(codes, lengths, bitset):
    anchored, apos, state0 = walk._anchor_state(codes, lengths, bitset, k, H,
                                                jnp.uint32(n_words), seed)
    return apos + anchored.astype(jnp.int32) + state0[1].astype(jnp.int32)


@partial(jax.jit, static_argnames=())
def walk_part(codes, lengths, apos, anchored, f1, r1, f2, r2, afwd, bitset):
    planes = walk._walk_fused(codes, lengths, apos, anchored,
                              (afwd, f1, r1, f2, r2), bitset, k, H,
                              jnp.uint32(n_words), seed, ME)
    # cheap reduction so nothing is dead-code eliminated
    return sum(p.astype(jnp.int32).sum() for p in planes[:6])


def chain(fn, args, dep_idx, N=6):
    """Run fn N times with a data dependency through args[dep_idx]."""
    out = fn(*args)
    jax.block_until_ready(out)  # compile
    t0 = time.time()
    a = list(args)
    for _ in range(N):
        out = fn(*a)
        z = (jnp.ravel(out)[0].astype(jnp.int32) & 0)
        a[dep_idx] = args[dep_idx] + z.astype(args[dep_idx].dtype)
    jax.block_until_ready(out)
    return (time.time() - t0) / N


def main():
    rng = np.random.default_rng(7)
    bitset = jnp.asarray(
        rng.integers(0, 2**32, bloom.alloc_words(n_words), dtype=np.uint32))
    codes_np = rng.integers(0, 4, (B, L), dtype=np.uint8)
    codes = jnp.asarray(codes_np)
    lengths = jnp.asarray(np.full(B, 100, np.int32))
    packed = jnp.asarray(K.pack_codes_np(codes_np))

    t = chain(anchor_part, (codes, lengths, bitset), 1)
    print(f"anchor: {t:.4f}s/chunk", flush=True)

    # real anchor state for the walk part
    anchored, apos, st = walk._anchor_state(codes, lengths, bitset, k, H,
                                            jnp.uint32(n_words), seed)
    afwd, f1, r1, f2, r2 = st
    t = chain(walk_part, (codes, lengths, apos, anchored, f1, r1, f2, r2,
                          afwd, bitset), 1)
    print(f"walk:   {t:.4f}s/chunk", flush=True)

    cap_err, cap_bif = 4 * B, 8 * B

    @jax.jit
    def full(packed_in, lengths_in):
        return walk.encode_batch_compact_packed(
            packed_in, lengths_in, bitset, k, H, np.uint32(n_words), seed,
            cap_err, cap_bif, False, L)

    t = chain(full, (packed, lengths), 1)
    print(f"full:   {t:.4f}s/chunk ({B/t:,.0f} reads/s)", flush=True)

    # count-pass kmer scan kernel
    t0fn = jax.jit(lambda p, l: K.kmer_scan_packed(p, l, k, L)[0].sum())
    t = chain(t0fn, (packed, lengths), 1)
    print(f"kscan:  {t:.4f}s/chunk", flush=True)


if __name__ == "__main__":
    main()
