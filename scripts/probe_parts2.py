"""Walk-kernel part timings in DEGRADED tunnel mode (the mode production
runs are in from their first drain onward), synced by a real D2H of a
small reduction each rep. This is the self-consistent methodology: part
times must sum ~to the full kernel time.
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
L = 104
B = 16384
ME = L - k


def timed(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jnp.ravel(out)[:4])  # compile + sync (enters degraded mode)
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
    codes_np = rng.integers(0, 4, (B, L), dtype=np.uint8)
    codes = jnp.asarray(codes_np)
    lengths = jnp.asarray(np.full(B, 100, np.int32))
    packed = jnp.asarray(K.pack_codes_np(codes_np))

    # enter degraded mode explicitly
    _ = np.asarray(jnp.arange(16))

    anchor_fn = jax.jit(lambda c, l, bs: walk._anchor_state(
        c, l, bs, k, H, jnp.uint32(n_words), seed)[1])
    print(f"anchor: {timed(anchor_fn, codes, lengths, bitset):.4f}s", flush=True)

    anchored, apos, st = jax.jit(
        lambda c, l, bs: walk._anchor_state(c, l, bs, k, H,
                                            jnp.uint32(n_words), seed)
    )(codes, lengths, bitset)
    afwd, f1, r1 = st

    walk_fn = jax.jit(lambda c, l, ap, an, w, a, b_: sum(
        p.astype(jnp.int32).sum() for p in walk._walk_fused(
            c, l, ap, an, (w, a, b_), bitset, k, H,
            jnp.uint32(n_words), seed, ME)[:6]))
    print(f"walk:   {timed(walk_fn, codes, lengths, apos, anchored, afwd, f1, r1):.4f}s", flush=True)

    cap_err, cap_bif = 4 * B, 8 * B
    full_fn = jax.jit(lambda p, l: walk.encode_batch_compact_packed(
        p, l, bitset, k, H, np.uint32(n_words), seed, cap_err, cap_bif,
        False, L))
    t = timed(full_fn, packed, lengths)
    print(f"full:   {t:.4f}s ({B/t:,.0f} reads/s)", flush=True)

    kscan_fn = jax.jit(lambda p, l: K.kmer_scan_packed(p, l, k, L)[0].sum())
    print(f"kscan:  {timed(kscan_fn, packed, lengths):.4f}s", flush=True)

    # anchor sub-parts
    a_scan = jax.jit(lambda c: walk._anchor_scan(c, k, seed)[1][0].sum())
    print(f"anchor.scan_only: {timed(a_scan, codes):.4f}s", flush=True)

    # walk variant without bloom gathers: replace probe by hash-parity
    import leon_tpu.ops.bloom as bl
    orig = bl.probe_wordmask
    try:
        bl.probe_wordmask = lambda bitset, wi, mask, xp: (wi & mask) != 0
        walk_np_fn = jax.jit(lambda c, l, ap, an, w, a, b_: sum(
            p.astype(jnp.int32).sum() for p in walk._walk_fused(
                c, l, ap, an, (w, a, b_), bitset, k, H,
                jnp.uint32(n_words), seed, ME)[:6]))
        print(f"walk.nogather: {timed(walk_np_fn, codes, lengths, apos, anchored, afwd, f1, r1):.4f}s", flush=True)
    finally:
        bl.probe_wordmask = orig


if __name__ == "__main__":
    main()
