"""Does work dispatched BEFORE a process's first D2H execute at clean
speed? Fresh process: dispatch N walk chunks back-to-back (no sync), then
drain them all; compare against the same N chunks drained one-by-one
(the production interleave, degraded from drain 1 on).

If variant A's wall is ~transfers-only, the pipeline should avoid every
host sync until all walks are dispatched (device-side sizing decisions).
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
n_words = 1 << 18
L = 104
B = 16384
N = 20
MODE = sys.argv[1] if len(sys.argv) > 1 else "clean"


def main():
    rng = np.random.default_rng(7)
    bitset = jnp.asarray(
        rng.integers(0, 2**32, bloom.alloc_words(n_words), dtype=np.uint32))
    packs = []
    for i in range(N):
        codes = rng.integers(0, 4, (B, L), dtype=np.uint8)
        packs.append((jnp.asarray(K.pack_codes_np(codes)),
                      jnp.asarray(np.full(B, 100, np.int32))))
    cap_err, cap_bif = 4 * B, 8 * B

    def launch(p, l):
        return walk.encode_batch_compact_packed(
            p, l, bitset, k, H, np.uint32(n_words), seed,
            cap_err, cap_bif, False, L)

    # compile only (subprocess warmed the cache in a prior run; this
    # trace is cheap) — NO sync, no D2H
    b0 = launch(*packs[0])

    t0 = time.time()
    if MODE == "clean":
        bufs = [launch(*p) for p in packs]
        for b in bufs:
            b.copy_to_host_async()
        outs = [np.asarray(b) for b in bufs]
    else:  # interleaved: drain chunk i right after dispatching i (+1 ahead)
        outs = []
        prev = None
        for p in packs:
            b = launch(*p)
            b.copy_to_host_async()
            if prev is not None:
                outs.append(np.asarray(prev))
            prev = b
        outs.append(np.asarray(prev))
    dt = time.time() - t0
    print(f"{MODE}: {N} chunks in {dt:.3f}s = {N*B/dt:,.0f} reads/s",
          flush=True)


if __name__ == "__main__":
    main()
