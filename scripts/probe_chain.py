"""Is the walk kernel REALLY 0.1 ms in clean mode, or does
block_until_ready lie before the first D2H? Chain N launches by data
dependency, sync once at the end, in a FRESH process (no D2H ever).
If wall ~= N * 0.113 s, degraded-mode timing is the true kernel speed.
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
B = 16384


def main():
    rng = np.random.default_rng(7)
    bitset = rng.integers(0, 2**32, bloom.alloc_words(n_words), dtype=np.uint32)
    bitset_j = jnp.asarray(bitset)
    codes = rng.integers(0, 4, (B, L), dtype=np.uint8)
    lens = jnp.asarray(np.full(B, 100, np.int32))
    packed = jnp.asarray(K.pack_codes_np(codes))
    cap_err, cap_bif = 4 * B, 8 * B

    def launch(lens_in):
        return walk.encode_batch_compact_packed(
            packed, lens_in, bitset_j, k, H, np.uint32(n_words), seed,
            cap_err, cap_bif, False, L)

    # compile
    buf = launch(lens)
    buf.block_until_ready()

    N = 8
    t0 = time.time()
    cur = lens
    for _ in range(N):
        buf = launch(cur)
        # data dependency: fold a (always-zero) bit of the output into lens
        cur = lens + (buf[:B].astype(jnp.int32) & 0)
    buf.block_until_ready()
    dt = time.time() - t0
    print(f"clean chained: {N} launches in {dt:.4f}s = {dt/N:.4f}s/launch "
          f"({B*N/dt:,.0f} reads/s)", flush=True)

    # same measurement using block_until_ready per launch, no chaining
    t0 = time.time()
    for _ in range(N):
        launch(lens).block_until_ready()
    dt2 = time.time() - t0
    print(f"clean block-each: {dt2/N:.4f}s/launch", flush=True)


if __name__ == "__main__":
    main()
