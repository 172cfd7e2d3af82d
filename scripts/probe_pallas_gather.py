"""Probe: can a Pallas TPU kernel beat XLA's dynamic-gather lowering for
bitset probes? (VERDICT r4 next #2 / PARITY.md round-5 roofline: the walk
kernel is bound by ~10 ns/gathered-element through XLA's gather; the v5e
VPU+VMEM should sustain far more on a VMEM-resident table.)

Measures, for a u32 table of n_words and M random u32 indices:
  a) XLA jit `table[idx]` (the production probe path's primitive)
  b) Pallas kernel, table staged in VMEM, per-block `jnp.take`
  c) Pallas kernel, 8-bit LUT decomposition if (b) fails to lower

Run on the real TPU: python scripts/probe_pallas_gather.py
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def bench(fn, *args, n=5):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


@jax.jit
def xla_gather(table, idx):
    return table[idx]


def pallas_gather(table, idx, block=8 * 128 * 64):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = idx.shape[0]
    n_blocks = M // block

    def kernel(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0,
                              indices_are_sorted=False, unique_indices=False)

    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((table.shape[0],), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M,), jnp.uint32),
    )(table, idx)


def pallas_gather2d(table, idx, rows=512):
    """2D layout variant: idx as (R, 128) rows, table 1-D in VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = idx.shape[0]
    idx2 = idx.reshape(-1, 128)
    R = idx2.shape[0]
    n_blocks = R // rows

    def kernel(table_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((table.shape[0],), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.uint32),
    )(table, idx2)
    return out.reshape(M)


def main():
    rng = np.random.default_rng(7)
    M = 1 << 24  # 16.8M gathers — the bench chunk does ~24M
    idx_host = rng.integers(0, 1 << 30, M, dtype=np.uint32)

    for nw_mb in (1, 2, 8):
        n_words = (nw_mb << 20) // 4
        table = jnp.asarray(rng.integers(0, 1 << 32, n_words, dtype=np.uint32))
        idx = jnp.asarray((idx_host % np.uint32(n_words)).astype(np.int32))

        t = bench(xla_gather, table, idx)
        print(f"[xla  ] table={nw_mb}MB M={M}: {t*1e3:.1f} ms  "
              f"{M/t/1e6:.0f}M elem/s  {M*4/t/1e9:.2f} GB/s", flush=True)

        for name, fn in (("plas1d", pallas_gather), ("plas2d", pallas_gather2d)):
            try:
                f = jax.jit(functools.partial(fn))
                # correctness first
                got = np.asarray(f(table, idx))
                want = np.asarray(table)[np.asarray(idx)]
                ok = np.array_equal(got, want)
                t = bench(f, table, idx)
                print(f"[{name}] table={nw_mb}MB M={M}: {t*1e3:.1f} ms  "
                      f"{M/t/1e6:.0f}M elem/s  {M*4/t/1e9:.2f} GB/s ok={ok}",
                      flush=True)
            except Exception as e:
                print(f"[{name}] table={nw_mb}MB: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
