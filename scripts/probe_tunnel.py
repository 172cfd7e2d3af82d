"""Characterize today's TPU tunnel: D2H latency/bandwidth, clean vs
degraded mode, and dispatch overhead. Run standalone on the real chip.

Usage: python scripts/probe_tunnel.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def bench_d2h(nbytes: int, reps: int = 4) -> dict:
    n = nbytes // 4
    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.arange(n, dtype=jnp.uint32)
    ts = []
    for _ in range(reps):
        y = f(x)
        y.block_until_ready()
        t0 = time.time()
        _ = np.asarray(y)
        ts.append(time.time() - t0)
    return {"bytes": nbytes, "times_s": [round(t, 4) for t in ts]}


def bench_async_d2h(nbytes: int, k: int = 8) -> dict:
    """k overlapping async D2H transfers of the same size: total wall."""
    n = nbytes // 4
    f = jax.jit(lambda x, s: x * 2 + s)
    bufs = [f(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(i)) for i in range(k)]
    for b in bufs:
        b.block_until_ready()
    t0 = time.time()
    for b in bufs:
        b.copy_to_host_async()
    outs = [np.asarray(b) for b in bufs]
    dt = time.time() - t0
    assert outs[0][0] == 0 or True
    return {"bytes_each": nbytes, "k": k, "total_s": round(dt, 4),
            "per_transfer_s": round(dt / k, 4)}


def bench_dispatch(reps: int = 20) -> dict:
    f = jax.jit(lambda x: x + 1)
    x = jnp.arange(1024, dtype=jnp.uint32)
    f(x).block_until_ready()
    t0 = time.time()
    y = x
    for _ in range(reps):
        y = f(y)
    y.block_until_ready()
    return {"reps": reps, "total_s": round(time.time() - t0, 4)}


def bench_sort(n: int) -> dict:
    from jax import lax

    @jax.jit
    def srt(a, b):
        return lax.sort((a, b), num_keys=2)

    a = jnp.asarray(np.random.default_rng(0).integers(0, 2**32, n, dtype=np.uint32))
    b = jnp.asarray(np.random.default_rng(1).integers(0, 2**32, n, dtype=np.uint32))
    r = srt(a, b)
    r[0].block_until_ready()
    t0 = time.time()
    r = srt(a, b)
    r[0].block_until_ready()
    return {"rows": n, "time_s": round(time.time() - t0, 4)}


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    # dispatch overhead before any D2H (clean mode)
    print(json.dumps({"dispatch_clean": bench_dispatch()}))
    # tiny D2H (this may flip the tunnel into degraded mode)
    print(json.dumps({"d2h_4KB_first": bench_d2h(4 << 10, reps=3)}))
    print(json.dumps({"dispatch_after_d2h": bench_dispatch()}))
    for sz in (64 << 10, 256 << 10, 1 << 20, 4 << 20):
        print(json.dumps({"d2h": bench_d2h(sz, reps=3)}), flush=True)
    print(json.dumps({"d2h_async_256KB_x8": bench_async_d2h(256 << 10, 8)}), flush=True)
    print(json.dumps({"d2h_async_1MB_x8": bench_async_d2h(1 << 20, 8)}), flush=True)
    for n in (1 << 22, 1 << 25):
        print(json.dumps({"sort2": bench_sort(n)}), flush=True)


if __name__ == "__main__":
    main()
