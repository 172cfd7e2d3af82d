"""Attribute the device unitig-build cost: compute vs payload D2H.

Methodology per PARITY.md "Measurement note": the axon tunnel enters a
degraded per-call mode after a process's FIRST device->host transfer, so
the build compute is timed with block_until_ready BEFORE any D2H, in a
fresh process. Run:

    python scripts/probe_unitig.py [n_solid] [k]

Prints one JSON line with compile, compute, and drain (D2H + host payload
assembly) seconds for a synthetic solid set shaped like the bench corpus.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_solid = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 31

    import jax

    if os.environ.get("LEON_FORCE_CPU") == "1":
        # the axon sitecustomize overrides JAX_PLATFORMS; this is the
        # reliable way to keep a probe off the real TPU
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    from leon_tpu.ops import kmer as K
    from leon_tpu.ops import unitig

    # synthetic genome-like solid set: all k-mers of one random contig
    rng = np.random.default_rng(7)
    contig = rng.integers(0, 4, n_solid + k - 1, dtype=np.uint8)
    words, _ = K.kmer_words_batch_np(
        contig[None, :], np.zeros(1, np.int64), k
    )  # just to warm the codec; real extraction below
    W = K.words_for_k(k)
    codes = contig[None, :]
    canon, _, valid = K.kmer_scan(jnp.asarray(codes),
                                  jnp.asarray(np.array([contig.size])), k)
    flat = np.asarray(canon).reshape(-1, W)[np.asarray(valid).reshape(-1)]
    # numeric big-int sort: MSW (column W-1) is the primary lexsort key;
    # dispatch_build's successor searchsorted requires this exact order
    order = np.lexsort(tuple(flat[:, j] for j in range(W)))
    s = flat[order]
    keep = np.ones(s.shape[0], bool)
    keep[1:] = (s[1:] != s[:-1]).any(axis=1)
    uniq = np.ascontiguousarray(s[keep])
    nu = uniq.shape[0]
    Mcap = unitig._bucket(nu)
    wpad = np.full((Mcap, W), 0xFFFFFFFF, np.uint32)
    wpad[:nu] = uniq
    cpad = np.zeros(Mcap, np.int32)
    cpad[:nu] = 3
    wj, cj = jnp.asarray(wpad), jnp.asarray(cpad)
    jax.block_until_ready((wj, cj))

    # compile (cold or cached)
    t0 = time.time()
    infl = unitig.dispatch_build(wj, cj, 2, k, nu, n_solid=nu)
    jax.block_until_ready(infl.buf)
    t_first = time.time() - t0

    # warm compute, still before any explicit D2H in this process
    t0 = time.time()
    infl = unitig.dispatch_build(wj, cj, 2, k, nu, n_solid=nu)
    jax.block_until_ready(infl.buf)
    t_compute = time.time() - t0

    t0 = time.time()
    payload = unitig.drain_build(infl)
    t_drain = time.time() - t0

    print(json.dumps({
        "n_solid": int(nu), "k": k, "Mcap": int(Mcap),
        "compile_plus_compute_s": round(t_first, 4),
        "compute_s": round(t_compute, 4),
        "drain_s": round(t_drain, 4),
        "payload_bytes": len(payload) if payload else 0,
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
