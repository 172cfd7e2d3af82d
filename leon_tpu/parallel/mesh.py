"""Device mesh utilities: sharded Bloom build (OR-allreduce) and
data-parallel walk encoding.

Design per SURVEY.md §2.4: the only runtime parallelism in the reference is
data-parallel read blocks over threads; here the mesh axis "d" plays that
role across chips, and the Bloom filter (the shared read-only structure the
reference keeps in shared memory) is replicated in each chip's HBM, built
collectively with an OR-allreduce (pmax over 0/1 bytes == bitwise OR).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from leon_tpu.ops import bloom

U32 = jnp.uint32


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("d",))


def _bloom_bytes_local(words: jnp.ndarray, valid: jnp.ndarray, nw, m_alloc: int,
                       H: int, seed: int, k: int):
    """Scatter this shard's solid k-mers into a 0/1 byte array of m bits.

    Byte-per-bit (not packed) so the scatter is a plain max-scatter and the
    cross-device OR is `pmax` — XLA has no OR-allreduce, but max on {0,1}
    is one. Packing to u32 words happens after the merge. nw (exact word
    count) is traced data; m_alloc = 32 * alloc_words(nw) is the static
    scratch size.
    """
    wi, bit = bloom.wordbit(words, H, nw, seed, jnp, k)  # (S, H)
    pos = (wi.astype(jnp.uint32) << jnp.uint32(5)) | bit
    v = jnp.broadcast_to(valid[:, None], pos.shape)
    idx = jnp.where(v, pos, U32(m_alloc)).reshape(-1).astype(jnp.int32)  # pad -> overflow slot
    by = jnp.zeros(m_alloc + 1, jnp.uint8).at[idx].max(jnp.uint8(1))
    return by[:m_alloc]


def _pack_bits(by: jnp.ndarray) -> jnp.ndarray:
    """(m,) 0/1 uint8 -> (m/32,) uint32 words (bit p -> word p>>5, bit p&31)."""
    b = by.reshape(-1, 32).astype(U32)
    weights = (U32(1) << jnp.arange(32, dtype=U32))[None, :]
    return jnp.sum(b * weights, axis=1, dtype=U32)


def sharded_bloom_build(mesh: Mesh, solid_words: np.ndarray, n_words: int, H: int, seed: int, k: int):
    """Build the replicated Bloom bitset collectively: shard the solid-kmer
    list over "d", scatter locally, OR-allreduce, pack. Returns a
    fully-replicated (m/32,) uint32 device array.

    Byte-per-bit scratch costs 32 * alloc_words(n_words) bytes per device;
    callers gate on n_words and fall back to the host build for huge
    filters. Returns a bitset padded to bloom.alloc_words(n_words).
    """
    if n_words > (1 << 27):
        raise ValueError("mesh byte-per-bit builder supports n_words <= 2^27 "
                         "(byte-per-bit scratch = 32*n_words bytes); use "
                         "bloom.build_device + replication for larger filters")
    m_alloc = 32 * bloom.alloc_words(n_words)
    n = mesh.devices.size
    S = solid_words.shape[0]
    W = solid_words.shape[1] if solid_words.ndim == 2 else 1
    pad = (-S) % max(n, 1)
    words = np.concatenate([solid_words, np.zeros((pad, W), np.uint32)], axis=0)
    valid = np.concatenate([np.ones(S, bool), np.zeros(pad, bool)])

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("d", None), P("d"), P()),
        out_specs=P(),
    )
    def build(w, v, nw):
        by = _bloom_bytes_local(w, v, nw, m_alloc, H, seed, k)
        by = lax.pmax(by, "d")
        return _pack_bits(by)

    return jax.jit(build)(words, valid, jnp.uint32(n_words))


def make_sharded_encoder(mesh: Mesh, k: int, H: int, n_words: int, seed: int):
    """jit-compiled data-parallel encode step: batch lanes sharded over "d",
    bitset replicated. Returns fn(codes (B,L), lengths (B,), bitset)."""
    from leon_tpu.ops import walk

    shard_b = NamedSharding(mesh, P("d"))
    shard_2d = NamedSharding(mesh, P("d", None))
    rep = NamedSharding(mesh, P())

    @partial(jax.jit, static_argnames=(), in_shardings=(shard_2d, shard_b, rep, rep))
    def step(codes, lengths, bitset, nw):
        return walk.encode_batch(codes, lengths, bitset, k, H, nw, seed)

    nw32 = jnp.uint32(n_words)
    return lambda codes, lengths, bitset: step(codes, lengths, bitset, nw32)


def make_sharded_counter(mesh: Mesh, k: int):
    """jit-compiled data-parallel k-mer scan: returns canonical kmers +
    validity, lanes sharded over "d" (host merges counts exactly)."""
    from leon_tpu.ops import kmer as K

    shard_b = NamedSharding(mesh, P("d"))
    shard_2d = NamedSharding(mesh, P("d", None))

    @partial(jax.jit, in_shardings=(shard_2d, shard_b))
    def step(codes, lengths):
        return K.kmer_scan(codes, lengths, k)

    return step
