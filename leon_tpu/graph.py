"""Batched de Bruijn graph API over the Bloom-filter membership structure.

The reference ships a full Graph façade ([R] gatb-core debruijn/impl/*:
Node/Edge iteration, successors, traversal; SURVEY.md §2.3) even though
Leon itself bypasses it and probes the Bloom filter directly. This module
is the TPU-native equivalent: every query is BATCHED over (N, ...) k-mer
arrays and runs on device — nodes are not objects but rows. Node->index
maps (the reference uses a BooPHF MPHF) are served by `searchsorted` over
the sorted solid-kmer array instead — sorted arrays are the TPU-idiomatic
perfect-hash substitute (binary search vectorizes; an MPHF's random
gathers would not beat it on this hardware).
"""

from __future__ import annotations

from dataclasses import dataclass


import jax
import jax.numpy as jnp
import numpy as np

from leon_tpu.ops import bloom
from leon_tpu.ops.kmer import U32, shl2, shr2_ins


@dataclass(frozen=True)
class DBG:
    """A probabilistic de Bruijn graph: nodes = canonical solid k-mers
    present in the Bloom bitset (false positives possible, like the
    reference's Bloom-backed graph).

    The graph uses CLASSIC (unblocked) Bloom addressing
    (bloom.build_np_classic / probe_classic), not the container's blocked
    v3 family: assembly-style traversal (walk/simple paths) stops at any
    apparent branch, so its false-positive sensitivity is categorically
    higher than the compressor's event-recording walk — an FP there costs
    a few output bytes, an FP here truncates a contig. Classic addressing
    pays H gathers per probe for ~5-10x lower FP at equal size."""

    bitset: jnp.ndarray  # (n_words,) uint32
    k: int
    n_hashes: int
    n_words: int
    seed: int

    # -- node queries ------------------------------------------------------

    def contains(self, kmers) -> jnp.ndarray:
        """(N, W) packed k-mer words (either strand) -> (N,) bool."""
        return bloom.probe_classic(self.bitset, jnp.asarray(kmers), self.n_hashes,
                                   self.n_words, self.seed, self.k)

    # -- edge queries ------------------------------------------------------

    def _neighbor_words(self, kmers, direction: str):
        """(N, W) -> (N, 4, W) neighbor k-mers (append/prepend base x)."""
        kmers = jnp.asarray(kmers)
        k = self.k
        if direction == "out":
            cands = [shl2(kmers, U32(x), k) for x in range(4)]
        else:
            cands = [shr2_ins(kmers, U32(x), k) for x in range(4)]
        return jnp.stack(cands, axis=1)

    def successors(self, kmers) -> jnp.ndarray:
        """(N, W) -> (N, 4) bool: which of the 4 forward extensions are
        present (strand-invariant membership)."""
        return self.contains(self._neighbor_words(kmers, "out").reshape(-1, kmers.shape[-1])).reshape(-1, 4)

    def predecessors(self, kmers) -> jnp.ndarray:
        return self.contains(self._neighbor_words(kmers, "in").reshape(-1, kmers.shape[-1])).reshape(-1, 4)

    def out_degree(self, kmers) -> jnp.ndarray:
        return self.successors(kmers).sum(axis=1)

    def in_degree(self, kmers) -> jnp.ndarray:
        return self.predecessors(kmers).sum(axis=1)

    def is_branching(self, kmers) -> jnp.ndarray:
        """Branching node: in-degree or out-degree != 1 (reference
        Graph::isBranching semantics)."""
        return (self.out_degree(kmers) != 1) | (self.in_degree(kmers) != 1)

    # -- traversal ---------------------------------------------------------

    def walk(self, kmers, max_steps: int):
        """Deterministic simple-path extension, batched over N start nodes:
        at each step follow the unique successor; stop at dead ends or
        bifurcations (reference Traversal 'simple' contig semantics).

        Returns (bases (N, max_steps) uint8, n_steps (N,) int32) where
        bases[i, :n_steps[i]] are the appended nucleotides.
        """
        kmers = jnp.asarray(kmers)

        def step(carry, _):
            cur, alive = carry
            succ = self.successors(cur)                      # (N, 4)
            deg = succ.sum(axis=1)
            uniq = jnp.argmax(succ, axis=1).astype(jnp.int32)
            go = alive & (deg == 1)
            nxt = shl2(cur, uniq.astype(U32), self.k)
            cur = jnp.where(go[:, None], nxt, cur)
            return (cur, go), (uniq.astype(jnp.uint8), go)

        (cur, _), (bases, gos) = jax.lax.scan(
            step, (kmers, jnp.ones(kmers.shape[0], bool)),
            None, length=max_steps,
        )
        bases = jnp.moveaxis(bases, 0, 1)
        gos = jnp.moveaxis(gos, 0, 1)
        return bases, gos.sum(axis=1).astype(jnp.int32)


@dataclass(frozen=True)
class NodeIndex:
    """Node -> dense index over the exact solid set (the reference wires a
    BooPHF MPHF here; sorted-array binary search is the batched
    equivalent). Built host-side from the sorted canonical solid k-mers."""

    sorted_words: np.ndarray  # (n, W) uint32, lexicographic by (MSW..LSW)

    @classmethod
    def from_solid(cls, solid_words: np.ndarray) -> "NodeIndex":
        W = solid_words.shape[1]
        order = np.lexsort(tuple(solid_words[:, j] for j in range(W)))
        return cls(np.ascontiguousarray(solid_words[order]))

    def _as_sortable(self, words: np.ndarray) -> np.ndarray:
        W = words.shape[1]
        dt = np.dtype([(f"w{j}", ">u4") for j in range(W - 1, -1, -1)])
        rec = np.empty(words.shape[0], dtype=dt)
        for j in range(W):
            rec[f"w{j}"] = words[:, j]
        return rec

    def lookup(self, words: np.ndarray) -> np.ndarray:
        """(N, W) -> (N,) int64 index into the solid set, -1 if absent."""
        hay = self._as_sortable(self.sorted_words)
        needles = self._as_sortable(words)
        idx = np.searchsorted(hay, needles)
        idx_c = np.clip(idx, 0, max(0, hay.shape[0] - 1))
        hit = hay.shape[0] > 0
        found = (hay[idx_c] == needles) if hit else np.zeros(len(needles), bool)
        return np.where(found, idx_c, -1)

    def __len__(self) -> int:
        return self.sorted_words.shape[0]
