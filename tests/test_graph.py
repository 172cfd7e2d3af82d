"""de Bruijn graph API tests (reference parity target: [R] gatb-core
debruijn Graph/Traversal semantics, batched)."""

import numpy as np
import pytest

from leon_tpu import graph
from leon_tpu.ops import bloom, count
from leon_tpu.ops import kmer as K


@pytest.fixture
def dbg_and_contig(rng):
    k, H, seed = 15, 4, 3
    contig = rng.integers(0, 4, 400, dtype=np.uint8)
    # perfect coverage: every kmer of the contig x3
    codes = np.stack([contig] * 3)
    lengths = np.full(3, 400, dtype=np.int32)
    canon, _, valid = K.kmer_scan(codes, lengths, k)
    uniq, counts = count.count_batch(np.asarray(canon), np.asarray(valid))
    solid = uniq[counts >= 2]
    # generous sizing: these tests assert exact traversal semantics, so
    # keep the false-positive rate out of the picture (an FP at an early
    # step truncates the walk — seen once per hash-family change)
    n_words = bloom.choose_n_words(max(1, len(solid)), 24.0)
    import jax.numpy as jnp

    bits = jnp.asarray(bloom.build_np_classic(solid, n_words, H, seed, k))
    g = graph.DBG(bitset=bits, k=k, n_hashes=H, n_words=n_words, seed=seed)
    return g, contig, solid, k


def test_membership_and_degrees(dbg_and_contig):
    g, contig, solid, k = dbg_and_contig
    wins = np.stack([contig[i : i + k] for i in range(0, 300)])
    words = K.pack_codes_batch_np(wins, k)
    assert np.asarray(g.contains(words)).all()
    # interior nodes of a single contig: out-degree >= 1 (the true next
    # base) and usually exactly 1
    deg = np.asarray(g.out_degree(words[:-1]))
    assert (deg >= 1).all()
    assert (deg == 1).mean() > 0.9


def test_walk_reconstructs_contig(dbg_and_contig):
    g, contig, solid, k = dbg_and_contig
    start = K.pack_codes_batch_np(contig[None, :k], k)
    bases, n = g.walk(start, max_steps=100)
    bases, n = np.asarray(bases), int(np.asarray(n)[0])
    assert n > 50  # walks a long simple path
    np.testing.assert_array_equal(bases[0, :n], contig[k : k + n])


def test_node_index(dbg_and_contig):
    g, contig, solid, k = dbg_and_contig
    ni = graph.NodeIndex.from_solid(solid)
    idx = ni.lookup(solid)
    assert (idx >= 0).all() and len(set(idx.tolist())) == len(solid)
    # absent kmers -> -1
    rng = np.random.default_rng(0)
    junk = K.pack_codes_batch_np(rng.integers(0, 4, (50, k), dtype=np.uint8), k)
    jidx = ni.lookup(junk)
    hits = ni._as_sortable(junk)
    # nearly all random kmers are absent from a 400-base contig set
    assert (jidx == -1).mean() > 0.9
