"""Slab-streaming device counter vs the exact host oracle.

The reference counts k-mers with DSK's bounded-memory disk partitioning
(/root/reference/README.md:13); leon-tpu streams the multiset through
fixed HBM slabs with hierarchical distinct-run merging (ops/count.py).
These tests force tiny slabs so one input crosses many slab flushes and
several run merges, and require bit-identical histograms + Bloom bitsets
vs the one-shot host computation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from leon_tpu.ops import bloom, count
from leon_tpu.ops.kmer import top_mask


def _synth_kmers(rng, n, W, k, n_distinct):
    pool = rng.integers(0, 2**32, (n_distinct, W), dtype=np.uint32)
    if k % 16 != 0:
        pool[:, W - 1] &= np.uint32(top_mask(k))
    return pool[rng.integers(0, n_distinct, n)]


@pytest.mark.parametrize("k,W", [(31, 2), (15, 1), (32, 2)])
def test_slab_counter_matches_host_oracle(rng, k, W):
    kmers = _synth_kmers(rng, 60_000, W, k, 5_000)
    valid = rng.random(60_000) < 0.9
    vk = kmers[valid]
    uq, cn = np.unique(vk, axis=0, return_counts=True)
    hist_ref = np.bincount(np.minimum(cn, 255), minlength=256)
    hist_ref[0] = 0

    # tiny slabs: ~15 flushes and multiple hierarchical merges
    ctr = count.DeviceCounter(k, slab_kmers=4096, merge_factor=2)
    for s in range(0, 60_000, 2500):
        ctr.add(
            jnp.asarray(kmers[s : s + 2500].reshape(1, -1, W)),
            jnp.asarray(valid[s : s + 2500].reshape(1, -1)),
        )
    bitset, n_words, cutoff, n_solid, hist, _H = ctr.finalize(2, 12.0, 4, 7)

    assert np.array_equal(hist[1:256], hist_ref[1:256])
    solid_ref = uq[cn >= 2]
    assert n_solid == solid_ref.shape[0]
    assert np.array_equal(np.asarray(bitset)[:n_words],
                          bloom.build_np(solid_ref, n_words, 4, 7, k))
    assert not np.asarray(bitset)[n_words:].any()


def test_slab_boundary_duplicates_merge_exactly(rng):
    """A k-mer whose occurrences span many slabs must count once, with the
    total abundance (partial counts merge across runs)."""
    k, W = 31, 2
    hot = _synth_kmers(rng, 1, W, k, 1)
    cold = _synth_kmers(rng, 9_999, W, k, 9_999)
    kmers = np.concatenate([np.repeat(hot, 40, axis=0), cold])
    rng.shuffle(kmers)
    ctr = count.DeviceCounter(k, slab_kmers=1024, merge_factor=2)
    for s in range(0, kmers.shape[0], 512):
        c = kmers[s : s + 512]
        ctr.add(jnp.asarray(c.reshape(1, -1, W)), jnp.asarray(np.ones((1, c.shape[0]), bool)))
    _, _, _, _, hist, _H = ctr.finalize(None, 12.0, 4, 7)
    uq, cn = np.unique(kmers, axis=0, return_counts=True)
    hist_ref = np.bincount(np.minimum(cn, 255), minlength=256)
    hist_ref[0] = 0
    assert np.array_equal(hist[1:256], hist_ref[1:256])


def test_slab_counter_empty():
    ctr = count.DeviceCounter(31)
    bitset, n_words, cutoff, n_solid, hist, _H = ctr.finalize(None, 12.0, 4, 7)
    assert n_solid == 0 and cutoff == 2
    assert not np.asarray(bitset).any()


def test_host_spill_byte_identical(tmp_path, rng):
    """A counter forced to spill runs to host RAM must produce the
    byte-identical archive to the unspilled run (the chr-scale
    bounded-HBM path, config.count_spill_rows)."""
    from leon_tpu import pipeline
    from leon_tpu.config import LeonConfig

    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    contig = rng.integers(0, 4, 3000, dtype=np.uint8)
    src = tmp_path / "s.fasta"
    with open(src, "wb") as f:
        for i in range(400):
            st = int(rng.integers(0, 2900))
            f.write(b">r%d\n%s\n" % (i, BASES[contig[st : st + 100]].tobytes()))
    common = dict(batch_reads=64, reads_per_block=128, count_slab_kmers=4096)
    a = str(tmp_path / "spill.leon")
    b = str(tmp_path / "nospill.leon")
    # spill threshold below one slab: every merged run spills to host
    pipeline.compress(str(src), a, cfg=LeonConfig(count_spill_rows=1024, **common))
    pipeline.compress(str(src), b, cfg=LeonConfig(**common))
    assert open(a, "rb").read() == open(b, "rb").read()
    d = pipeline.decompress(a, cfg=LeonConfig(**common))
    assert open(d["output"], "rb").read() == src.read_bytes()


def test_distinct_run_after_final_merge_spill():
    """distinct_run when the FINAL merge itself crosses spill_rows: the
    collapsed run moves to host RAM and _runs empties — the genome-scale
    distributed-exchange path (regression: IndexError at WG scale)."""
    import numpy as np

    from leon_tpu.ops import kmer as K
    from leon_tpu.ops.count import DeviceCounter

    k = 5
    counter = DeviceCounter(k, slab_kmers=512, merge_factor=1, spill_rows=256)
    rng = np.random.default_rng(3)
    seqs = rng.integers(0, 4, (8, 64), dtype=np.uint8)
    lens = np.full(8, 64, np.int32)
    for _ in range(4):
        canon, _, valid = K.kmer_scan(seqs, lens, k)
        counter.add(canon, valid)
    uniq, counts = counter.distinct_run()
    assert uniq.shape[0] > 0
    # exact multiset: every k-mer appeared 4x its single-pass count
    assert int(counts.sum()) == 4 * 8 * (64 - k + 1)
