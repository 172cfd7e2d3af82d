"""Stage microbenchmarks on the current backend (TPU by default).

Measures the pieces end-to-end throughput is built from: tunnel RTT,
k-mer scan, slab count flush, compact walk encode + D2H, flat decode +
D2H, and host stream assembly. Run with LEON_FORCE_CPU=1 for a host-only
baseline. (The TPU-native analog of profiling the reference's DSK/encode
hot loops, SURVEY.md §3.2.)
"""
import os
import time

import jax

if os.environ.get("LEON_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from leon_tpu.ops import bloom, count, walk
from leon_tpu.ops import kmer as K

print("backend:", jax.default_backend(), jax.devices())

rng = np.random.default_rng(1)
B, L, k, H, seed = 16384, 128, 31, 4, 0x1234ABCD
contig = rng.integers(0, 4, 200_000, dtype=np.uint8)
starts = rng.integers(0, 200_000 - 100, B)
codes = np.zeros((B, L), dtype=np.uint8)
idx = starts[:, None] + np.arange(100)[None, :]
codes[:, :100] = contig[idx]
lengths = np.full(B, 100, dtype=np.int32)


def timeit(name, f, n=5):
    f()  # warm
    t0 = time.time()
    for _ in range(n):
        f()
    dt = (time.time() - t0) / n
    print(f"{name:36s} {dt*1e3:9.1f} ms")
    return dt


x = jnp.zeros(8)
f_trivial = jax.jit(lambda v: v + 1)
timeit("trivial jit call (RTT)", lambda: jax.block_until_ready(f_trivial(x)))

timeit("kmer_scan dispatch+wait", lambda: jax.block_until_ready(K.kmer_scan(codes, lengths, k)))

canon, is_rc, valid = K.kmer_scan(codes, lengths, k)
jax.block_until_ready(canon)


def slab_flush():
    ctr = count.DeviceCounter(k, slab_kmers=1 << 25)
    ctr.add(canon, valid)
    return ctr.finalize(3, 12.0, H, seed)[:5]


timeit("slab count finalize (1.6M kmers)", slab_flush, n=3)

bitset, n_words, cutoff, n_solid, _ = slab_flush()
print(f"  n_solid={n_solid} n_words={n_words}")

cap_err = (8 * B + 7) // 8 * 8
cap_bif = (4 * B + 7) // 8 * 8


def enc_roundtrip():
    buf = walk.encode_batch_compact(
        codes, lengths, bitset, k, H, n_words, seed, cap_err, cap_bif, with_conf=False
    )
    return np.asarray(buf)


timeit("encode_batch_compact + D2H", enc_roundtrip, n=3)
buf = enc_roundtrip()
print(f"  compact buffer: {buf.nbytes/1e6:.2f} MB for {B} reads")

enc = walk.unpack_compact(buf, B, B, L, cap_err, cap_bif, with_conf=False)

# host stream assembly (current production path)
from leon_tpu.codecs import blocks as bc
from leon_tpu.config import LeonConfig
from leon_tpu.io import bank
from leon_tpu.io import container as cont

cfg = LeonConfig()
meta = cont.Meta(k=k, fmt=0, qual_mode=0, header_mode=0, n_hashes=H,
                 final_newline=True, n_words=n_words, seed=seed,
                 n_reads=B, abundance=3, seglen=cfg.max_device_len,
                 orig_ext=b"fasta")
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
seqs = [BASES[codes[i, :100]].tobytes() for i in range(B)]
blk = bank.SeqBlock(0, [b"r%d" % i for i in range(B)], seqs,
                    line_lens=[[100]] * B)
prep = bc.prepare_block(blk, cfg.max_device_len)


def assemble():
    adict = bc.AnchorDict(K.words_for_k(k))
    be = bc.BlockEncoder(cfg, meta, adict, blk, prep)
    be.add_subbatch(bc.SubbatchData(
        codes=codes, seg_len=prep.seg_len, seg_read=prep.seg_read,
        seg_off=prep.seg_off, n=B, enc=enc))
    return be.finish()


timeit("host stream assembly (16k reads)", assemble, n=3)

timeit("prepare_block (16k reads)", lambda: bc.prepare_block(blk, cfg.max_device_len), n=3)

# decode side
payload, sizes = assemble()
db = bc.parse_block(payload, meta)
from leon_tpu import pipeline

timeit("parse_block", lambda: bc.parse_block(payload, meta), n=3)

adict = bc.AnchorDict(K.words_for_k(k))
be = bc.BlockEncoder(cfg, meta, adict, blk, prep)
be.add_subbatch(bc.SubbatchData(
    codes=codes, seg_len=prep.seg_len, seg_read=prep.seg_read,
    seg_off=prep.seg_off, n=B, enc=enc))
be.finish()
dict_words = adict.words_array()


def decode_full():
    disp = pipeline._dispatch_block_decode(db, meta, dict_words, bitset, cfg)
    return pipeline._assemble_block_seqs(db, disp)


timeit("block decode (dispatch+assemble)", decode_full, n=3)
