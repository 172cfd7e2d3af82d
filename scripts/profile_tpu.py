import os, time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from leon_tpu.ops import bloom, count, walk
from leon_tpu.ops import kmer as K

print("devices:", jax.devices())

rng = np.random.default_rng(1)
B, L, k, H, seed = 4096, 128, 31, 4, 0x1234ABCD
contig = rng.integers(0, 4, 200_000, dtype=np.uint8)
starts = rng.integers(0, 200_000 - 100, B)
codes = np.zeros((B, L), dtype=np.uint8)
for i in range(B):
    codes[i, :100] = contig[starts[i] : starts[i] + 100]
lengths = np.full(B, 100, dtype=np.int32)

def timeit(name, f, n=5):
    f()  # warm
    t0 = time.time()
    for _ in range(n):
        f()
    dt = (time.time() - t0) / n
    print(f"{name:34s} {dt*1e3:9.1f} ms")
    return dt

# tunnel RTT
x = jnp.zeros(8)
f_trivial = jax.jit(lambda v: v + 1)
timeit("trivial jit call (tunnel RTT)", lambda: jax.block_until_ready(f_trivial(x)))

# kmer scan
timeit("kmer_scan device", lambda: jax.block_until_ready(K.kmer_scan(codes, lengths, k)))

canon, is_rc, valid = K.kmer_scan(codes, lengths, k)
canon.block_until_ready()
timeit("canon -> host transfer", lambda: (np.asarray(canon), np.asarray(valid)))

# count_batch total (device sort + host extract)
timeit("count_batch total", lambda: count.count_batch(np.asarray(canon), np.asarray(valid)))

canon_np, valid_np = np.asarray(canon), np.asarray(valid)
flat = jnp.asarray(canon_np.reshape(-1, canon_np.shape[-1]))
v = jnp.asarray(valid_np.reshape(-1))
W = canon_np.shape[-1]
words_t = tuple(flat[:, W - 1 - j] for j in range(W))
timeit("  sort_count device only", lambda: jax.block_until_ready(count._sort_count_device(words_t, v)))

uniq, counts = count.count_batch(canon_np, valid_np)
solid = uniq[counts >= 3]
log2_m = bloom.choose_log2_m(max(1, len(solid)), 12.0)
bits = bloom.build_np(solid, log2_m, H, seed)
bits_j = jnp.asarray(bits)

timeit("encode_batch device", lambda: jax.block_until_ready(
    walk.encode_batch(codes, lengths, bits_j, k, H, log2_m, seed)))

enc = walk.encode_batch(codes, lengths, bits_j, k, H, log2_m, seed)
jax.block_until_ready(enc)
timeit("enc -> host transfer", lambda: {kk: np.asarray(vv) for kk, vv in enc.items()})

# host stream assembly
from leon_tpu.codecs import blocks as bc
from leon_tpu.io import bank
from leon_tpu.config import LeonConfig
from leon_tpu.io import container as cont

enc_np = {kk: np.asarray(vv) for kk, vv in enc.items()}
cfg = LeonConfig()
meta = cont.Meta(k=k, fmt=0, qual_mode=0, header_mode=0, n_hashes=H,
                 final_newline=True, log2_mbits=log2_m, seed=seed,
                 n_reads=B, abundance=3)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
seqs = [BASES[codes[i, :100]].tobytes() for i in range(B)]
blk = bank.SeqBlock(0, [b"r%d" % i for i in range(B)], seqs,
                    line_lens=[[100]] * B)

def assemble():
    adict = bc.AnchorDict(K.words_for_k(k))
    be = bc.BlockEncoder(cfg, meta, adict, blk)
    be.add_subbatch(bc.SubbatchData(codes=codes, lengths=lengths, enc=enc_np,
                                    exc_pos=[None]*B, exc_byte=[None]*B))
    return be.finish()

timeit("host stream assembly", assemble, n=3)

# host merge_counts at scale
parts = [count.count_batch(canon_np, valid_np) for _ in range(4)]
timeit("merge_counts x4", lambda: count.merge_counts(parts), n=3)
