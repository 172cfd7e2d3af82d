import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
# the env var alone is overridden by the axon sitecustomize; this is the
# reliable way to keep the smoke test off the TPU tunnel
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
from leon_tpu import pipeline
from leon_tpu.config import LeonConfig

rng = np.random.default_rng(7)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)

def make_fasta(path, n=150, contig_len=500, lmin=60, lmax=100):
    contig = rng.integers(0, 4, contig_len, dtype=np.uint8)
    with open(path, "wb") as f:
        for i in range(n):
            ln = int(rng.integers(lmin, lmax + 1))
            st = int(rng.integers(0, contig_len - ln))
            r = contig[st : st + ln].copy()
            mut = rng.random(ln) < 0.01
            r[mut] = (r[mut] + rng.integers(1, 4, mut.sum())) & 3
            if rng.random() < 0.5:
                r = (3 - r)[::-1]
            f.write(b">read%d some description %d\n" % (i, st))
            f.write(BASES[r].tobytes() + b"\n")

def make_fastq(path, n=150, contig_len=500, lmin=60, lmax=100):
    contig = rng.integers(0, 4, contig_len, dtype=np.uint8)
    with open(path, "wb") as f:
        for i in range(n):
            ln = int(rng.integers(lmin, lmax + 1))
            st = int(rng.integers(0, contig_len - ln))
            r = contig[st : st + ln].copy()
            mut = rng.random(ln) < 0.01
            r[mut] = (r[mut] + rng.integers(1, 4, mut.sum())) & 3
            s = BASES[r].tobytes()
            if i % 17 == 0:  # sprinkle Ns
                s = s[:5] + b"N" + s[6:]
            q = (rng.integers(33, 74, ln).astype(np.uint8)).tobytes()
            f.write(b"@SRR000.%d %d/1\n" % (i, i))
            f.write(s + b"\n+\n" + q + b"\n")

os.makedirs("/tmp/leonsmoke", exist_ok=True)
fa = "/tmp/leonsmoke/toy.fasta"
fq = "/tmp/leonsmoke/toy.fastq"
make_fasta(fa)
make_fastq(fq)

cfg = LeonConfig(batch_reads=64, reads_per_block=100)

print("=== FASTA round-trip ===")
st = pipeline.compress(fa, cfg=cfg)
print({kk: st[kk] for kk in ("n_reads", "n_anchored", "n_solid_kmers", "ratio", "output_bytes")})
print("streams:", st["stream_bytes"])
dd = pipeline.decompress(st["output"], cfg=cfg)
orig = open(fa, "rb").read(); dec = open(dd["output"], "rb").read()
print("FASTA byte-equal:", orig == dec)
if orig != dec:
    for i, (a, b) in enumerate(zip(orig, dec)):
        if a != b:
            print("first diff at", i, repr(orig[max(0,i-30):i+30]), "vs", repr(dec[max(0,i-30):i+30]))
            break
    print("len", len(orig), len(dec))
    sys.exit(1)

print("=== FASTQ lossless round-trip ===")
cfg2 = LeonConfig(batch_reads=64, reads_per_block=100, lossless=True)
st = pipeline.compress(fq, cfg=cfg2)
print({kk: st[kk] for kk in ("n_reads", "n_anchored", "ratio")})
print("streams:", st["stream_bytes"])
dd = pipeline.decompress(st["output"], cfg=cfg2)
orig = open(fq, "rb").read(); dec = open(dd["output"], "rb").read()
print("FASTQ byte-equal:", orig == dec)
if orig != dec:
    for i, (a, b) in enumerate(zip(orig, dec)):
        if a != b:
            print("first diff at", i, repr(orig[max(0,i-30):i+30]), "vs", repr(dec[max(0,i-30):i+30]))
            break
    print("len", len(orig), len(dec))
    sys.exit(1)
print("SMOKE OK")
