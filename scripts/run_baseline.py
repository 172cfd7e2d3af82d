"""Run the feasible BASELINE.json configs and print a results table.

Usage: python scripts/run_baseline.py [--small]
Writes BASELINE_RESULTS.json next to the repo root. Config #5 (multi-host
whole-genome) has no multi-host hardware here; its shard-invariance is
covered by tests/test_distributed.py instead.
"""

from __future__ import annotations

import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("LEON_FORCE_CPU") == "1":
    # the JAX_PLATFORMS env var is overridden by the axon sitecustomize;
    # this is the reliable way to keep the sweep off the TPU tunnel
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

WORK = "/tmp/leon_baseline"
GENOME_LEN = 4_600_000
N_READS = 1_000_000
READ_LEN = 100


def gen_ecoli_fastq(path: str, n_reads: int, genome_len: int) -> None:
    rng = np.random.default_rng(0xEC011)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = rng.integers(0, 4, genome_len, dtype=np.uint8)
    starts = rng.integers(0, genome_len - READ_LEN, n_reads)
    idx = starts[:, None] + np.arange(READ_LEN)[None, :]
    reads = genome[idx]
    mut = rng.random((n_reads, READ_LEN)) < 0.005
    reads = np.where(mut, (reads + rng.integers(1, 4, (n_reads, READ_LEN))) & 3, reads)
    rev = (np.arange(n_reads) % 2).astype(bool)
    reads[rev] = 3 - reads[rev, ::-1]
    quals = np.clip(
        68 + np.cumsum(rng.integers(-2, 3, (n_reads, READ_LEN)), axis=1) % 8 - 4,
        33, 73,
    ).astype(np.uint8)
    seq_b = bases[reads]
    with open(path, "wb") as f:
        CH = 20000
        for s in range(0, n_reads, CH):
            e = min(n_reads, s + CH)
            parts = []
            for i in range(s, e):
                parts.append(
                    b"@SIM.%d %d/1 length=%d\n%s\n+\n%s\n"
                    % (i, i, READ_LEN, seq_b[i].tobytes(), quals[i].tobytes())
                )
            f.write(b"".join(parts))


def run(name, src, cfg, oracle="dna"):
    from leon_tpu import pipeline
    from leon_tpu.io import bank

    out = os.path.join(WORK, name + ".leon")
    t0 = time.time()
    st = pipeline.compress(src, out, cfg=cfg)
    t_c = time.time() - t0
    t0 = time.time()
    d = pipeline.decompress(out, os.path.join(WORK, name + ".out"), cfg=cfg)
    t_d = time.time() - t0
    if oracle == "byte":
        ok = open(src, "rb").read() == open(d["output"], "rb").read()
    else:
        a = (s for b in bank.read_blocks(src, 1 << 16) for s in b.seqs)
        b_ = (s for b in bank.read_blocks(d["output"], 1 << 16) for s in b.seqs)
        ok = all(x == y for x, y in zip(a, b_))
    res = {
        "config": name,
        "input_bytes": st["input_bytes"],
        "output_bytes": st["output_bytes"],
        "ratio": round(st["ratio"], 3),
        "n_reads": st["n_reads"],
        "compress_s": round(t_c, 2),
        "decompress_s": round(t_d, 2),
        "reads_per_s": round(st["n_reads"] / t_c, 1),
        "roundtrip_ok": ok,
        "stream_bytes": st["stream_bytes"],
        "n_solid_kmers": st["n_solid_kmers"],
    }
    print(json.dumps({kk: res[kk] for kk in res if kk != "stream_bytes"}), flush=True)
    return res


def main():
    from leon_tpu.config import LeonConfig

    os.makedirs(WORK, exist_ok=True)
    small = "--small" in sys.argv
    n_reads = 100_000 if small else N_READS
    glen = 1_000_000 if small else GENOME_LEN

    results = []
    # config 1: toy.fasta (reference fixture), defaults and seq-only
    toy = os.path.join(WORK, "toy.fasta")
    if not os.path.exists(toy):
        import shutil

        shutil.copy("/root/reference/data/toy.fasta", toy)
    results.append(run("toy_default", toy, LeonConfig(), oracle="byte"))
    results.append(run("toy_seqonly", toy, LeonConfig(seq_only=True)))

    # config 2: E.coli-scale FASTQ, -noheader -noqual
    eco = os.path.join(WORK, f"ecoli_{n_reads}.fastq")
    if not os.path.exists(eco):
        print("generating", eco, flush=True)
        gen_ecoli_fastq(eco, n_reads, glen)
    results.append(run("ecoli_dna", eco, LeonConfig(noheader=True, noqual=True)))

    # config 3: full default pipeline (headers + lossy quals)
    results.append(run("ecoli_full_lossy", eco, LeonConfig()))

    # config 3b: lossless
    results.append(run("ecoli_lossless", eco, LeonConfig(lossless=True), oracle="byte"))

    # config 4: k=63 with explicit abundance
    results.append(run("ecoli_k63", eco, LeonConfig(kmer_size=63, abundance=3, noheader=True, noqual=True)))

    # configs 5-6: realistic synthetic data (scripts/gen_realistic.py —
    # repeat-bearing genome, instrument headers, empirical-shape quality
    # strings; the closest no-network stand-in for the reference's real
    # SRA oracle, scripts/simple_test.sh SRR387476)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import gen_realistic

    for legacy, tag in ((False, "realistic_rta3"), (True, "realistic_legacy")):
        src = os.path.join(WORK, tag + ".fastq")
        if not os.path.exists(src):
            print("generating", src, flush=True)
            gen_realistic.gen(src, n_reads // 2, 100, glen // 2, 11 + legacy, legacy)
        results.append(run(tag + "_lossless", src, LeonConfig(lossless=True), oracle="byte"))
        results.append(run(tag + "_lossy", src, LeonConfig()))

    # gzip comparator
    data = open(eco, "rb").read()
    t0 = time.time()
    z = gzip.compress(data, 6)
    results.append({"config": "gzip6_comparator", "ratio": round(len(data) / len(z), 3),
                    "compress_s": round(time.time() - t0, 2)})
    print(json.dumps(results[-1]), flush=True)

    with open("BASELINE_RESULTS.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
