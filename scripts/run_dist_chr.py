"""BASELINE.json config #5 analog: a >= 1 GB lossless FASTQ through the
2-process distributed driver, archive byte-compared to the
single-process run, RSS + traffic recorded (VERDICT r3 next #5).

Input: 4M reads x 100 bp over the 40 Mb repeat-bearing genome
(gen_realistic, same model as the chr-scale demo), full headers +
LOSSLESS qualities. Writes DIST_CHR.json at the repo root.

Usage: python scripts/run_dist_chr.py [--reads N] [--cpu-ref]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

WORKER = r"""
import os, sys, json, resource
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
src = sys.argv[4]; out = sys.argv[5]
from leon_tpu.parallel import distributed
from leon_tpu.config import LeonConfig
distributed.initialize(f"localhost:{port}", nproc, pid)
cfg = LeonConfig(lossless=True)
stats = distributed.compress_distributed(src, out, cfg=cfg)
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print("WORKER_STATS", pid, json.dumps({
    "time_total_s": stats["time_total_s"],
    "traffic_bytes": stats.get("traffic_bytes", {}),
    "parse_sharded": stats.get("parse_sharded"),
    "peak_rss_gb": round(peak / 1e6, 2),
    "n_solid_kmers": stats.get("n_solid_kmers"),
}), flush=True)
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=4_000_000)
    ap.add_argument("--genome", type=int, default=40_000_000)
    ap.add_argument("--out", default="/tmp/leon_distchr")
    a = ap.parse_args()

    os.makedirs(a.out, exist_ok=True)
    src = os.path.join(a.out, f"wg_{a.reads}.fastq")
    if not os.path.exists(src):
        import gen_realistic

        t0 = time.time()
        gen_realistic.gen(src, a.reads, 100, a.genome, seed=31, legacy=True)
        print(f"[gen] {os.path.getsize(src)/1e9:.2f} GB in "
              f"{time.time()-t0:.0f}s", file=sys.stderr)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = ROOT

    # --- single-process reference (the byte-identity target) ---
    ref = os.path.join(a.out, "wg_single.leon")
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-c", f"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from leon_tpu import pipeline
from leon_tpu.config import LeonConfig
pipeline.compress({src!r}, {ref!r}, cfg=LeonConfig(lossless=True))
"""],
        env=env, capture_output=True, timeout=7200,
    )
    single_s = time.time() - t0
    if r.returncode != 0:
        print(r.stderr.decode()[-3000:], file=sys.stderr)
        return 1

    # --- 2-process distributed run ---
    out = os.path.join(a.out, "wg_dist.leon")
    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(p), "2", "29711", src, out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for p in range(2)
    ]
    outs = [p.communicate(timeout=7200) for p in procs]
    dist_s = time.time() - t0
    per_proc = []
    for p, (so, se) in zip(procs, outs):
        if p.returncode != 0:
            print(se.decode()[-3000:], file=sys.stderr)
            return 1
        line = [l for l in so.decode().splitlines()
                if l.startswith("WORKER_STATS")][0]
        per_proc.append(json.loads(line.split(None, 2)[2]))

    same = open(ref, "rb").read() == open(out, "rb").read()
    result = {
        "config": "config #5 analog: >=1GB lossless FASTQ, 2-process "
                  "jax.distributed (localhost CPU; this environment has "
                  "one tunneled TPU chip, so multi-process device compute "
                  "runs on the CPU backend)",
        "n_reads": a.reads,
        "input_bytes": os.path.getsize(src),
        "archive_bytes": os.path.getsize(out),
        "ratio": round(os.path.getsize(src) / os.path.getsize(out), 3),
        "single_process_s": round(single_s, 1),
        "two_process_s": round(dist_s, 1),
        "speedup": round(single_s / dist_s, 3),
        "archive_byte_identical": bool(same),
        "per_process": per_proc,
    }
    with open(os.path.join(ROOT, "DIST_CHR.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    return 0 if same else 1


if __name__ == "__main__":
    raise SystemExit(main())
