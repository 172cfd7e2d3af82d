"""Chr-scale demonstration run (BASELINE.json config #3 analog).

Generates a 10M-read / ~2.5 GB FASTQ over a 40 Mb repeat-bearing genome
(scripts/gen_realistic.py), compresses it FULL-DEFAULT (headers + lossy
quals, k=31, auto abundance) in stream mode on the real device, then
decompresses and verifies:

- headers and DNA byte-exact vs the original (streamed comparison),
- qualities obey the LOSSY-Q1 invariant (a byte changes only from
  >= '@' to 'I', i.e. graph-confirmed positions pinned to Q40).

Records wall-clock, peak RSS (both passes), stage/span times, per-stream
bytes and the section choice into CHRSCALE.json and prints a summary.
The reference contract this demonstrates: bounded-memory disk-streaming
scale (/root/reference/README.md:13).

Usage: python scripts/run_chrscale.py [--reads N] [--genome G] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def peak_rss_tracker(stop, out):
    """Poll VmHWM (peak RSS) — getrusage only reports per-process peak at
    exit granularity; VmHWM is the kernel's own high-water mark."""
    while not stop.is_set():
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmHWM"):
                        out["peak_rss_kb"] = int(line.split()[1])
        except OSError:
            pass
        stop.wait(0.5)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=10_000_000)
    ap.add_argument("--genome", type=int, default=40_000_000)
    ap.add_argument("--len", dest="read_len", type=int, default=100)
    ap.add_argument("--out", default="/tmp/leon_chrscale")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--batch", type=int, default=0,
                    help="override cfg.batch_reads (smoke runs)")
    ap.add_argument("--slab-mb-rows", type=int, default=0,
                    help="override count_slab_kmers (in M rows); with "
                         "--merge-factor/--spill-mb-rows caps every count "
                         "program's shape — the workaround when the remote "
                         "XLA compile service 500s on giant merge programs")
    ap.add_argument("--merge-factor", type=int, default=0)
    ap.add_argument("--spill-mb-rows", type=int, default=0)
    a = ap.parse_args()

    import jax

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    os.makedirs(a.out, exist_ok=True)
    src = os.path.join(a.out, f"chr_{a.reads}.fastq")
    if not os.path.exists(src) and not a.skip_gen:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import gen_realistic

        t0 = time.time()
        gen_realistic.gen(src, a.reads, a.read_len, a.genome, seed=11,
                          legacy=False)
        print(f"[gen] {os.path.getsize(src)/1e9:.2f} GB in "
              f"{time.time()-t0:.0f}s", file=sys.stderr)

    from leon_tpu import pipeline
    from leon_tpu.config import LeonConfig
    from leon_tpu.io import bank, container

    # full default: headers + LOSSY quals, k=31, auto abundance
    over = {}
    if a.batch:
        over["batch_reads"] = a.batch
    if a.slab_mb_rows:
        over["count_slab_kmers"] = a.slab_mb_rows << 20
    if a.merge_factor:
        over["count_merge_factor"] = a.merge_factor
    if a.spill_mb_rows:
        over["count_spill_rows"] = a.spill_mb_rows << 20
    cfg = LeonConfig(**over)
    rss = {"peak_rss_kb": 0}
    stop = threading.Event()
    thr = threading.Thread(target=peak_rss_tracker, args=(stop, rss), daemon=True)
    thr.start()

    arc = os.path.join(a.out, "chr.leon")
    t0 = time.time()
    stats = pipeline.compress(src, arc, cfg=cfg)
    compress_s = time.time() - t0
    compress_rss = dict(rss)

    r = container.Reader(arc)
    section = "UNITIGS" if r.unitigs_payload is not None else "BLOOM"
    version = r.version
    r.close()

    dec = os.path.join(a.out, "chr.out.fastq")
    t0 = time.time()
    dstats = pipeline.decompress(arc, dec, cfg=cfg)
    decompress_s = time.time() - t0
    stop.set()

    # --- streamed verification + LOSSY-Q1 distortion accounting
    # (VERDICT r4 #7c: quantify the lossy transform, don't just assert it:
    # % of quality bytes changed, max |delta Q|, mean |delta Q| over
    # changed positions — the measurable content of the reference's "the
    # loss is in fact a gain" claim, README.md:55) ---
    import numpy as np

    t0 = time.time()
    n_bad_h = n_bad_s = n_bad_q = n = 0
    q_total = q_changed = 0
    dq_max = 0
    dq_sum = 0
    it_a = bank.read_blocks(src, 1 << 14)
    it_b = bank.read_blocks(dec, 1 << 14)
    for ba, bb in zip(it_a, it_b):
        n += ba.n_reads
        if ba.headers != bb.headers:
            n_bad_h += 1
        if ba.seqs != bb.seqs:
            n_bad_s += 1
        for qa, qb in zip(ba.quals, bb.quals):
            q_total += len(qa)
            if qa == qb:
                continue
            x = np.frombuffer(qa, np.uint8)
            y = np.frombuffer(qb, np.uint8)
            # LOSSY-Q1: only bytes >= '@' may change, and only to 'I'
            diff = x != y
            if not ((x[diff] >= ord("@")).all() and (y[diff] == ord("I")).all()):
                n_bad_q += 1
            nd = int(diff.sum())
            q_changed += nd
            if nd:
                dq = np.abs(x[diff].astype(np.int32) - y[diff].astype(np.int32))
                dq_max = max(dq_max, int(dq.max()))
                dq_sum += int(dq.sum())
    verify_s = time.time() - t0
    ok = n_bad_h == 0 and n_bad_s == 0 and n_bad_q == 0 and n == a.reads
    lossy_distortion = {
        "q_bytes": q_total,
        "pct_changed": round(100.0 * q_changed / max(1, q_total), 3),
        "max_abs_dq": dq_max,
        "mean_abs_dq_changed": round(dq_sum / max(1, q_changed), 3),
        "note": "changes only raise Q>=31 bases to Q40 at graph-confirmed "
                "positions (LOSSY-Q1, FORMAT.md 9)",
    }

    result = {
        "config": "chr-scale full-default (headers + lossy quals), stream mode",
        "n_reads": a.reads,
        "genome_bp": a.genome,
        "input_bytes": os.path.getsize(src),
        "archive_bytes": os.path.getsize(arc),
        "ratio": round(os.path.getsize(src) / os.path.getsize(arc), 3),
        "compress_s": round(compress_s, 1),
        "compress_reads_per_s": round(a.reads / compress_s, 1),
        "decompress_s": round(decompress_s, 1),
        "decompress_reads_per_s": round(a.reads / decompress_s, 1),
        "verify_s": round(verify_s, 1),
        "peak_rss_gb_compress": round(compress_rss["peak_rss_kb"] / 1e6, 2),
        "peak_rss_gb_total": round(rss["peak_rss_kb"] / 1e6, 2),
        "section": section,
        "container_version": version,
        "n_solid_kmers": stats.get("n_solid_kmers"),
        "abundance": stats.get("abundance"),
        "stream_bytes": stats.get("stream_bytes"),
        "stages": {kk: stats[kk] for kk in stats if kk.startswith("time_")},
        "span_s": stats.get("span_s"),
        "decompress_span_s": dstats.get("span_s"),
        "verified": {"headers_exact": n_bad_h == 0, "dna_exact": n_bad_s == 0,
                     "quals_lossy_q1": n_bad_q == 0, "n_reads_match": n == a.reads},
        "lossy_distortion": lossy_distortion,
        "ok": ok,
        "backend": jax.default_backend(),
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "CHRSCALE.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
