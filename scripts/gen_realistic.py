"""Realistic synthetic sequencing data (no network: built, not downloaded).

The reference's CI oracle is a real SRA FASTQ (Illumina reads,
/root/reference/scripts/simple_test.sh:11 SRR387476). This environment has
no network, so this generator models what real data stresses in a
Leon-class compressor (VERDICT round 1, missing #3):

- genome REPEAT structure (segmental duplications with divergence) ->
  bifurcation rate in the walk encoder
- instrument-format headers `@SIM:run:flowcell:lane:tile:x:y pair:N:0:index`
  with correlated tile/x/y counters -> header token-delta codec
- empirical-shape Illumina quality strings: position-dependent mean with
  3'-end decay, Markov correlation between adjacent cycles, occasional
  low-quality dips, and a small discrete alphabet (8 bins like modern
  RTA3) or a 40-level legacy mode -> quality codec

Usage: python scripts/gen_realistic.py out.fastq [--reads N] [--len L]
         [--genome G] [--legacy-quals] [--seed S]
"""

from __future__ import annotations

import argparse

import numpy as np

# RTA3-style 8-level quality alphabet (Phred+33 ASCII)
_Q_BINS = np.array([ord(c) for c in "#,:FFFFF"], dtype=np.uint8)


def make_genome(rng: np.random.Generator, size: int) -> np.ndarray:
    """Genome with repeat structure: a random backbone, then ~20% of it
    overwritten by diverged copies of earlier segments (SINE/LINE-like)."""
    g = rng.integers(0, 4, size, dtype=np.uint8)
    budget = size // 5
    while budget > 0:
        seg = int(rng.integers(300, 8000))
        src = int(rng.integers(0, max(1, size - seg)))
        dst = int(rng.integers(0, max(1, size - seg)))
        copy = g[src : src + seg].copy()
        div = rng.random(seg) < 0.02  # 2% divergence between repeat copies
        copy[div] = (copy[div] + rng.integers(1, 4, int(div.sum()))) & 3
        g[dst : dst + seg] = copy
        budget -= seg
    return g


def make_quals(rng: np.random.Generator, n: int, L: int, legacy: bool,
               run_degrade: bool = True) -> np.ndarray:
    """Illumina-shaped quality matrix (n, L) of ASCII bytes.

    Latent per-cycle error logit: read-level offset + positional profile
    (ramp-up over the first ~5 cycles, slow 3' decay) + AR(1) noise +
    rare mid-read dips + RUN-END degradation (reads later in the run —
    i.e. later rows — shift down, the reagent-decay curve real runs
    show). Quantized to 8 RTA3 bins (default) or 40 levels (legacy)."""
    pos = np.arange(L)
    profile = 38.0 - 6.0 * (pos / max(1, L - 1)) ** 2  # 3' decay
    profile[: min(5, L)] -= np.linspace(4, 0, min(5, L))  # warm-up
    read_off = rng.normal(0.0, 2.0, (n, 1))
    if run_degrade and n > 1:
        # flowcell/reagent decay over the run: up to ~4Q drop by run end,
        # superlinear (most decay in the last third)
        read_off = read_off - 4.0 * (np.arange(n)[:, None] / (n - 1)) ** 2
    ar = np.empty((n, L))
    ar[:, 0] = rng.normal(0, 1.5, n)
    alpha = 0.85
    innov = rng.normal(0, 1.5 * np.sqrt(1 - alpha * alpha), (n, L))
    for j in range(1, L):  # AR(1) across cycles
        ar[:, j] = alpha * ar[:, j - 1] + innov[:, j]
    q = profile[None, :] + read_off + ar
    # rare quality dips (bubbles): a contiguous low window in ~2% of reads
    ndip = max(1, n // 50)
    rows = rng.integers(0, n, ndip)
    for r in rows:
        s = int(rng.integers(0, max(1, L - 12)))
        q[r, s : s + 12] -= rng.uniform(15, 25)
    q = np.clip(q, 2, 40)
    if legacy:
        return (q.astype(np.int64) + 33).astype(np.uint8)
    edges = np.array([9, 19, 24, 29, 34, 36, 38])  # 8 bins
    return _Q_BINS[np.digitize(q, edges)]


def read_lengths(rng: np.random.Generator, n: int, read_len: int,
                 len_model: str) -> np.ndarray:
    """Per-read lengths. "fixed": all read_len. "longtail": ~85% at
    read_len, the rest a lognormal tail up to 4x (adapter-trimmed +
    merged-fragment mixture, the length-varying class real trimmed
    FASTQs exhibit; VERDICT r3 missing #5)."""
    if len_model == "fixed":
        return np.full(n, read_len, np.int64)
    lens = np.full(n, read_len, np.int64)
    tail = rng.random(n) < 0.15
    nt = int(tail.sum())
    draw = np.exp(rng.normal(np.log(read_len * 0.7), 0.6, nt))
    lens[tail] = np.clip(draw.astype(np.int64), 36, 4 * read_len)
    return lens


def _header(style: str, i: int, tile: int, x: int, y: int, pair: int) -> bytes:
    """Instrument header shapes seen in real archives (the Zhang-2017
    breaker class is dominated by header variety, README.md:90-91):
    - rta3:  @SIM:1:FC705VJ:1:t:x:y p:N:0:ATCACG   (CASAVA 1.8 comment)
    - sra:   @SRR387476.i HWI-EAS209_0006_FC706VJ:5:t:x:y/p  (mixed
             separators: dot, space, underscores, colons, slash)
    - mixed: alternates between the two per read"""
    if style == "mixed":
        style = "sra" if i % 2 else "rta3"
    if style == "sra":
        return b"@SRR387476.%d HWI-EAS209_0006_FC706VJ:5:%d:%d:%d/%d" % (
            i + 1, tile, x, y, pair,
        )
    return b"@SIM:1:FC705VJ:1:%d:%d:%d %d:N:0:ATCACG" % (tile, x, y, pair)


def gen(path: str, n_reads: int, read_len: int, genome: int, seed: int,
        legacy: bool, paired: bool = True, len_model: str = "fixed",
        header_style: str = "rta3", n_rate: float = 0.0) -> None:
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGTN", dtype=np.uint8)
    g = make_genome(rng, genome)
    lmax = read_len if len_model == "fixed" else 4 * read_len
    lens = read_lengths(rng, n_reads, read_len, len_model)
    starts = rng.integers(0, genome - lmax, n_reads)
    quals = make_quals(rng, n_reads, lmax, legacy)
    # tile/x/y counters like a real flowcell: sorted-ish tiles, jittery x/y
    tiles = np.sort(rng.integers(1101, 1120, n_reads))
    xs = rng.integers(1000, 29000, n_reads)
    ys = rng.integers(1000, 29000, n_reads)
    qmin = int(quals.min())
    with open(path, "wb") as f:
        out = []
        for i in range(n_reads):
            ln = int(lens[i])
            r = g[starts[i] : starts[i] + ln].copy()
            # error rate follows the quality string (q -> p = 10^(-q/10))
            q = quals[i, :ln].astype(np.float64) - 33.0
            perr = np.power(10.0, -q / 10.0)
            mut = rng.random(ln) < perr
            nmut = int(mut.sum())
            if nmut:
                r[mut] = (r[mut] + rng.integers(1, 4, nmut)) & 3
            if i % 2:
                r = (3 - r)[::-1]
            if n_rate > 0.0:
                # basecaller no-calls: N at the lowest-quality positions
                # (exercises the IUPAC exception streams)
                qrow = quals[i, :ln] if i % 2 == 0 else quals[i, :ln][::-1]
                ncall = (qrow == qmin) & (rng.random(ln) < n_rate)
                r[ncall] = 4
            pair = 2 if (paired and i % 2) else 1
            hdr = _header(header_style, i, int(tiles[i]), int(xs[i]),
                          int(ys[i]), pair)
            out.append(b"%s\n%s\n+\n%s\n" % (hdr, bases[r].tobytes(),
                                             quals[i, :ln].tobytes()))
            if len(out) >= 4096:
                f.write(b"".join(out))
                out = []
        f.write(b"".join(out))


def gen_paired(prefix: str, n_pairs: int, read_len: int, genome: int,
               seed: int, legacy: bool, insert_mean: int = 320,
               insert_sd: int = 50) -> tuple[str, str]:
    """Paired-end R1/R2 files (the BankAlbum workload, [R] gatb-core
    bank/impl/BankAlbum): each fragment yields R1 = forward read at the
    fragment start and R2 = reverse-complement read at the fragment end,
    with identical flowcell coordinates and ' 1:'/' 2:' pair fields.
    Returns (r1_path, r2_path) — consume as the album spec 'r1,r2'."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    g = make_genome(rng, genome)
    inserts = np.clip(
        rng.normal(insert_mean, insert_sd, n_pairs).astype(np.int64),
        read_len, genome - 1,
    )
    starts = rng.integers(0, genome - inserts.max() - 1, n_pairs)
    q1 = make_quals(rng, n_pairs, read_len, legacy)
    q2 = make_quals(rng, n_pairs, read_len, legacy)
    tiles = np.sort(rng.integers(1101, 1120, n_pairs))
    xs = rng.integers(1000, 29000, n_pairs)
    ys = rng.integers(1000, 29000, n_pairs)
    r1_path, r2_path = prefix + "_R1.fastq", prefix + "_R2.fastq"

    def read_of(start, ln, qrow, rc):
        r = g[start : start + ln].copy()
        q = qrow.astype(np.float64) - 33.0
        mut = rng.random(ln) < np.power(10.0, -q / 10.0)
        nmut = int(mut.sum())
        if nmut:
            r[mut] = (r[mut] + rng.integers(1, 4, nmut)) & 3
        return (3 - r)[::-1] if rc else r

    with open(r1_path, "wb") as f1, open(r2_path, "wb") as f2:
        o1, o2 = [], []
        for i in range(n_pairs):
            coord = b"@SIM:1:FC705VJ:1:%d:%d:%d" % (tiles[i], xs[i], ys[i])
            ra = read_of(int(starts[i]), read_len, q1[i], rc=False)
            rb = read_of(int(starts[i] + inserts[i] - read_len), read_len,
                         q2[i], rc=True)
            o1.append(b"%s 1:N:0:ATCACG\n%s\n+\n%s\n"
                      % (coord, bases[ra].tobytes(), q1[i].tobytes()))
            o2.append(b"%s 2:N:0:ATCACG\n%s\n+\n%s\n"
                      % (coord, bases[rb].tobytes(), q2[i].tobytes()))
            if len(o1) >= 4096:
                f1.write(b"".join(o1))
                f2.write(b"".join(o2))
                o1, o2 = [], []
        f1.write(b"".join(o1))
        f2.write(b"".join(o2))
    return r1_path, r2_path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--reads", type=int, default=100_000)
    ap.add_argument("--len", dest="read_len", type=int, default=100)
    ap.add_argument("--genome", type=int, default=1_000_000)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--legacy-quals", action="store_true",
                    help="40-level Phred alphabet instead of 8 RTA3 bins")
    ap.add_argument("--header-style", choices=("rta3", "sra", "mixed"),
                    default="rta3")
    ap.add_argument("--len-model", choices=("fixed", "longtail"),
                    default="fixed")
    ap.add_argument("--n-rate", type=float, default=0.0,
                    help="no-call (N) probability at minimum-quality positions")
    a = ap.parse_args()
    gen(a.out, a.reads, a.read_len, a.genome, a.seed, a.legacy_quals,
        len_model=a.len_model, header_style=a.header_style, n_rate=a.n_rate)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
