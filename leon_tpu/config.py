"""Run configuration.

Mirrors the reference CLI contract (/root/reference/README.md:38-59):
mandatory -file plus -c/-d; optional -nb-cores, -kmer-size (default 31),
-abundance (default auto), -lossless, -seq-only, -noheader, -noqual.
Unlike the reference (compile-time KSIZE_LIST, CMakeLists.txt:42), k is a
runtime parameter here: any k <= 255 needs no recompilation (255 because
META stores k as u8; tested to k=95).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(eq=True)
class LeonConfig:
    # Reference-parity knobs
    kmer_size: int = 31
    abundance: Optional[int] = None  # None = automatic from count histogram
    lossless: bool = False           # qualities: lossy (default) vs lossless
    seq_only: bool = False           # = noheader + noqual, decompress to FASTA
    noheader: bool = False
    noqual: bool = False
    nb_cores: Optional[int] = None   # host-side worker threads (entropy/IO)

    # leon_tpu-specific knobs (all recorded in the container where they
    # affect decoding; see FORMAT.md)
    # None = auto from the measured coverage histogram (bloom.auto_params):
    # the stored filter dominates DNA-mode archives and the end-to-end
    # optimum tracks coverage — bits/kmer ~= mean solid-kmer coverage,
    # clipped to [4, 24], H in {2,3,4}. Set explicitly to pin.
    bloom_bits_per_kmer: Optional[float] = None
    bloom_hashes: Optional[int] = None
    seed: int = 0x1234ABCD
    # parallel-decode unit; also the granularity at which block-finish
    # host work overlaps the next block's device walks (and decode's
    # depth-2 block pipeline). Round-5: 65536 (one full-width TPU chunk
    # per block) — the tunnel charges per-launch overhead, so fewer,
    # larger chunks win end-to-end (probe_r5.py: the encode kernel itself
    # is 24% faster per read at 65536 lanes than 16384)
    reads_per_block: int = 65536
    # device batch lanes. None = auto per backend: 65536 on TPU (scan
    # per-step overhead amortizes, fewer launches over the tunnel), 8192
    # on CPU (shorter XLA-CPU scans measured faster; tests stay quick).
    # Archives are batch-invariant (tested), so auto-resolution never
    # changes output bytes.
    batch_reads: Optional[int] = None
    max_device_len: int = 2048       # longer reads take the raw host path
    # slab size for the streaming device counter (ops/count.py): the
    # multiset is sorted+compacted in fixed slabs of this many k-mers, so
    # peak HBM is one slab + the distinct set, independent of input size
    count_slab_kmers: int = 1 << 25
    # distinct-run merge trigger: merge accumulated runs when they exceed
    # (last merged size + merge_factor * slab) entries
    count_merge_factor: int = 4
    # device runs larger than this many rows spill to host RAM (the DSK
    # temp-disk analog): HBM stays bounded at ~spill + merge_factor*slab
    # rows of sort transient no matter how large the distinct set grows
    # (genome-scale inputs). Spilled and unspilled runs produce
    # byte-identical archives (tested). Round-5: 64M (was 48M). Larger
    # values were probed: the merge program itself runs at 224M rows, but
    # inside the pipeline (merged run + slab runs + sort transient all
    # live) a 128M threshold OOMed the 16 GB HBM at chr scale — the
    # worst-case merge input is (spill + 4 slabs + pending) rows with
    # inputs alive during the sort, ~12 B x 2.5 per row.
    count_spill_rows: int = 64 << 20
    # inputs larger than this stream through both passes (re-parsed per
    # pass, constant memory — the TPU analog of the reference's
    # disk-streaming design, README.md:13); smaller inputs are held in RAM
    stream_threshold_bytes: int = 1 << 30
    # single-process multi-chip: number of local devices to spread batch
    # lanes over (a 1-D jax.sharding.Mesh). None = all visible devices;
    # 1 = force single-device. Archives are byte-identical at any value.
    mesh_devices: Optional[int] = None
    # compacted-event D2H capacities (per read, averaged over a chunk);
    # chunks that overflow retry at 4x caps (and escalate the caps used
    # for every later dispatch), then the dense transfer. Measured event
    # rates on the 25x 1%-error bench corpus: ~3.6 err/read (error tails
    # near read ends emit one event per remaining step) and ~4.2 bif/read
    # (Bloom FPs on the 4 candidate probes) — r2's 4/2 PER-READ slots made
    # EVERY chunk pay a synchronous retry round-trip, 90% of the encode
    # stage. Today's caps are CHUNK-TOTAL budgets (cap = per_read x lanes,
    # WalkCaps escalates on overflow). err events run ~1/read on 1%-error
    # data, so 4/read keeps ~4x headroom while halving the errgap plane —
    # the LARGEST compact-buffer D2H plane (u16 x cap_err; the tunnel
    # charges ~40 ms latency + ~0.1 s/MB per drain). bif events run
    # ~2.2/read on the bench corpus (measured: 4/read overflowed and paid
    # escalation retries) and their plane is 2-bit packed — 16x smaller
    # per slot — so bif keeps the 8/read headroom.
    event_cap_per_read: int = 4
    bif_cap_per_read: int = 8
    # device-side pipelining depth: chunks dispatched ahead of the host
    # consuming their results (keeps the device busy across the D2H
    # latency of the TPU tunnel)
    max_inflight_chunks: int = 32
    # store the solid k-mer set as unitigs (ops/unitig.py) instead of the
    # raw Bloom bitset whenever the unitig payload is smaller — typically
    # 5-10x — and let the decoder rebuild the bit-identical filter. The
    # gate bounds the builder's HBM working set and applies to the SOLID
    # count (the build compacts the distinct run to its solid rows first;
    # error singletons never enter it, so chr-scale runs whose distinct
    # set is error-dominated still qualify). Working set ≈ 56 B per solid
    # k-mer at k<=31 (words+rc 16, succ/outc/nxt/prev 2x16, doubling
    # carries 24 with one gather transient) -> 128M solid ≈ 7 GB of the
    # 16 GB v5e HBM alongside the Bloom filter and the distinct run.
    # Past the gate the BLOOM section is written as before.
    unitig_sections: bool = True
    unitig_max_kmers: int = 128 << 20
    # largest solid set the DEVICE builder takes. Round-5 default 0 = the
    # native HOST builder always runs instead, on a background thread
    # overlapped with the encode stage: the device build is serial device
    # work the walk chunks queue behind (measured ~2.8 s at 2M solid
    # rows — a third of the 500k-bench device budget), while the host
    # thread hides entirely and the solid rows ship via async D2H.
    # Raising this re-enables the device builder (byte-identical
    # payloads, tested); the remote XLA compile service crashes past ~8M
    # rows (HTTP 500 cliff measured round 4), so keep it <= 8M.
    unitig_device_max_kmers: int = 0
    # when set, wrap compress/decompress in a jax.profiler trace written
    # here (the TPU-native analog of GATB TimeInfo/Progress tracing,
    # SURVEY.md §5.1)
    profile_dir: Optional[str] = None
    # when set, the count-phase result (abundance cutoff + Bloom bitset)
    # persists here and a matching re-run skips pass 1 entirely — the
    # natural restart midpoint (SURVEY.md §5.4: DSK's solid-kmer set)
    checkpoint: Optional[str] = None
    verbose: int = 1

    def resolved(self) -> "LeonConfig":
        """Concrete copy with backend-dependent fields filled in (the
        pipeline entry points call this once; jitted code never sees
        None)."""
        if self.batch_reads is not None:
            return self
        import jax

        b = 65536 if jax.default_backend() == "tpu" else 8192
        return dataclasses.replace(self, batch_reads=b)

    def __post_init__(self) -> None:
        # the reference supports k up to 256 but only via recompilation with
        # KSIZE_LIST (/root/reference/README.md:69-81); here any k <= 255 is
        # a runtime parameter (255 because META stores k as u8)
        if not (1 <= self.kmer_size <= 255):
            raise ValueError(f"kmer-size must be in [1, 255], got {self.kmer_size}")
        if self.abundance is not None and self.abundance < 1:
            raise ValueError("abundance must be >= 1")
        if self.bloom_hashes is not None and not (1 <= self.bloom_hashes <= 8):
            raise ValueError("bloom hashes must be in [1, 8]")
        if self.seq_only:
            self.noheader = True
            self.noqual = True
