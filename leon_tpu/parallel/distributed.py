"""Multi-host distributed compression (`jax.distributed`).

The reference's only scaling axis is threads on one node (SURVEY.md §2.4);
the TPU-native design scales across hosts with process-level data
parallelism over container blocks:

1. every process parses the (shared-filesystem) input and takes blocks
   round-robin;
2. k-mer count partials are exchanged (process allgather) and merged
   EXACTLY, so the abundance cutoff and the Bloom filter are identical on
   every host;
3. each host walk-encodes its blocks, deferring anchor-dictionary index
   resolution; per-block first-use key lists are exchanged and every host
   replays them in global block order — the global dictionary, and
   therefore every block payload, is byte-identical to a single-process
   run (shard invariance, SURVEY.md §4.3);
4. block payloads gather to process 0, which writes the container.

Works unchanged with one process (all exchanges degenerate to identity).
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Optional

import numpy as np

from leon_tpu.codecs import blocks as blockcodec
from leon_tpu.codecs import frames
from leon_tpu.config import LeonConfig
from leon_tpu.io import bank, container
from leon_tpu.ops import bloom, count
from leon_tpu.ops import kmer as K


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Wrapper over jax.distributed.initialize (no-op if single process)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def _allgather_bytes(data: bytes) -> list[bytes]:
    """Gather one bytes blob from every process (identity when nproc==1)."""
    import jax

    nproc = jax.process_count()
    if nproc == 1:
        return [data]
    from jax.experimental import multihost_utils as mhu

    n = np.array([len(data)], dtype=np.int64)
    lens = np.asarray(mhu.process_allgather(n)).reshape(nproc)
    mx = max(1, int(lens.max()))
    buf = np.zeros(mx, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    gathered = np.asarray(mhu.process_allgather(buf)).reshape(nproc, mx)
    return [gathered[p, : int(lens[p])].tobytes() for p in range(nproc)]


def compress_distributed(input_path: str, output_path: Optional[str] = None,
                         cfg: Optional[LeonConfig] = None) -> dict:
    import jax
    import jax.numpy as jnp

    from leon_tpu import pipeline
    from leon_tpu.ops import walk

    cfg = cfg or LeonConfig()
    t0 = time.time()
    pid, nproc = jax.process_index(), jax.process_count()
    if output_path is None:
        base = input_path[:-3] if input_path.endswith(".gz") else input_path
        output_path = base + ".leon"

    k = cfg.kmer_size
    W = K.words_for_k(k)
    parse = bank.parse_all(input_path, cfg.reads_per_block)
    fmt = parse.fmt
    my_block_idx = [i for i in range(len(parse.blocks)) if i % nproc == pid]

    header_mode = 0 if cfg.noheader else 1
    if fmt == bank.FASTA or cfg.noqual:
        qual_mode = container.QUAL_NONE
    else:
        qual_mode = container.QUAL_LOSSLESS if cfg.lossless else container.QUAL_LOSSY
    out_fmt = bank.FASTA if (fmt == bank.FASTQ and cfg.seq_only) else fmt

    # --- pass 1: count my shard, exchange partials, merge exactly ---
    H, seed = cfg.bloom_hashes, cfg.seed
    partials = []
    preps: dict[int, blockcodec.BlockPrep] = {}
    for bi in my_block_idx:
        block = parse.blocks[bi]
        prep = blockcodec.prepare_block(block, cfg.max_device_len)
        for ch in pipeline.chunk_block(prep, cfg, k):
            if ch.L < k + 1 or not (ch.dev_len >= k).any():
                continue
            canon, _, valid = K.kmer_scan(ch.codes, ch.dev_len, k)
            partials.append(count.count_batch(np.asarray(canon), np.asarray(valid)))
    uniq, counts = count.merge_counts(partials)
    merged = count.merge_counts(
        [pickle.loads(b) for b in _allgather_bytes(pickle.dumps((uniq, counts)))]
    )
    uniq, counts = merged
    if cfg.abundance is not None:
        cutoff = cfg.abundance
    else:
        cutoff = count.auto_cutoff(count.histogram(counts)) if counts.size else 2
    solid = uniq[counts >= cutoff] if counts.size else np.zeros((0, W), np.uint32)
    n_solid = int(solid.shape[0])
    log2_m = bloom.choose_log2_m(max(1, n_solid), cfg.bloom_bits_per_kmer)
    bitset = bloom.build_np(solid, log2_m, H, seed, k)
    bitset_j = jnp.asarray(bitset)

    meta = container.Meta(
        k=k, fmt=out_fmt, qual_mode=qual_mode, header_mode=header_mode,
        n_hashes=H, final_newline=parse.final_newline, log2_mbits=log2_m,
        seed=seed, n_reads=parse.n_reads, abundance=cutoff,
        seglen=cfg.max_device_len,
        orig_ext=b"fasta" if out_fmt == bank.FASTA else b"fastq",
    )

    # --- pass 2: encode my blocks with deferred dictionary resolution ---
    encoders: dict[int, blockcodec.BlockEncoder] = {}
    for bi in my_block_idx:
        block = parse.blocks[bi]
        if fmt == bank.FASTQ and cfg.seq_only:
            block = bank.SeqBlock(
                bank.FASTA, block.headers, block.seqs,
                line_lens=[[len(s)] if len(s) else [] for s in block.seqs],
            )
        prep = blockcodec.prepare_block(block, cfg.max_device_len)
        be = blockcodec.BlockEncoder(cfg, meta, None, block, prep)
        for ch in pipeline.chunk_block(prep, cfg, k):
            enc = None
            if ch.L >= k + 1 and (ch.dev_len >= k).any():
                B = ch.codes.shape[0]
                cap_err = ((cfg.event_cap_per_read * B) + 7) // 8 * 8
                cap_bif = ((cfg.bif_cap_per_read * B) + 7) // 8 * 8
                buf = walk.encode_batch_compact(
                    ch.codes, ch.dev_len, bitset_j, k, H, log2_m, seed,
                    cap_err, cap_bif,
                )
                enc = walk.unpack_compact(np.asarray(buf), ch.n, B, ch.L, cap_err, cap_bif,
                                          with_conf=True, k=k)
                if enc is None:
                    enc_j = walk.encode_batch(ch.codes, ch.dev_len, bitset_j, k, H, log2_m, seed)
                    enc = {kk: np.asarray(v)[: ch.n] for kk, v in enc_j.items()}
            be.add_subbatch(
                blockcodec.SubbatchData(
                    codes=ch.codes, seg_len=ch.seg_len, seg_read=ch.seg_read,
                    seg_off=ch.seg_off, n=ch.n, enc=enc,
                )
            )
        encoders[bi] = be

    # --- dictionary replay: per-block distinct first-use key lists ---
    def distinct_in_order(chunks: list[np.ndarray]) -> list[bytes]:
        if not chunks:
            return []
        raw = np.ascontiguousarray(np.concatenate(chunks).astype("<u4"))
        flat = raw.view([("", "<u4")] * raw.shape[1]).reshape(-1)
        _, first = np.unique(flat, return_index=True)
        sz = raw.shape[1] * 4
        rb = raw.tobytes()
        return [rb[i * sz : (i + 1) * sz] for i in np.sort(first)]

    my_lists = {bi: distinct_in_order(be.anchor_key_chunks) for bi, be in encoders.items()}
    all_lists: dict[int, list[bytes]] = {}
    for blob in _allgather_bytes(pickle.dumps(my_lists)):
        all_lists.update(pickle.loads(blob))
    adict = blockcodec.AnchorDict(W)
    # dict size before each block's first-use entries — finish() needs it
    # for stream 4's implicit-new coding (blocks.py), since the dict here
    # is prepopulated rather than grown block by block
    prefix_len: dict[int, int] = {}
    for bi in range(len(parse.blocks)):
        prefix_len[bi] = len(adict)
        for key in all_lists.get(bi, ()):
            adict.index_key(key)

    # --- finish my blocks against the global dictionary, gather to p0 ---
    my_payloads = {}
    stream_sizes: dict[int, int] = {}
    n_anchored = 0
    for bi, be in encoders.items():
        be.adict = adict
        be.dict_prev_len = prefix_len[bi]
        payload, sizes = be.finish()
        my_payloads[bi] = (payload, be.block.n_reads)
        n_anchored += sum(c.shape[0] for c in be.anchor_key_chunks)
        for sid, sz in sizes.items():
            stream_sizes[sid] = stream_sizes.get(sid, 0) + sz

    gathered: dict[int, tuple[bytes, int]] = {}
    for blob in _allgather_bytes(pickle.dumps(my_payloads)):
        gathered.update(pickle.loads(blob))

    stats = {
        "input": input_path, "output": output_path,
        "n_reads": parse.n_reads, "n_anchored_local": n_anchored,
        "n_solid_kmers": n_solid, "abundance": cutoff,
        "process": pid, "n_processes": nproc,
        "time_total_s": round(time.time() - t0, 3),
    }
    if pid == 0:
        payloads = [gathered[i][0] for i in range(len(parse.blocks))]
        n_per_block = [gathered[i][1] for i in range(len(parse.blocks))]
        c = container.Container(
            meta=meta,
            dict_payload=adict.payload(),
            bloom_payload=frames.frame(bitset.astype("<u4").tobytes()),
            block_payloads=payloads,
            block_n_reads=n_per_block,
        )
        total = container.write(output_path, c)
        stats["output_bytes"] = total
        stats["input_bytes"] = os.path.getsize(input_path)
        stats["ratio"] = stats["input_bytes"] / total if total else 0.0
    return stats
