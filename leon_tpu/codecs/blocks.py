"""Block stream assembly: device event tensors <-> container byte streams.

Host-side serialization glue between the batched walk kernels
(leon_tpu/ops/walk.py) and the container (FORMAT.md §6). The reference does
this per read inside DnaEncoder/DnaDecoder ([R] gatb-core
tools/compression/DnaCoder.cpp); here the streams are assembled with
vectorized numpy over whole device sub-batches — the per-read Python loop
only runs for rare cases (raw reads, exception reads, dictionary inserts).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from leon_tpu.codecs import frames
from leon_tpu.io import bank
from leon_tpu.ops import kmer as K
from leon_tpu.utils import varint

# FORMAT.md §6 stream ids
S_FLAGS = 1
S_READLEN = 2
S_ANCHORPOS = 3
S_DICTIDX = 4
S_NEVT = 5
S_ERRPOS = 6
S_ERRNT = 7
S_BIF = 8
S_RAWSEQ = 9
S_EXCN = 10
S_HEADERS = 11
S_QUALS = 12
S_PLUSLINE = 13
S_FASTALINES = 14
S_EXCGAP = 15
S_EXCBYTE = 16

F_ANCHORED = 1
F_ORIENT = 2
F_HASEXC = 4
F_HASPLUS = 8

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


class AnchorDict:
    """Global anchor dictionary, first-use order (FORMAT.md §5)."""

    def __init__(self, W: int):
        self.W = W
        self._map: dict[bytes, int] = {}
        self._words: list[bytes] = []

    def index(self, canon_words: np.ndarray) -> int:
        key = canon_words.astype("<u4").tobytes()
        idx = self._map.get(key)
        if idx is None:
            idx = len(self._words)
            self._map[key] = idx
            self._words.append(key)
        return idx

    def __len__(self) -> int:
        return len(self._words)

    def payload(self) -> bytes:
        out = bytearray()
        varint.encode_one(len(self._words), out)
        out += frames.frame(b"".join(self._words))
        return bytes(out)

    @classmethod
    def from_payload(cls, buf: bytes, W: int) -> "AnchorDict":
        n, pos = varint.decode_one(buf, 0)
        raw, _ = frames.unframe(buf, pos)
        d = cls(W)
        sz = W * 4
        if len(raw) != n * sz:
            raise ValueError(f"anchor dict size mismatch: {len(raw)} != {n}*{sz}")
        d._words = [raw[i * sz : (i + 1) * sz] for i in range(n)]
        return d

    def words_array(self) -> np.ndarray:
        """(n, W) uint32 array of all canonical anchor k-mers."""
        if not self._words:
            return np.zeros((0, self.W), dtype=np.uint32)
        return np.frombuffer(b"".join(self._words), dtype="<u4").reshape(-1, self.W)


def _masked_flatten(arr: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Row-major flatten of arr[i, :counts[i]] (arr: (B, M))."""
    mask = np.arange(arr.shape[1])[None, :] < counts[:, None]
    return arr[mask]


def _masked_unflatten(flat: np.ndarray, counts: np.ndarray, M: int, dtype) -> np.ndarray:
    out = np.zeros((counts.shape[0], M), dtype=dtype)
    mask = np.arange(M)[None, :] < counts[:, None]
    out[mask] = flat
    return out


@dataclass
class SubbatchData:
    """One device sub-batch worth of inputs + walk-encode outputs.

    All arrays trimmed to the true number of reads n (no pad lanes).
    `enc` is the (numpy-converted) output dict of walk.encode_batch; None
    when the sub-batch had no device-eligible reads (e.g. all reads < k).
    """

    codes: np.ndarray                 # (n, L) uint8, exceptions substituted
    lengths: np.ndarray               # (n,) int32
    enc: Optional[dict]               # walk.encode_batch outputs or None
    exc_pos: list[Optional[np.ndarray]]   # per read: positions or None
    exc_byte: list[Optional[np.ndarray]]  # per read: original bytes or None


class BlockEncoder:
    """Accumulates one container block's streams sub-batch by sub-batch."""

    def __init__(self, cfg, meta, adict: AnchorDict, block: bank.SeqBlock):
        self.cfg = cfg
        self.meta = meta
        self.adict = adict
        self.block = block
        self.n_done = 0
        self.prev_len = 0
        self.flags = bytearray()
        self.readlen: list[np.ndarray] = []
        self.anchorpos: list[np.ndarray] = []
        self.dictidx: list[int] = []
        self.nevt: list[np.ndarray] = []
        self.errpos: list[np.ndarray] = []
        self.errnt = bytearray()
        self.bif = bytearray()
        self.rawseq = bytearray()
        self.excn: list[int] = []
        self.excgap: list[np.ndarray] = []
        self.excbyte = bytearray()
        self.qual_parts: list[bytes] = []

    def add_subbatch(self, sb: SubbatchData) -> None:
        n = sb.lengths.shape[0]
        start = self.n_done
        enc = sb.enc
        acanon = None
        if enc is not None:
            anch = enc["anchored"][:n].astype(bool)
            apos = enc["apos"][:n].astype(np.int64)
            # anchor k-mer words re-derived host-side (not shipped over D2H)
            acanon, orient = K.kmer_words_batch_np(sb.codes[:n], apos, self.meta.k)
            orient = orient & anch
        else:
            anch = np.zeros(n, dtype=bool)
            orient = np.zeros(n, dtype=bool)
            apos = np.zeros(n, dtype=np.int64)

        hasexc = np.array([p is not None for p in sb.exc_pos], dtype=bool)
        if self.block.fmt == bank.FASTQ:
            hasplus = np.array(
                [len(p) > 0 for p in self.block.pluses[start : start + n]], dtype=bool
            )
        else:
            hasplus = np.zeros(n, dtype=bool)

        fl = (
            anch.astype(np.uint8) * F_ANCHORED
            | orient.astype(np.uint8) * F_ORIENT
            | hasexc.astype(np.uint8) * F_HASEXC
            | hasplus.astype(np.uint8) * F_HASPLUS
        )
        self.flags += fl.tobytes()

        lens = sb.lengths.astype(np.int64)
        prev = np.concatenate(([self.prev_len], lens[:-1]))
        self.readlen.append(varint.zigzag(lens - prev))
        self.prev_len = int(lens[-1]) if n else self.prev_len

        ai = np.flatnonzero(anch)
        if ai.size:
            self.anchorpos.append(apos[ai].astype(np.uint64))
            for i in ai:
                self.dictidx.append(self.adict.index(acanon[i]))
            nerr_r = enc["nerr_r"][:n].astype(np.int64)
            nbif_r = enc["nbif_r"][:n].astype(np.int64)
            nerr_l = enc["nerr_l"][:n].astype(np.int64)
            nbif_l = enc["nbif_l"][:n].astype(np.int64)
            self.nevt.append(
                np.stack([nerr_r, nbif_r, nerr_l, nbif_l], axis=1)[ai].reshape(-1).astype(np.uint64)
            )
            if enc.get("compact"):
                # device already emitted the exact container stream layout
                self.errpos.append(enc["errgap_flat"].astype(np.uint64))
                self.errnt += enc["errnt_flat"].tobytes()
                self.bif += enc["bif_flat"].tobytes()
            else:
                # dense fallback: mask-flatten the (B, ME) event planes
                gaps = np.concatenate([enc["gap_r"][:n], enc["gap_l"][:n]], axis=1)[ai]
                ME = enc["gap_r"].shape[1]
                emask = np.arange(ME)[None, :]
                emask2 = np.concatenate(
                    [emask < nerr_r[ai, None], emask < nerr_l[ai, None]], axis=1
                )
                self.errpos.append(gaps[emask2].astype(np.uint64))
                ents = np.concatenate([enc["errnt_r"][:n], enc["errnt_l"][:n]], axis=1)[ai]
                self.errnt += ents[emask2].astype(np.uint8).tobytes()
                bmask2 = np.concatenate(
                    [emask < nbif_r[ai, None], emask < nbif_l[ai, None]], axis=1
                )
                bifs = np.concatenate([enc["bif_r"][:n], enc["bif_l"][:n]], axis=1)[ai]
                self.bif += bifs[bmask2].astype(np.uint8).tobytes()

        for i in np.flatnonzero(~anch):
            # from the original bytes, not the (possibly truncated) device
            # lane — long reads bypass the device entirely
            codes_i, _ = K.encode_bases_np(self.block.seqs[start + i])
            self.rawseq += K.pack_2bit_np(codes_i)

        for i in np.flatnonzero(hasexc):
            pos = sb.exc_pos[i].astype(np.int64)
            self.excn.append(pos.size)
            g = np.empty_like(pos)
            g[0] = pos[0]
            g[1:] = pos[1:] - pos[:-1] - 1
            self.excgap.append(g.astype(np.uint64))
            self.excbyte += sb.exc_byte[i].tobytes()

        if self.meta.qual_mode:
            quals = self.block.quals[start : start + n]
            if self.meta.qual_mode == 2 and enc is not None:
                from leon_tpu.ops import walk as _walk

                Lc = sb.codes.shape[1]
                if "conf16" in enc:
                    conf = _walk.unpack_conf16_bits(enc["conf16"][:n], Lc)
                else:
                    conf = enc["confirmed"][:n].astype(bool)
                L = conf.shape[1]
                for i in range(n):
                    q = np.frombuffer(quals[i], dtype=np.uint8)
                    if anch[i] and q.size:
                        q = q.copy()
                        c = conf[i, : q.size] if q.size <= L else np.pad(conf[i], (0, q.size - L))
                        q[c & (q >= 0x40)] = 0x49
                    self.qual_parts.append(q.tobytes())
            else:
                self.qual_parts.extend(quals)

        self.n_done += n

    def finish(self) -> tuple[bytes, dict[int, int]]:
        block = self.block
        streams: list[tuple[int, bytes]] = []
        sizes: dict[int, int] = {}

        def add(sid: int, data: bytes) -> None:
            if data:
                fr = frames.frame(data)
                streams.append((sid, fr))
                sizes[sid] = len(fr)

        add(S_FLAGS, bytes(self.flags))
        add(S_READLEN, varint.encode_array(np.concatenate(self.readlen) if self.readlen else np.zeros(0, np.uint64)))
        if self.anchorpos:
            add(S_ANCHORPOS, varint.encode_array(np.concatenate(self.anchorpos)))
            add(S_DICTIDX, varint.encode_array(np.asarray(self.dictidx, dtype=np.uint64)))
            add(S_NEVT, varint.encode_array(np.concatenate(self.nevt)))
        if self.errpos:
            ep = np.concatenate(self.errpos)
            if ep.size:
                add(S_ERRPOS, varint.encode_array(ep))
        add(S_ERRNT, bytes(self.errnt))
        add(S_BIF, bytes(self.bif))
        add(S_RAWSEQ, bytes(self.rawseq))
        if self.excn:
            add(S_EXCN, varint.encode_array(np.asarray(self.excn, dtype=np.uint64)))
            add(S_EXCGAP, varint.encode_array(np.concatenate(self.excgap)))
            add(S_EXCBYTE, bytes(self.excbyte))
        if self.meta.header_mode:
            from leon_tpu.codecs import headers as hcodec

            add(S_HEADERS, hcodec.encode(block.headers))
        if self.meta.qual_mode:
            data = b"".join(self.qual_parts)
            if data:
                fr = frames.frame(data, try_o1=True)
                streams.append((S_QUALS, fr))
                sizes[S_QUALS] = len(fr)
        if block.fmt == bank.FASTQ:
            plus = bytearray()
            for p in block.pluses:
                if p:
                    varint.encode_one(len(p), plus)
                    plus += p
            add(S_PLUSLINE, bytes(plus))
        else:
            vals: list[int] = []
            for lens in block.line_lens:
                vals.append(len(lens))
                if len(lens) > 1:
                    vals.extend(lens[:-1])
            add(S_FASTALINES, varint.encode_array(np.asarray(vals, dtype=np.uint64)))

        out = bytearray()
        varint.encode_one(block.n_reads, out)
        varint.encode_one(len(streams), out)
        for sid, data in streams:
            out.append(sid)
            out += data
        return bytes(out), sizes


@dataclass
class DecodedBlock:
    """Parsed block streams, ready for device re-walk + reassembly."""

    n_reads: int
    lengths: np.ndarray           # (n,) int64
    anchored: np.ndarray          # (n,) bool
    orient: np.ndarray            # (n,) bool
    hasexc: np.ndarray
    hasplus: np.ndarray
    apos: np.ndarray              # (n,) int64 (anchored only meaningful)
    dictidx: np.ndarray           # per anchored read
    nerr_r: np.ndarray            # (n,) int64 (0 for unanchored)
    nbif_r: np.ndarray
    nerr_l: np.ndarray
    nbif_l: np.ndarray
    errpos_r: list                # per read arrays of absolute positions
    errpos_l: list
    errnt_r: list
    errnt_l: list
    bif_r: list
    bif_l: list
    rawseq: bytes                 # concatenated 2-bit payloads, in raw-read order
    exc_pos: list                 # per read: positions or None
    exc_byte: list
    headers_payload: Optional[bytes]
    quals_concat: Optional[bytes]
    pluses: list                  # per read bytes
    line_lens: Optional[list]     # FASTA


def parse_block(payload: bytes, meta) -> DecodedBlock:
    n_reads, pos = varint.decode_one(payload, 0)
    n_streams, pos = varint.decode_one(payload, pos)
    sdata: dict[int, bytes] = {}
    for _ in range(n_streams):
        sid = payload[pos]
        data, pos = frames.unframe(payload, pos + 1)
        sdata[sid] = data

    flags = np.frombuffer(sdata.get(S_FLAGS, b"\x00" * n_reads), dtype=np.uint8)
    anchored = (flags & F_ANCHORED) != 0
    orient = (flags & F_ORIENT) != 0
    hasexc = (flags & F_HASEXC) != 0
    hasplus = (flags & F_HASPLUS) != 0

    deltas = varint.unzigzag(varint.decode_array(sdata.get(S_READLEN, b""), n_reads))
    lengths = np.cumsum(deltas)  # prev chain starts at 0

    n_anch = int(anchored.sum())
    apos_a = varint.decode_array(sdata.get(S_ANCHORPOS, b""), n_anch).astype(np.int64)
    dictidx = varint.decode_array(sdata.get(S_DICTIDX, b""), n_anch).astype(np.int64)
    nevt = varint.decode_array(sdata.get(S_NEVT, b""), 4 * n_anch).astype(np.int64).reshape(-1, 4)

    apos = np.zeros(n_reads, dtype=np.int64)
    apos[anchored] = apos_a
    nerr_r = np.zeros(n_reads, dtype=np.int64)
    nbif_r = np.zeros(n_reads, dtype=np.int64)
    nerr_l = np.zeros(n_reads, dtype=np.int64)
    nbif_l = np.zeros(n_reads, dtype=np.int64)
    if n_anch:
        nerr_r[anchored] = nevt[:, 0]
        nbif_r[anchored] = nevt[:, 1]
        nerr_l[anchored] = nevt[:, 2]
        nbif_l[anchored] = nevt[:, 3]

    n_err = int((nerr_r + nerr_l).sum())
    n_bif = int((nbif_r + nbif_l).sum())
    errgaps = varint.decode_array(sdata.get(S_ERRPOS, b""), n_err).astype(np.int64)
    errnts = np.frombuffer(sdata.get(S_ERRNT, b""), dtype=np.uint8)
    bifs = np.frombuffer(sdata.get(S_BIF, b""), dtype=np.uint8)
    if errnts.size != n_err or bifs.size != n_bif:
        raise ValueError("event stream count mismatch")

    # split the flat event streams back per read (right then left, read order)
    errpos_r: list = [None] * n_reads
    errpos_l: list = [None] * n_reads
    errnt_r: list = [None] * n_reads
    errnt_l: list = [None] * n_reads
    bif_r: list = [None] * n_reads
    bif_l: list = [None] * n_reads
    k = meta.k
    ei = 0
    bi = 0
    for i in np.flatnonzero(anchored):
        nr, nl = int(nerr_r[i]), int(nerr_l[i])
        g = errgaps[ei : ei + nr]
        p = apos[i] + k + np.cumsum(g + 1) - 1
        errpos_r[i] = p
        errnt_r[i] = errnts[ei : ei + nr]
        ei += nr
        g = errgaps[ei : ei + nl]
        p = apos[i] - np.cumsum(g + 1)
        errpos_l[i] = p
        errnt_l[i] = errnts[ei : ei + nl]
        ei += nl
        nr, nl = int(nbif_r[i]), int(nbif_l[i])
        bif_r[i] = bifs[bi : bi + nr]
        bi += nr
        bif_l[i] = bifs[bi : bi + nl]
        bi += nl

    exc_pos: list = [None] * n_reads
    exc_byte: list = [None] * n_reads
    if hasexc.any():
        nexc = varint.decode_array(sdata[S_EXCN], int(hasexc.sum())).astype(np.int64)
        gaps = varint.decode_array(sdata[S_EXCGAP], int(nexc.sum())).astype(np.int64)
        bts = np.frombuffer(sdata[S_EXCBYTE], dtype=np.uint8)
        off = 0
        for j, i in enumerate(np.flatnonzero(hasexc)):
            m = int(nexc[j])
            g = gaps[off : off + m]
            exc_pos[i] = np.cumsum(g + 1) - 1
            exc_byte[i] = bts[off : off + m]
            off += m

    pluses: list = [b""] * n_reads
    if hasplus.any():
        buf = sdata[S_PLUSLINE]
        ppos = 0
        for i in np.flatnonzero(hasplus):
            ln, ppos = varint.decode_one(buf, ppos)
            pluses[i] = buf[ppos : ppos + ln]
            ppos += ln

    line_lens = None
    if meta.fmt == bank.FASTA:
        vals = varint.decode_array(sdata.get(S_FASTALINES, b"")).astype(np.int64)
        line_lens = []
        vp = 0
        for i in range(n_reads):
            nl = int(vals[vp]); vp += 1
            if nl == 0:
                line_lens.append([])
            elif nl == 1:
                line_lens.append([int(lengths[i])])
            else:
                lens = [int(x) for x in vals[vp : vp + nl - 1]]
                vp += nl - 1
                lens.append(int(lengths[i]) - sum(lens))
                line_lens.append(lens)

    return DecodedBlock(
        n_reads=n_reads, lengths=lengths, anchored=anchored, orient=orient,
        hasexc=hasexc, hasplus=hasplus, apos=apos, dictidx=dictidx,
        nerr_r=nerr_r, nbif_r=nbif_r, nerr_l=nerr_l, nbif_l=nbif_l,
        errpos_r=errpos_r, errpos_l=errpos_l, errnt_r=errnt_r, errnt_l=errnt_l,
        bif_r=bif_r, bif_l=bif_l,
        rawseq=sdata.get(S_RAWSEQ, b""),
        exc_pos=exc_pos, exc_byte=exc_byte,
        headers_payload=sdata.get(S_HEADERS),
        quals_concat=sdata.get(S_QUALS),
        pluses=pluses, line_lens=line_lens,
    )
