"""The .leon single-file container (FORMAT.md, normative).

TPU-native replacement of the reference's HDF5 Storage layer ([R] gatb-core
tools/storage/impl/*; /root/reference/README.md:88 "compressed file in single
.leon file (HDF5 format)"). Same role — one file holding metadata, the Bloom
filter, the anchor dictionary and independently decodable blocks — but a flat
sectioned binary layout instead of HDF5 (the round-trip oracle diffs the
decompressed FASTA/FASTQ, never the container:
/root/reference/scripts/simple_test.sh:62).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field

from leon_tpu.utils import varint

MAGIC = b"LEONTPU1"
VERSION = 1

TAG_META = 1
TAG_DICT = 2
TAG_BLOOM = 3
TAG_BLOCK = 4
TAG_INDEX = 5

QUAL_NONE = 0
QUAL_LOSSLESS = 1
QUAL_LOSSY = 2


@dataclass
class Meta:
    k: int
    fmt: int               # 0 FASTA, 1 FASTQ (bank.FASTA/FASTQ)
    qual_mode: int         # QUAL_*
    header_mode: int       # 0 none, 1 kept
    n_hashes: int
    final_newline: bool
    log2_mbits: int
    seed: int
    n_reads: int
    abundance: int
    seglen: int = 0  # long reads split into seglen segments (FORMAT.md §2)
    orig_ext: bytes = b"fasta"

    def pack(self) -> bytes:
        out = bytearray()
        out += struct.pack(
            "<8B",
            self.k,
            self.fmt,
            self.qual_mode,
            self.header_mode,
            self.n_hashes,
            1 if self.final_newline else 0,
            self.log2_mbits,
            0,
        )
        out += struct.pack(
            "<IQII", self.seed & 0xFFFFFFFF, self.n_reads, self.abundance, self.seglen
        )
        varint.encode_one(len(self.orig_ext), out)
        out += self.orig_ext
        return bytes(out)

    @classmethod
    def unpack(cls, buf: bytes) -> "Meta":
        k, fmt, qual_mode, header_mode, n_hashes, flags, log2_mbits, _r = struct.unpack_from("<8B", buf, 0)
        seed, n_reads, abundance, seglen = struct.unpack_from("<IQII", buf, 8)
        n, pos = varint.decode_one(buf, 28)
        ext = buf[pos : pos + n]
        return cls(
            k=k, fmt=fmt, qual_mode=qual_mode, header_mode=header_mode,
            n_hashes=n_hashes, final_newline=bool(flags & 1),
            log2_mbits=log2_mbits, seed=seed, n_reads=n_reads,
            abundance=abundance, seglen=seglen, orig_ext=ext,
        )


@dataclass
class Container:
    meta: Meta
    dict_payload: bytes
    bloom_payload: bytes
    block_payloads: list[bytes] = field(default_factory=list)
    block_n_reads: list[int] = field(default_factory=list)


def _section(tag: int, payload: bytes) -> bytes:
    out = bytearray([tag])
    varint.encode_one(len(payload), out)
    out += payload
    out += struct.pack("<I", zlib.crc32(payload) & 0xFFFFFFFF)
    return bytes(out)


def write(path: str, c: Container) -> int:
    """Write the container; returns total bytes written."""
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(bytes([VERSION]))
        nsect = 3 + len(c.block_payloads) + 1
        head = bytearray()
        varint.encode_one(nsect, head)
        f.write(head)

        offsets: list[int] = []
        f.write(_section(TAG_META, c.meta.pack()))
        f.write(_section(TAG_DICT, c.dict_payload))
        f.write(_section(TAG_BLOOM, c.bloom_payload))
        for payload in c.block_payloads:
            offsets.append(f.tell())
            f.write(_section(TAG_BLOCK, payload))
        idx = bytearray()
        for n, off in zip(c.block_n_reads, offsets):
            varint.encode_one(n, idx)
            varint.encode_one(off, idx)
        f.write(_section(TAG_INDEX, bytes(idx)))
        return f.tell()


def read(path: str) -> Container:
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:8] != MAGIC:
        raise ValueError(f"{path}: not a LEONTPU container (bad magic)")
    if buf[8] != VERSION:
        raise ValueError(f"{path}: unsupported container version {buf[8]}")
    try:
        return _read_sections(path, buf)
    except (IndexError, struct.error) as e:
        raise ValueError(f"{path}: truncated or corrupt container ({e})") from e


def _read_sections(path: str, buf: bytes) -> Container:
    nsect, pos = varint.decode_one(buf, 9)

    meta = None
    dict_payload = b""
    bloom_payload = b""
    blocks: list[bytes] = []
    index = b""
    for _ in range(nsect):
        tag = buf[pos]
        plen, pos = varint.decode_one(buf, pos + 1)
        payload = buf[pos : pos + plen]
        pos += plen
        (crc,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        if zlib.crc32(payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"{path}: CRC mismatch in section tag {tag}")
        if tag == TAG_META:
            meta = Meta.unpack(payload)
        elif tag == TAG_DICT:
            dict_payload = payload
        elif tag == TAG_BLOOM:
            bloom_payload = payload
        elif tag == TAG_BLOCK:
            blocks.append(payload)
        elif tag == TAG_INDEX:
            index = payload
    if meta is None:
        raise ValueError(f"{path}: missing META section")
    n_reads_per_block: list[int] = []
    ipos = 0
    while ipos < len(index):
        n, ipos = varint.decode_one(index, ipos)
        _off, ipos = varint.decode_one(index, ipos)
        n_reads_per_block.append(n)
    return Container(meta, dict_payload, bloom_payload, blocks, n_reads_per_block)
