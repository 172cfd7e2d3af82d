"""Sequence banks: FASTA/FASTQ/gz parsing and byte-exact writing.

Re-design of the reference's IBank layer ([R] gatb-core bank/impl/BankFasta;
behavior contract: /root/reference/README.md:11 "FASTA and FASTQ format ...
plain text and gzipped files are supported"). The parser is block-structured:
it yields `SeqBlock`s of `reads_per_block` records, which are the container's
parallel-decode unit (FORMAT.md §6).

Byte-exactness notes (the round-trip oracle diffs the reconstructed file,
/root/reference/scripts/simple_test.sh:59-69):
- FASTA line structure (multi-line records) is preserved via per-read line
  lengths (FORMAT.md stream 14).
- FASTQ '+' separator text is preserved (stream 13).
- A missing final newline is recorded in META flags bit0.
- CRLF and other stray bytes inside sequence lines survive as sequence
  "exceptions" (FORMAT.md §3) and in header/qual bytes verbatim.
"""

from __future__ import annotations

import gzip
import sys
from dataclasses import dataclass, field
from typing import Iterator, Optional


def _warn_dropped(path: str, what: str) -> None:
    """The container cannot represent this input byte-exactly (blank filler
    lines); warn loudly since the round-trip oracle would show a diff."""
    print(
        f"[leon-tpu] warning: {path}: {what} will not survive the "
        "round-trip byte-exactly (blank line dropped)",
        file=sys.stderr,
    )

FASTA = 0
FASTQ = 1


@dataclass
class SeqBlock:
    """A block of parsed records (all lists have n_reads entries)."""

    fmt: int
    headers: list[bytes]                 # without leading '>'/'@'
    seqs: list[bytes]                    # raw sequence bytes (no newlines)
    quals: Optional[list[bytes]] = None  # FASTQ only
    pluses: Optional[list[bytes]] = None  # FASTQ: text after '+', None entry = empty
    line_lens: Optional[list[list[int]]] = None  # FASTA: seq line lengths per read

    @property
    def n_reads(self) -> int:
        return len(self.seqs)


@dataclass
class ParseResult:
    fmt: int
    final_newline: bool
    n_reads: int
    blocks: list[SeqBlock] = field(default_factory=list)


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def sniff_format(path: str) -> int:
    with _open(path) as f:
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: empty input")
            s = line.strip()
            if not s:
                continue
            if s[:1] == b">":
                return FASTA
            if s[:1] == b"@":
                return FASTQ
            raise ValueError(f"{path}: not FASTA/FASTQ (first byte {s[:1]!r})")


def read_blocks(path: str, reads_per_block: int) -> Iterator[SeqBlock]:
    """Stream the input as SeqBlocks. Final newline presence is NOT part of
    the blocks; use `final_newline(path)` or `parse_all`."""
    fmt = sniff_format(path)
    if fmt == FASTA:
        yield from _read_fasta(path, reads_per_block)
    else:
        yield from _read_fastq(path, reads_per_block)


def final_newline(path: str) -> bool:
    with _open(path) as f:
        last = b""
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                break
            last = chunk[-1:]
        return last == b"\n"


def _read_fasta(path: str, reads_per_block: int) -> Iterator[SeqBlock]:
    headers: list[bytes] = []
    seqs: list[bytes] = []
    line_lens: list[list[int]] = []
    cur_head: Optional[bytes] = None
    cur_parts: list[bytes] = []
    cur_lens: list[int] = []

    def flush_read():
        nonlocal cur_head, cur_parts, cur_lens
        if cur_head is None:
            return
        headers.append(cur_head)
        seqs.append(b"".join(cur_parts))
        line_lens.append(cur_lens)
        cur_head, cur_parts, cur_lens = None, [], []

    with _open(path) as f:
        for raw in f:
            line = raw[:-1] if raw.endswith(b"\n") else raw
            if line[:1] == b">":
                flush_read()
                cur_head = line[1:]
            else:
                if cur_head is None:
                    if not line:
                        _warn_dropped(path, "blank line before first '>'")
                        continue
                    raise ValueError(f"{path}: sequence data before first '>'")
                cur_parts.append(line)
                cur_lens.append(len(line))
            if len(headers) == reads_per_block:
                yield SeqBlock(FASTA, headers, seqs, line_lens=line_lens)
                headers, seqs, line_lens = [], [], []
    flush_read()
    if headers:
        yield SeqBlock(FASTA, headers, seqs, line_lens=line_lens)


def _read_fastq(path: str, reads_per_block: int) -> Iterator[SeqBlock]:
    headers: list[bytes] = []
    seqs: list[bytes] = []
    quals: list[bytes] = []
    pluses: list[bytes] = []

    with _open(path) as f:
        while True:
            h = f.readline()
            if not h:
                break
            if h == b"\n":
                _warn_dropped(path, "blank line between FASTQ records")
                continue
            if h[:1] != b"@":
                raise ValueError(f"{path}: bad FASTQ header line {h[:40]!r}")
            s = f.readline()
            p = f.readline()
            q = f.readline()
            if not q and not p:
                raise ValueError(f"{path}: truncated FASTQ record")
            if p[:1] != b"+":
                raise ValueError(f"{path}: bad FASTQ '+' line {p[:40]!r}")
            strip = lambda x: x[:-1] if x.endswith(b"\n") else x
            headers.append(strip(h)[1:])
            seqs.append(strip(s))
            pluses.append(strip(p)[1:])
            quals.append(strip(q))
            if len(seqs[-1]) != len(quals[-1]):
                raise ValueError(
                    f"{path}: seq/qual length mismatch in record {len(headers)}"
                )
            if len(headers) == reads_per_block:
                yield SeqBlock(FASTQ, headers, seqs, quals=quals, pluses=pluses)
                headers, seqs, quals, pluses = [], [], [], []
    if headers:
        yield SeqBlock(FASTQ, headers, seqs, quals=quals, pluses=pluses)


def parse_all(path: str, reads_per_block: int) -> ParseResult:
    blocks = list(read_blocks(path, reads_per_block))
    fmt = blocks[0].fmt if blocks else sniff_format(path)
    n = sum(b.n_reads for b in blocks)
    return ParseResult(fmt, final_newline(path), n, blocks)


# ---------------------------------------------------------------------------
# Writing (decompression output)
# ---------------------------------------------------------------------------


def write_records_arrays(
    out,
    fmt: int,
    hcat: bytes,
    hlens,
    seq_flat,
    lengths,
    qcat: Optional[bytes] = None,
    plus_lens=None,
    plus_cat: bytes = b"",
    fasta_nlines=None,
    fasta_linelens=None,
) -> None:
    """Fully vectorized record assembly (the decompress hot path): builds
    the block's output bytes with numpy ragged scatters — no per-read
    Python. seq_flat is the reads' ASCII bases concatenated in read order;
    qcat likewise (None = synthesize 'I' quality, the -noqual rule).

    FASTA line structure comes from (fasta_nlines, fasta_linelens); FASTQ
    '+' texts from (plus_lens, plus_cat). Every record ends with a newline
    (the caller trims the final one via finalize_file when META says so).
    """
    import numpy as np

    from leon_tpu.codecs.blocks import ragged_dst

    n = int(lengths.shape[0])
    if n == 0:
        return
    lengths = lengths.astype(np.int64)
    hlens = np.asarray(hlens, dtype=np.int64)
    hcat_a = np.frombuffer(hcat, dtype=np.uint8)
    seq_a = np.asarray(seq_flat, dtype=np.uint8)

    if fmt == FASTQ:
        pl = np.zeros(n, np.int64) if plus_lens is None else plus_lens.astype(np.int64)
        rec = hlens + 2 * lengths + pl + 6
        off = np.cumsum(rec) - rec
        buf = np.empty(int(rec.sum()), dtype=np.uint8)
        buf[off] = ord("@")
        buf[ragged_dst(off + 1, hlens)] = hcat_a
        p1 = off + 1 + hlens
        buf[p1] = 10
        buf[ragged_dst(p1 + 1, lengths)] = seq_a
        p2 = p1 + 1 + lengths
        buf[p2] = 10
        buf[p2 + 1] = ord("+")
        if pl.any():
            buf[ragged_dst(p2 + 2, pl)] = np.frombuffer(plus_cat, dtype=np.uint8)
        p3 = p2 + 2 + pl
        buf[p3] = 10
        qdst = ragged_dst(p3 + 1, lengths)
        if qcat is None:
            buf[qdst] = ord("I")
        else:
            buf[qdst] = np.frombuffer(qcat, dtype=np.uint8)
        p4 = p3 + 1 + lengths
        buf[p4] = 10
    else:
        nl = fasta_nlines.astype(np.int64)
        ll = fasta_linelens.astype(np.int64)
        rec = 1 + hlens + 1 + lengths + nl
        off = np.cumsum(rec) - rec
        buf = np.empty(int(rec.sum()), dtype=np.uint8)
        buf[off] = ord(">")
        buf[ragged_dst(off + 1, hlens)] = hcat_a
        p1 = off + 1 + hlens
        buf[p1] = 10
        # per-line output starts: read's seq area + preceding (len+1) runs
        if int(nl.sum()):
            line_read = np.repeat(np.arange(n), nl)
            steps = ll + 1
            cs = np.cumsum(steps)
            grp_start = np.cumsum(nl) - nl
            base = np.where(grp_start > 0, cs[np.maximum(grp_start - 1, 0)], 0)
            within_start = cs - np.repeat(base, nl) - steps
            line_start = (p1 + 1)[line_read] + within_start
            buf[ragged_dst(line_start, ll)] = seq_a
            buf[line_start + ll] = 10
    out.write(buf.tobytes())


def write_block(out, block: SeqBlock) -> None:
    """Append one block's records to a binary file object (joined with \\n;
    caller handles the final-newline flag by truncation at the end)."""
    lines: list[bytes] = []
    if block.fmt == FASTA:
        assert block.line_lens is not None
        for h, s, lens in zip(block.headers, block.seqs, block.line_lens):
            lines.append(b">" + h)
            if not lens:  # empty-sequence record
                continue
            off = 0
            for ll in lens:
                lines.append(s[off : off + ll])
                off += ll
    else:
        assert block.quals is not None and block.pluses is not None
        for h, s, p, q in zip(block.headers, block.seqs, block.pluses, block.quals):
            lines.append(b"@" + h)
            lines.append(s)
            lines.append(b"+" + p)
            lines.append(q)
    out.write(b"\n".join(lines) + b"\n")


def finalize_file(path: str, keep_final_newline: bool) -> None:
    """Strip the trailing newline when the original had none (META bit0)."""
    if keep_final_newline:
        return

    with open(path, "rb+") as f:
        f.seek(0, 2)
        size = f.tell()
        if size == 0:
            return
        f.seek(size - 1)
        if f.read(1) == b"\n":
            f.truncate(size - 1)
