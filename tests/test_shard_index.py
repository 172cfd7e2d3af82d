"""Byte-range shard indexing (io/bank.py range scanners + span parser):
the cooperative block index used by distributed parse sharding must
reproduce the whole-file parse exactly from per-range scans."""

import numpy as np
import pytest

from leon_tpu.io import bank

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _fastq(path, rng, n=500, lmin=60, lmax=120):
    contig = rng.integers(0, 4, 2000, dtype=np.uint8)
    with open(path, "wb") as f:
        for i in range(n):
            ln = int(rng.integers(lmin, lmax))
            st = int(rng.integers(0, 2000 - ln))
            q = rng.integers(35, 74, ln).astype(np.uint8).tobytes()
            # '@' in quality lines must not confuse the line-counting index
            qb = bytearray(q)
            if i % 7 == 0 and ln > 2:
                qb[0] = ord("@")
                qb[1] = ord("+")
            f.write(b"@SRR%d.%d extra %d\n%s\n+\n%s\n"
                    % (i % 3, i, i * 13 % 97,
                       BASES[contig[st:st + ln]].tobytes(), bytes(qb)))


def _fasta(path, rng, n=300):
    contig = rng.integers(0, 4, 900, dtype=np.uint8)
    with open(path, "wb") as f:
        for i in range(n):
            ln = int(rng.integers(50, 200))
            st = int(rng.integers(0, 900 - min(ln, 899)))
            seq = BASES[contig[st:st + min(ln, 900 - st)]].tobytes()
            # multiline records exercise header-based indexing
            if i % 3 == 0 and len(seq) > 70:
                seq = seq[:70] + b"\n" + seq[70:]
            f.write(b">r%d meta%d\n%s\n" % (i, i, seq))


def _index_fastq(path, rpb, nranges):
    """Simulate the cooperative index build over nranges byte ranges."""
    import os

    S = os.path.getsize(path)
    bounds = [p * S // nranges for p in range(nranges + 1)]
    counts = [bank.count_newlines_range(path, bounds[p], bounds[p + 1])
              for p in range(nranges)]
    cum = np.concatenate([[0], np.cumsum(counts)])
    ends_nl = bank._byte_at(path, S - 1) == b"\n"
    total_lines = int(cum[-1]) + (0 if ends_nl else 1)
    assert total_lines % 4 == 0
    n_reads = total_lines // 4
    n_blocks = max(1, -(-n_reads // rpb))
    want = 4 * rpb * np.arange(1, n_blocks, dtype=np.int64)
    offsets = np.zeros(n_blocks + 1, np.int64)
    offsets[n_blocks] = S
    for p in range(nranges):
        ok, fl, fo = bank.fastq_scan_range(
            path, bounds[p], bounds[p + 1], int(cum[p]), want)
        assert ok
        offsets[fl // (4 * rpb)] = fo
    assert (np.diff(offsets) > 0).all()
    return offsets, n_reads


def _blocks_equal(a, b):
    assert a.n_reads == b.n_reads
    assert bytes(a.seq_cat) == bytes(b.seq_cat)
    assert bytes(a.hdr_cat) == bytes(b.hdr_cat)
    assert np.array_equal(a.seq_lens, b.seq_lens)


@pytest.mark.parametrize("nranges", [1, 2, 3, 5])
def test_fastq_span_parse_matches_whole_file(tmp_path, rng, nranges):
    path = str(tmp_path / "x.fastq")
    _fastq(path, rng)
    rpb = 64
    offsets, n_reads = _index_fastq(path, rpb, nranges)
    whole = list(bank.read_blocks_arrays(path, rpb))
    assert n_reads == sum(b.n_reads for b in whole)
    assert len(offsets) - 1 == len(whole)
    for bi, ref in enumerate(whole):
        got = list(bank.read_blocks_span(
            path, int(offsets[bi]), int(offsets[bi + 1] - offsets[bi]), rpb))
        assert len(got) == 1
        _blocks_equal(got[0], ref)


@pytest.mark.parametrize("nranges", [2, 4])
def test_fasta_span_parse_matches_whole_file(tmp_path, rng, nranges):
    import os

    path = str(tmp_path / "x.fasta")
    _fasta(path, rng)
    rpb = 50
    S = os.path.getsize(path)
    bounds = [p * S // nranges for p in range(nranges + 1)]
    counts = [bank.count_fasta_headers_range(path, bounds[p], bounds[p + 1])
              for p in range(nranges)]
    cum = np.concatenate([[0], np.cumsum(counts)])
    n_reads = int(cum[-1])
    n_blocks = max(1, -(-n_reads // rpb))
    want_h = rpb * np.arange(1, n_blocks, dtype=np.int64)
    offsets = np.zeros(n_blocks + 1, np.int64)
    offsets[n_blocks] = S
    for p in range(nranges):
        in_rng = (want_h >= cum[p]) & (want_h < cum[p + 1])
        fo = bank.fasta_header_positions_range(
            path, bounds[p], bounds[p + 1], want_h[in_rng] - int(cum[p]))
        offsets[want_h[in_rng] // rpb] = fo
    assert (np.diff(offsets) > 0).all()
    whole = list(bank.read_blocks_arrays(path, rpb))
    assert n_reads == sum(b.n_reads for b in whole)
    assert len(offsets) - 1 == len(whole)
    for bi, ref in enumerate(whole):
        got = list(bank.read_blocks_span(
            path, int(offsets[bi]), int(offsets[bi + 1] - offsets[bi]), rpb))
        assert len(got) == 1
        _blocks_equal(got[0], ref)


def test_fastq_scan_rejects_irregular(tmp_path):
    path = str(tmp_path / "bad.fastq")
    with open(path, "wb") as f:
        f.write(b"@r1\nACGT\n+\nIIII\n\n@r2\nACGT\n+\nIIII\n")  # blank line
    n = bank.count_newlines_range(path, 0, 37)
    ok, _, _ = bank.fastq_scan_range(path, 0, 37, 0, np.zeros(0, np.int64))
    assert not ok  # blank line shifts the phase; '@'/'+' checks fire
