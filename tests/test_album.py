"""Composite ("album") bank tests — multi-file input specs.

[R] GATB BankAlbum (gatb-core bank/impl/BankAlbum.cpp): a bank spec can
name several files that iterate as one concatenated bank. The round-trip
oracle for an album is byte-equality against the concatenation of the
member files.
"""

import numpy as np
import pytest

from leon_tpu import pipeline
from leon_tpu.config import LeonConfig
from leon_tpu.io import bank

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def small_cfg(**kw):
    kw.setdefault("batch_reads", 64)
    kw.setdefault("reads_per_block", 100)
    return LeonConfig(**kw)


def _sim_reads(rng, n, contig):
    out = []
    for _ in range(n):
        ln = int(rng.integers(60, 101))
        st = int(rng.integers(0, len(contig) - ln))
        r = contig[st : st + ln].copy()
        mut = rng.random(ln) < 0.01
        r[mut] = (r[mut] + rng.integers(1, 4, int(mut.sum()))) & 3
        out.append(BASES[r].tobytes())
    return out


def _write_fasta(path, seqs, tag):
    with open(path, "wb") as f:
        for i, s in enumerate(seqs):
            f.write(b">%s_read%d\n%s\n" % (tag, i, s))


def _write_fastq(path, seqs, rng, tag):
    with open(path, "wb") as f:
        for i, s in enumerate(seqs):
            q = rng.integers(33, 74, len(s)).astype(np.uint8).tobytes()
            f.write(b"@%s.%d\n%s\n+\n%s\n" % (tag, i, s, q))


@pytest.fixture
def members(tmp_path, rng):
    contig = rng.integers(0, 4, 3000, dtype=np.uint8)
    paths = []
    for j, n in enumerate((120, 80, 50)):
        p = tmp_path / f"part{j}.fasta"
        _write_fasta(str(p), _sim_reads(rng, n, contig), b"p%d" % j)
        paths.append(str(p))
    return paths


def test_album_paths_forms(tmp_path, members):
    spec = ",".join(members)
    assert bank.album_paths(spec) == members
    assert bank.album_paths(members[0]) == [members[0]]
    album = tmp_path / "inputs.list"
    album.write_text(
        "# comment\npart0.fasta\npart1.fasta\n\npart2.fasta\n"
    )
    assert bank.album_paths(str(album)) == members
    assert bank.total_size(spec) == sum(
        len(open(p, "rb").read()) for p in members
    )


def test_album_concat_equals_single(members):
    spec = ",".join(members)
    one = [s for b in bank.read_blocks(members[0], 64) for s in b.seqs]
    allb = [s for b in bank.read_blocks(spec, 64) for s in b.seqs]
    assert allb[: len(one)] == one
    assert len(allb) == 250
    # array parser agrees with the tolerant parser on the album
    assert bank.validate_arrays(spec)
    arr = []
    for b in bank.read_blocks_arrays(spec, 64):
        cat = b.seq_cat.tobytes()
        off = 0
        for ln in b.seq_lens.tolist():
            arr.append(cat[off : off + ln])
            off += ln
    assert arr == allb


def test_album_roundtrip_fasta(tmp_path, members):
    spec = ",".join(members)
    st = pipeline.compress(spec, str(tmp_path / "a.leon"), cfg=small_cfg())
    dd = pipeline.decompress(st["output"], cfg=small_cfg())
    cat = b"".join(open(p, "rb").read() for p in members)
    assert open(dd["output"], "rb").read() == cat
    assert st["input_bytes"] == len(cat)


def test_album_roundtrip_fastq_listfile(tmp_path, rng):
    contig = rng.integers(0, 4, 2000, dtype=np.uint8)
    paths = []
    for j in range(2):
        p = tmp_path / f"q{j}.fastq"
        _write_fastq(str(p), _sim_reads(rng, 70, contig), rng, b"SRR%d" % j)
        paths.append(str(p))
    album = tmp_path / "inputs.album"
    album.write_text("".join(f"q{j}.fastq\n" for j in range(2)))
    cfg = small_cfg(lossless=True)
    st = pipeline.compress(str(album), str(tmp_path / "q.leon"), cfg=cfg)
    dd = pipeline.decompress(st["output"], cfg=cfg)
    cat = b"".join(open(p, "rb").read() for p in paths)
    assert open(dd["output"], "rb").read() == cat


def test_album_mixed_formats_rejected(tmp_path, rng, members):
    q = tmp_path / "m.fastq"
    contig = rng.integers(0, 4, 500, dtype=np.uint8)
    _write_fastq(str(q), _sim_reads(rng, 10, contig), rng, b"SRRm")
    with pytest.raises(ValueError, match="mixes FASTA and FASTQ"):
        bank.sniff_format(members[0] + "," + str(q))


def test_album_empty_list_rejected(tmp_path):
    album = tmp_path / "empty.list"
    album.write_text("# nothing here\n")
    with pytest.raises(ValueError, match="lists no inputs"):
        bank.album_paths(str(album))
