"""Container robustness: CRC integrity, truncation, version checks
(reference analog: HDF5 does this for GATB; FORMAT.md §1 for us)."""

import numpy as np
import pytest

from leon_tpu import pipeline
from leon_tpu.config import LeonConfig
from leon_tpu.io import container


@pytest.fixture
def archive(tmp_path, rng):
    BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    contig = rng.integers(0, 4, 500, dtype=np.uint8)
    src = tmp_path / "x.fasta"
    with open(src, "wb") as f:
        for i in range(80):
            st = int(rng.integers(0, 400))
            f.write(b">r%d\n%s\n" % (i, BASES[contig[st : st + 90]].tobytes()))
    cfg = LeonConfig(batch_reads=64, reads_per_block=100)
    st = pipeline.compress(str(src), cfg=cfg)
    return st["output"], cfg


def test_crc_mismatch_detected(archive, tmp_path):
    path, cfg = archive
    data = bytearray(open(path, "rb").read())
    # flip a byte well inside a block payload (past the header sections)
    data[len(data) // 2] ^= 0xFF
    bad = tmp_path / "bad.leon"
    bad.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="CRC"):
        container.read(str(bad))


def test_truncated_container(archive, tmp_path):
    path, cfg = archive
    data = open(path, "rb").read()
    bad = tmp_path / "trunc.leon"
    bad.write_bytes(data[: len(data) // 2])
    with pytest.raises(ValueError, match="truncated|CRC"):
        container.read(str(bad))


def test_bad_version(archive, tmp_path):
    path, cfg = archive
    data = bytearray(open(path, "rb").read())
    data[8] = 0xEE
    bad = tmp_path / "ver.leon"
    bad.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="version"):
        container.read(str(bad))


def test_meta_roundtrip():
    m = container.Meta(
        k=63, fmt=1, qual_mode=2, header_mode=1, n_hashes=5,
        final_newline=False, n_words=1 << 22, seed=0xDEADBEEF,
        n_reads=123456789012, abundance=7, seglen=2048, orig_ext=b"fastq",
    )
    assert container.Meta.unpack(m.pack()) == m
