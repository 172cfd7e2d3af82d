"""Property-based round-trip tests (SURVEY.md §5.2: the reference has no
sanitizers — correctness rides entirely on the round-trip diff, so we
generate adversarial inputs automatically)."""

import numpy as np
import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not available", allow_module_level=True)

from leon_tpu import pipeline
from leon_tpu.config import LeonConfig

SEQ_ALPHA = b"ACGT" * 6 + b"NRYKMacgtn\r "  # heavy ACGT bias + junk bytes


@st.composite
def fasta_file(draw):
    n = draw(st.integers(1, 25))
    recs = []
    for i in range(n):
        header = draw(st.binary(min_size=0, max_size=30).filter(lambda b: b"\n" not in b))
        ln = draw(st.integers(0, 120))
        seq = bytes(draw(st.sampled_from(SEQ_ALPHA)) for _ in range(ln))
        recs.append((header, seq))
    wrap = draw(st.sampled_from([0, 7, 60]))
    final_nl = draw(st.booleans())
    return recs, wrap, final_nl


def _write(path, recs, wrap, final_nl):
    with open(path, "wb") as f:
        for h, s in recs:
            f.write(b">" + h + b"\n")
            if wrap:
                for j in range(0, len(s), wrap):
                    f.write(s[j : j + wrap] + b"\n")
            else:
                f.write(s + b"\n")
    if not final_nl:
        with open(path, "rb+") as f:
            f.seek(0, 2)
            if f.tell():
                f.seek(-1, 2)
                if f.read(1) == b"\n":
                    f.truncate(f.tell() - 1)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(fasta_file())
def test_arbitrary_fasta_roundtrips(tmp_path_factory, data):
    recs, wrap, final_nl = data
    tmp = tmp_path_factory.mktemp("prop")
    src = tmp / "p.fasta"
    _write(src, recs, wrap, final_nl)
    # sequences may contain '\r'/' ' which the parser keeps as part of the
    # line; a bare ">" line with empty header is legal
    cfg = LeonConfig(kmer_size=15, batch_reads=32, reads_per_block=16)
    try:
        st_ = pipeline.compress(str(src), str(tmp / "p.leon"), cfg=cfg)
    except ValueError:
        return  # malformed inputs may be rejected, never mis-encoded
    d = pipeline.decompress(str(tmp / "p.leon"), str(tmp / "p.out"), cfg=cfg)
    assert open(d["output"], "rb").read() == open(src, "rb").read()


@st.composite
def fastq_file(draw):
    n = draw(st.integers(1, 15))
    recs = []
    for _ in range(n):
        header = draw(st.binary(min_size=0, max_size=25).filter(lambda b: b"\n" not in b))
        ln = draw(st.integers(0, 100))
        seq = bytes(draw(st.sampled_from(SEQ_ALPHA)) for _ in range(ln))
        qual = bytes(draw(st.integers(33, 126)) for _ in range(ln))
        plus = draw(st.binary(min_size=0, max_size=10).filter(lambda b: b"\n" not in b))
        recs.append((header, seq, plus, qual))
    wrap = draw(st.sampled_from([0, 0, 13]))  # wrapped records are rare
    final_nl = draw(st.booleans())
    lossless = draw(st.booleans())
    return recs, wrap, final_nl, lossless


def _write_fastq(path, recs, wrap, final_nl):
    with open(path, "wb") as f:
        for h, s, p, q in recs:
            f.write(b"@" + h + b"\n")
            for part in ((s[j : j + wrap] for j in range(0, len(s), wrap))
                         if wrap and len(s) > wrap else (s,)):
                f.write(part + b"\n")
            f.write(b"+" + p + b"\n")
            for part in ((q[j : j + wrap] for j in range(0, len(q), wrap))
                         if wrap and len(q) > wrap else (q,)):
                f.write(part + b"\n")
    if not final_nl:
        with open(path, "rb+") as f:
            f.seek(0, 2)
            if f.tell():
                f.seek(-1, 2)
                if f.read(1) == b"\n":
                    f.truncate(f.tell() - 1)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(fastq_file())
def test_arbitrary_fastq_roundtrips(tmp_path_factory, data):
    """FASTQ fuzz: junk bytes in sequences, '+'-line texts, full-ASCII
    qualities, wrapped records, both quality modes. Lossless must be
    byte-exact; lossy must keep headers/DNA/'+' byte-exact and quality
    LENGTHS equal (LOSSY-Q1 rewrites values only)."""
    recs, wrap, final_nl, lossless = data
    tmp = tmp_path_factory.mktemp("propq")
    src = tmp / "p.fastq"
    _write_fastq(src, recs, wrap, final_nl)
    cfg = LeonConfig(kmer_size=15, batch_reads=32, reads_per_block=16,
                     lossless=lossless, verbose=0)
    try:
        pipeline.compress(str(src), str(tmp / "p.leon"), cfg=cfg)
    except ValueError:
        return  # malformed inputs may be rejected, never mis-encoded
    d = pipeline.decompress(str(tmp / "p.leon"), str(tmp / "p.out"), cfg=cfg)
    a = open(src, "rb").read()
    b = open(d["output"], "rb").read()
    if lossless:
        assert a == b
    else:
        la, lb = a.split(b"\n"), b.split(b"\n")
        assert len(la) == len(lb)
        # per input line: non-quality lines byte-exact. With unwrapped
        # records lines cycle @hdr, seq, +, qual — compare structurally
        if not wrap:
            for i in range(0, len(la) - 3, 4):
                assert la[i] == lb[i] and la[i + 1] == lb[i + 1]
                assert la[i + 2] == lb[i + 2]
                assert len(la[i + 3]) == len(lb[i + 3])


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(fasta_file())
def test_arbitrary_fasta_k63_roundtrips(tmp_path_factory, data):
    """The multiword k-mer path (k=63 -> W=4 u32 words) under the same
    fuzz corpus (VERDICT r4 #7b: property tests never drove k>31)."""
    recs, wrap, final_nl = data
    tmp = tmp_path_factory.mktemp("prop63")
    src = tmp / "p.fasta"
    _write(src, recs, wrap, final_nl)
    cfg = LeonConfig(kmer_size=63, batch_reads=32, reads_per_block=16)
    try:
        pipeline.compress(str(src), str(tmp / "p.leon"), cfg=cfg)
    except ValueError:
        return
    d = pipeline.decompress(str(tmp / "p.leon"), str(tmp / "p.out"), cfg=cfg)
    assert open(d["output"], "rb").read() == open(src, "rb").read()


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(fastq_file(), fastq_file())
def test_album_roundtrips(tmp_path_factory, da, db):
    """Composite-bank (album) fuzz: two FASTQ members compressed as one
    archive must decompress to the byte concatenation (reference
    BankAlbum semantics)."""
    recs_a, wrap_a, nl_a, _ = da
    recs_b, wrap_b, _nl_b, _ = db
    tmp = tmp_path_factory.mktemp("propalb")
    a_, b_ = tmp / "a.fastq", tmp / "b.fastq"
    # every member except the last must end with a newline (concatenation
    # is only well-formed then); the bank enforces the same
    _write_fastq(a_, recs_a, wrap_a, True)
    _write_fastq(b_, recs_b, wrap_b, nl_a)
    cfg = LeonConfig(kmer_size=15, batch_reads=32, reads_per_block=16,
                     lossless=True, verbose=0)
    spec = f"{a_},{b_}"
    try:
        pipeline.compress(spec, str(tmp / "p.leon"), cfg=cfg)
    except ValueError:
        return
    d = pipeline.decompress(str(tmp / "p.leon"), str(tmp / "p.out"), cfg=cfg)
    want = open(a_, "rb").read() + open(b_, "rb").read()
    assert open(d["output"], "rb").read() == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(fastq_file())
def test_stream_mode_archive_invariance(tmp_path_factory, data):
    """Streaming mode (re-parse per pass, constant memory) must produce
    the BYTE-IDENTICAL archive to RAM mode on the same input — the
    archive must never depend on the ingestion strategy."""
    recs, wrap, final_nl, lossless = data
    tmp = tmp_path_factory.mktemp("propstream")
    src = tmp / "p.fastq"
    _write_fastq(src, recs, wrap, final_nl)
    base = dict(kmer_size=15, batch_reads=32, reads_per_block=16,
                lossless=lossless, verbose=0)
    try:
        pipeline.compress(str(src), str(tmp / "ram.leon"),
                          cfg=LeonConfig(**base))
    except ValueError:
        return
    pipeline.compress(str(src), str(tmp / "st.leon"),
                      cfg=LeonConfig(stream_threshold_bytes=0, **base))
    assert (open(tmp / "ram.leon", "rb").read()
            == open(tmp / "st.leon", "rb").read())
    d = pipeline.decompress(str(tmp / "st.leon"), str(tmp / "p.out"),
                            cfg=LeonConfig(**base))
    if lossless:
        assert open(d["output"], "rb").read() == open(src, "rb").read()
