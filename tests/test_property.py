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


@settings(max_examples=12, deadline=None,
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
