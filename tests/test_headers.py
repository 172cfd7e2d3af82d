"""Header field-delta codec tests (FORMAT.md §8; reference behavior:
[R] gatb-core tools/compression/HeaderCoder)."""

import numpy as np
import pytest

from leon_tpu.codecs import headers as H


def roundtrip(hs):
    payload = H.encode(hs)
    out = H.decode(payload, len(hs))
    assert out == hs
    return payload


def test_sra_style():
    hs = [b"SRR387476.%d HWI-EAS179:5:1:7:%d length=36" % (i, 800 + 3 * i) for i in range(1000)]
    payload = roundtrip(hs)
    raw = sum(len(h) for h in hs)
    assert len(payload) < raw * 0.05  # pure deltas


def test_illumina_style():
    hs = [
        b"M00123:45:000000000-A1B2C:1:%d:%d:%d 1:N:0:ACGTACGT" % (1101 + i // 100, 10_000 + 17 * i, 20_000 - 3 * i)
        for i in range(500)
    ]
    roundtrip(hs)


def test_structure_changes_and_edge():
    hs = [
        b"read1",
        b"read2",
        b"completely different !@#",
        b"read4 with more tokens 7",
        b"read5 with more tokens 8",
        b"",
        b"005 padded",
        b"006 padded",
        b"7 unpadded",     # width change after padded: literal fallback
        b"100",
        b"099",            # leading zero appears: literal fallback
        b"98765432109876543210 huge",  # > 18 digits
        b"98765432109876543211 huge",
    ]
    roundtrip(hs)


def test_mixed_random(rng):
    hs = []
    for i in range(300):
        if i % 37 == 0:
            hs.append(bytes(rng.integers(32, 127, rng.integers(0, 60)).astype(np.uint8)))
        else:
            hs.append(b"@inst:%d:%d xyz" % (i, rng.integers(0, 10**9)))
    roundtrip(hs)


def test_ragged_column_transpose():
    """Delta runs with DIFFERENT numeric-token counts in one payload:
    stresses the column-major layout's ragged transpose (frame D) — row
    counts are inherited from each run's literal header structure."""
    hs = []
    for i in range(40):  # structure A: 2 numeric fields
        hs.append(b"a:%d:%d" % (i, 1000 - i))
    for i in range(40):  # structure B: 5 numeric fields
        hs.append(b"x%d_%d_%d_%d.%d tail" % (i, 2 * i, i * i, 7, 99 - i))
    for i in range(40):  # structure C: zero numeric fields
        hs.append(b"constant-header")
    for i in range(40):  # back to A
        hs.append(b"a:%d:%d" % (i, i))
    roundtrip(hs)


def test_single_and_empty():
    roundtrip([b"only one"])
    assert H.decode(H.encode([]), 0) == []


def test_synth_names():
    assert H.synth(5, 3) == [b"read_5", b"read_6", b"read_7"]


def test_native_matches_python(rng):
    """The native header codec (leon_native.leon_hdr_encode/decode) must
    be byte-identical to the Python reference loop on adversarial
    structures: leading zeros, width changes, >18-digit numbers, token
    structure changes, equal strings, empty headers, binary bytes."""
    from leon_tpu import native
    from leon_tpu.codecs import headers as H

    if native.get_lib() is None:
        import pytest

        pytest.skip("no native toolchain")

    cases = [
        b"SIM:1:FC:1:1101:1000:2000 1:N:0:ACGT",
        b"SIM:1:FC:1:1101:1007:2100 2:N:0:ACGT",
        b"SIM:1:FC:1:1102:0999:2100 1:N:0:ACGT",   # leading zero
        b"SIM:1:FC:1:1102:09990:2100 1:N:0:ACGT",  # width change w/ zeros
        b"SIM:1:FC:1:1102:10000:2 1:N:0:ACGT",
        b"x" * 40,                                  # no numerics
        b"x" * 40,                                  # identical repeat
        b"12345678901234567890123:a",               # > 18 digits
        b"12345678901234567890124:a",
        b"",                                        # empty header
        b"7",
        b"8",
        b"0",                                       # bare zero
        b"00",                                      # zeros w/ padding
        b"01",
        b"1",                                       # width drop
        bytes(rng.integers(33, 127, 25, dtype=np.int64).astype(np.uint8)),
        b"a:1:b:2",
        b"a:2:b:3:c",                               # structure change
    ]
    # plus a bulk random section
    for i in range(500):
        t = int(rng.integers(1101, 1120))
        cases.append(b"I:9:FL:2:%d:%d:%d 1:N:0:AC" % (t, i * 7, i * i % 99991))

    enc_n = H._encode_native(cases)
    enc_p = H._encode_py(cases)
    assert enc_n is not None
    assert enc_n[0] == enc_p[0]                        # modes
    np.testing.assert_array_equal(enc_n[1], enc_p[1])  # lit lens
    assert enc_n[2] == enc_p[2]                        # lit blob
    np.testing.assert_array_equal(enc_n[3], enc_p[3])  # row counts
    np.testing.assert_array_equal(enc_n[4], enc_p[4])  # code values

    payload = H.encode(cases)
    assert H.decode(payload, len(cases)) == cases
