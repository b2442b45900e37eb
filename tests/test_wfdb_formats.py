"""WFDB reader semantic-parity tests: sentinels, extended formats,
multi-frame smoothing (closing the gap vs wfdb.rdrecord — the package the
reference delegates to at recordutil.py:137 — using hand-computed golden
vectors, since wfdb itself is not installable here)."""

import struct

import numpy as np
import pytest

from scgrhc import native
from scgrhc.io import wfdb as w


def _write_record(tmp_path, name, fmt_tokens, dat_bytes, sig_len, n_sig,
                  gain=100.0, baseline=0, init_values=None):
    """Minimal .hea + .dat pair.  fmt_tokens: list of per-signal format
    tokens (e.g. '16', '16x2')."""
    rec = tmp_path / name
    (tmp_path / f"{name}.dat").write_bytes(dat_bytes)
    lines = [f"{name} {n_sig} 500 {sig_len}"]
    for j in range(n_sig):
        iv = init_values[j] if init_values else 0
        lines.append(
            f"{name}.dat {fmt_tokens[j]} {gain:g}({baseline})/mV 16 "
            f"{baseline} {iv} 0 0 sig_{j}"
        )
    (tmp_path / f"{name}.hea").write_text("\n".join(lines) + "\n")
    return str(rec)


def test_fmt16_sentinel_maps_to_nan(tmp_path):
    vals = [100, -200, -32768, 300]
    dat = b"".join(struct.pack("<h", v) for v in vals)
    rec = w.rdrecord(_write_record(tmp_path, "s16", ["16"], dat, 4, 1))
    got = rec.p_signal[:, 0]
    assert np.isnan(got[2])
    np.testing.assert_allclose(got[[0, 1, 3]], [1.0, -2.0, 3.0])


def test_fmt61_big_endian(tmp_path):
    vals = [100, -200, 300, -32768]
    dat = b"".join(struct.pack(">h", v) for v in vals)
    rec = w.rdrecord(_write_record(tmp_path, "s61", ["61"], dat, 4, 1))
    got = rec.p_signal[:, 0]
    np.testing.assert_allclose(got[:3], [1.0, -2.0, 3.0])
    assert np.isnan(got[3])


def test_fmt24_three_byte(tmp_path):
    vals = [100000, -100000, -8388608, 1]
    dat = b"".join(struct.pack("<i", v)[:3] for v in vals)
    rec = w.rdrecord(_write_record(tmp_path, "s24", ["24"], dat, 4, 1))
    got = rec.p_signal[:, 0]
    np.testing.assert_allclose(got[[0, 1, 3]], [1000.0, -1000.0, 0.01])
    assert np.isnan(got[2])


def test_fmt160_offset_binary(tmp_path):
    # stored = value + 32768 (unsigned 16); 0 stored == -32768 == sentinel
    vals = [100, -200, 0]
    dat = b"".join(struct.pack("<H", v + 32768) for v in vals) + struct.pack(
        "<H", 0
    )
    rec = w.rdrecord(_write_record(tmp_path, "s160", ["160"], dat, 4, 1))
    got = rec.p_signal[:, 0]
    np.testing.assert_allclose(got[:3], [1.0, -2.0, 0.0])
    assert np.isnan(got[3])


def test_fmt8_first_differences(tmp_path):
    # samples = init_value + cumsum(diffs): 10 +5 -3 +0 +7 → 15,12,12,19
    diffs = [5, -3, 0, 7]
    dat = b"".join(struct.pack("b", d) for d in diffs)
    rec = w.rdrecord(
        _write_record(tmp_path, "s8", ["8"], dat, 4, 1, init_values=[10])
    )
    np.testing.assert_allclose(rec.p_signal[:, 0] * 100.0, [15, 12, 12, 19])


def test_fmt212_sentinel(tmp_path):
    # pack pair (-2048, 5): first=0x800, second=0x005
    first, second = 0x800, 0x005
    b0 = first & 0xFF
    b1 = ((first >> 8) & 0x0F) | (((second >> 8) & 0x0F) << 4)
    b2 = second & 0xFF
    rec = w.rdrecord(
        _write_record(tmp_path, "s212", ["212"], bytes([b0, b1, b2]), 2, 1)
    )
    got = rec.p_signal[:, 0]
    assert np.isnan(got[0])
    np.testing.assert_allclose(got[1], 0.05)


def test_multiframe_smoothing(tmp_path):
    """fmt 16x2 + 16x1 interleaved: signal 0 has 2 samples/frame (averaged,
    wfdb smooth_frames=True), signal 1 has 1.  A frame containing the
    sentinel smooths to NaN."""
    # frame layout per frame: s0a s0b s1
    frames = [
        (10, 20, 7),           # s0 → 15, s1 → 7
        (30, -32768, 8),       # s0 → NaN (sentinel in frame), s1 → 8
    ]
    dat = b"".join(
        struct.pack("<hhh", *f) for f in frames
    )
    rec = w.rdrecord(
        _write_record(tmp_path, "smf", ["16x2", "16"], dat, 2, 2)
    )
    s0, s1 = rec.p_signal[:, 0], rec.p_signal[:, 1]
    np.testing.assert_allclose(s0[0], 0.15)
    assert np.isnan(s0[1])
    np.testing.assert_allclose(s1 * 100.0, [7, 8])


def test_fmt310_packed_10bit(tmp_path):
    # hand-packed golden bytes (WFDB signal(5) fmt 310): samples
    # [100, -200, 300] then [-512 (sentinel), 1, 2] → LE 16-bit word pairs
    # w0=(s0<<1)|(lo5(s2)<<11), w1=(s1<<1)|(hi5(s2)<<11), 10-bit two's compl.
    dat = struct.pack("<4H", 24776, 20080, 5120, 2)
    rec = w.rdrecord(_write_record(tmp_path, "s310", ["310"], dat, 6, 1))
    got = rec.p_signal[:, 0]
    np.testing.assert_allclose(got[:3], [1.0, -2.0, 3.0])
    assert np.isnan(got[3])  # -512 sentinel
    np.testing.assert_allclose(got[4:], [0.01, 0.02])


def test_fmt311_packed_10bit(tmp_path):
    # fmt 311: one LE 32-bit word = s0 | s1<<10 | s2<<20, same samples
    dat = struct.pack("<2I", 315416676, 2098688)
    rec = w.rdrecord(_write_record(tmp_path, "s311", ["311"], dat, 6, 1))
    got = rec.p_signal[:, 0]
    np.testing.assert_allclose(got[:3], [1.0, -2.0, 3.0])
    assert np.isnan(got[3])
    np.testing.assert_allclose(got[4:], [0.01, 0.02])


def test_fmt310_311_roundtrip(tmp_path):
    # writer↔reader round trip with a non-multiple-of-3 sample count
    # (exercises the pack padding) on a 2-signal interleaved record
    rng = np.random.default_rng(0)
    x = rng.uniform(-5.0, 5.0, size=(31, 2))
    for fmt in ("310", "311"):
        rec_path = str(tmp_path / f"rt{fmt}")
        w.wrrecord(rec_path, 500.0, ["a", "b"], x, gain=100.0, fmt=fmt)
        rec = w.rdrecord(rec_path)
        assert rec.specs[0].fmt == fmt
        np.testing.assert_allclose(rec.p_signal, x, atol=0.5 / 100.0 + 1e-9)


ALL_FMTS = ["8", "16", "24", "32", "61", "80", "160", "212", "310", "311"]


@pytest.mark.parametrize("fmt", ALL_FMTS)
def test_all_format_roundtrip_fuzz(tmp_path, fmt):
    """Seeded write→read fuzz over EVERY supported format: random signal
    counts, odd lengths (exercising pack padding), random gains and
    baselines, amplitudes scaled into the format's ADC range.  The wfdb
    package is not installable offline (VERDICT r2 residual risk #2), so
    a self-inverse round trip at the quantization bound is the strongest
    available oracle — the reader side is separately pinned by the
    hand-packed golden-byte tests above."""
    rng = np.random.default_rng(abs(hash(fmt)) % 2**32)
    lo, hi = w._WRITE_RANGE[fmt]
    for trial in range(4):
        n_sig = int(rng.integers(1, 4))
        sig_len = int(rng.integers(1, 201))
        gain = float(rng.uniform(50.0, 2000.0))
        baseline = int(rng.integers(-50, 51))
        if fmt == "8":
            # int8 difference stream: build a bounded-slew ADC walk
            steps = rng.integers(-60, 61, size=(sig_len, n_sig))
            steps[0] = 0
            adc = np.cumsum(steps, axis=0) + baseline
            x = (adc - baseline) / gain
        else:
            amp = (min(hi, 10**7) - abs(baseline)) / gain
            x = rng.uniform(-amp, amp, size=(sig_len, n_sig))
        rec_path = str(tmp_path / f"fz{fmt}_{trial}")
        names = [f"s{j}" for j in range(n_sig)]
        w.wrrecord(
            rec_path, 500.0, names, x, gain=gain, baseline=baseline, fmt=fmt
        )
        rec = w.rdrecord(rec_path)
        assert rec.sig_name == names
        assert rec.p_signal.shape == (sig_len, n_sig)
        assert not np.isnan(rec.p_signal).any()
        np.testing.assert_allclose(
            rec.p_signal, x, atol=0.5 / gain + 1e-9, rtol=0
        )


@pytest.mark.parametrize("fmt", [f for f in ALL_FMTS if f != "8"])
def test_writer_clip_never_produces_sentinel(tmp_path, fmt):
    """A physical value that would quantize exactly to the format's NaN
    sentinel (or below) clips to the writable floor instead — clipped
    samples must stay finite on read."""
    sent = w.SENTINELS[fmt]
    gain = 10.0
    x = np.array([[sent / gain], [(sent - 5) / gain], [0.0]])
    rec_path = str(tmp_path / f"clip{fmt}")
    w.wrrecord(rec_path, 500.0, ["a"], x, gain=gain, fmt=fmt)
    got = w.rdrecord(rec_path).p_signal[:, 0]
    assert not np.isnan(got).any()
    np.testing.assert_allclose(got[:2], (sent + 1) / gain)
    np.testing.assert_allclose(got[2], 0.0)


def test_fmt8_slew_overflow_raises(tmp_path):
    x = np.array([[0.0], [300.0]])  # diff = 30000 ADC units at gain 100
    with pytest.raises(ValueError, match="slew"):
        w.wrrecord(str(tmp_path / "slew"), 500.0, ["a"], x, gain=100.0,
                   fmt="8")


def test_unsupported_format_clear_error(tmp_path):
    rec = _write_record(tmp_path, "s999", ["999"], b"\x00" * 12, 2, 1)
    with pytest.raises(ValueError, match="Unsupported WFDB format '999'"):
        w.rdrecord(rec)


@pytest.mark.skipif(native.decode_calibrate is None, reason="C ext not built")
def test_c_and_numpy_paths_agree_with_sentinels(tmp_path, monkeypatch):
    """Differential: the fused C decoder and the NumPy fallback produce
    identical p_signal (incl. NaN placement) for every shared format."""
    rng = np.random.default_rng(0)
    cases = {
        "16": lambda v: struct.pack("<h", v),
        "32": lambda v: struct.pack("<i", v),
    }
    sig_len, n_sig = 64, 3
    for fmt, pack in cases.items():
        lo, hi = (-32768, 32767) if fmt == "16" else (-(2**31), 2**31 - 1)
        vals = rng.integers(lo + 1, hi, size=(sig_len, n_sig))
        # sprinkle sentinels
        sent = {"16": -32768, "32": -(2**31)}[fmt]
        vals[5, 0] = sent
        vals[17, 2] = sent
        dat = b"".join(pack(int(v)) for v in vals.reshape(-1))
        rec_path = _write_record(
            tmp_path, f"d{fmt}", [fmt] * n_sig, dat, sig_len, n_sig
        )
        with_c = w.rdrecord(rec_path).p_signal
        monkeypatch.setattr(native, "decode_calibrate", None)
        without_c = w.rdrecord(rec_path).p_signal
        monkeypatch.undo()
        np.testing.assert_array_equal(np.isnan(with_c), np.isnan(without_c))
        np.testing.assert_allclose(with_c, without_c, equal_nan=True)


def test_nan_segments_are_dropped():
    """A window touching an invalid (NaN) sample never reaches the dataset
    (the reference would crash in sklearn's LinearRegression instead)."""
    from scgrhc.dsp.segment import segment_interval

    t = 750
    rng = np.random.default_rng(0)
    scg = rng.random((3 * t, 2))
    rhc = 20.0 + 5.0 * rng.random((3 * t, 1))  # clean, passes the gate
    rhc[t + 5, 0] = np.nan  # poison window 1
    segs = segment_interval(scg, rhc, t, -50.0, "rec")
    assert [s.start_idx for s in segs] == [0, 2 * t]

    scg2 = scg.copy()
    scg2[2 * t + 1, 1] = np.nan  # poison window 2 via SCG
    segs2 = segment_interval(scg2, rhc, t, -50.0, "rec")
    assert [s.start_idx for s in segs2] == [0]


def test_mixed_format_digital_falls_back(tmp_path):
    """One interleaved .dat holding two different per-signal formats is
    not decodable as a single stream.  The digital fast path must return
    None (serve then falls back to rdrecord, whose explicit error is the
    contract) instead of silently decoding the whole stream as the FIRST
    signal's format and serving garbage ADC samples."""
    dat = struct.pack("<4h", 100, 200, 300, 400)
    rec = _write_record(tmp_path, "smix", ["16", "80"], dat, 2, 2)
    assert w.rdrecord_digital(rec) is None
    with pytest.raises(ValueError, match="Mixed formats"):
        w.rdrecord(rec)
