"""WFDB reader/writer, sidecar interval, and catalog tests (reference
parity: recordutil.py:82-119)."""

import json
import os

import numpy as np
import pytest

from scgrhc.io.catalog import SAMPLE_FREQ, get_channels, get_record_names, read_record
from scgrhc.io.sidecar import chamber_intervals_from_sidecar, get_chamber_intervals
from scgrhc.io.wfdb import rdrecord, wrrecord


def test_wfdb_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    sig = rng.uniform(-5, 5, size=(1000, 3))
    path = str(tmp_path / "rec0")
    wrrecord(path, fs=500, sig_names=["a", "b", "c"], p_signal=sig, gain=1000.0)
    rec = rdrecord(path)
    assert rec.sig_name == ["a", "b", "c"]
    assert rec.fs == 500
    assert rec.p_signal.shape == (1000, 3)
    # Quantization through the int16 ADC model: error bounded by 1/(2*gain).
    assert np.max(np.abs(rec.p_signal - sig)) <= 0.5 / 1000.0 + 1e-12


def test_wfdb_format_212(tmp_path):
    """Hand-packed 12-bit pairs decode correctly, incl. negative values;
    -2048 is the WFDB invalid-sample sentinel and maps to NaN (like
    wfdb.rdrecord, which the reference delegates to at recordutil.py:137)."""
    def pack(a, b):
        a &= 0xFFF
        b &= 0xFFF
        return [a & 0xFF, ((a >> 8) & 0x0F) | (((b >> 8) & 0x0F) << 4), b & 0xFF]

    raw = bytes(pack(100, -5) + pack(2047, -2048))
    (tmp_path / "r212.dat").write_bytes(raw)
    (tmp_path / "r212.hea").write_text(
        "r212 2 500 2\nr212.dat 212 1(0)/mV 12 0 0 0 0 s0\nr212.dat 212 1(0)/mV 12 0 0 0 0 s1\n"
    )
    rec = rdrecord(str(tmp_path / "r212"))
    got = rec.p_signal.reshape(-1)
    np.testing.assert_array_equal(got[:3], [100.0, -5.0, 2047.0])
    assert np.isnan(got[3])


def test_multi_dat_record_and_header_comments(tmp_path):
    """Signals split across two .dat files (WFDB group semantics) with
    comment/blank lines in the header."""
    import numpy as np

    from scgrhc.io import wfdb as w

    rng = np.random.default_rng(0)
    a = rng.uniform(-5, 5, (400, 2))
    b = rng.uniform(-5, 5, (400, 1))
    # write two single-group records, then stitch a combined header
    w.wrrecord(str(tmp_path / "ga"), fs=500, sig_names=["s0", "s1"],
               p_signal=a, gain=200.0)
    w.wrrecord(str(tmp_path / "gb"), fs=500, sig_names=["s2"],
               p_signal=b, gain=200.0)
    ga_lines = open(tmp_path / "ga.hea").read().splitlines()
    gb_lines = open(tmp_path / "gb.hea").read().splitlines()
    combined = [
        "# a leading comment",
        "multi 3 500 400",
        "",
        *ga_lines[1:],
        "# interleaved comment",
        *gb_lines[1:],
    ]
    (tmp_path / "multi.hea").write_text("\n".join(combined) + "\n")

    rec = w.rdrecord(str(tmp_path / "multi"))
    assert rec.sig_name == ["s0", "s1", "s2"]
    np.testing.assert_allclose(rec.p_signal[:, :2], a, atol=1 / 200.0)
    np.testing.assert_allclose(rec.p_signal[:, 2:], b, atol=1 / 200.0)


def test_chamber_intervals_semantics():
    """Interval = (event, next event of ANY chamber), END appended from Mac
    times, label prefix match (reference: recordutil.py:93-110)."""
    sidecar = {
        "MacStTime": "x 08:00:00",
        "MacEndTime": "x 08:01:40",  # 100 s session
        "ChamEvents_in_s": {"PA_entry": 10.0, "RV_entry": 40.0, "PA_again": 60.0},
    }
    ivs = chamber_intervals_from_sidecar(sidecar, "PA", 500)
    assert ivs == [(5000, 20000), (30000, 50000)]
    assert chamber_intervals_from_sidecar(sidecar, "RV", 500) == [(20000, 30000)]
    # Non-dict ChamEvents → no intervals (reference: recordutil.py:103).
    assert chamber_intervals_from_sidecar(
        {**sidecar, "ChamEvents_in_s": "missing"}, "PA", 500
    ) == []


def test_catalog_on_synth_db(use_synth_db):
    names = get_record_names()
    assert names == ["SYN000", "SYN001"]
    rec = read_record("SYN000")
    assert rec.fs == SAMPLE_FREQ
    assert "RHC_pressure" in rec.sig_name
    ivs = get_chamber_intervals("SYN000", "PA")
    assert len(ivs) == 1 and ivs[0][0] == 0
    scg = get_channels(rec, ["patch_ACC_lat", "patch_ACC_dv"], 0, 1000)
    assert scg.shape == (1000, 2)
    # Channel slicing respects requested order.
    lat = get_channels(rec, ["patch_ACC_lat"], 0, 1000)
    np.testing.assert_array_equal(scg[:, 0], lat[:, 0])


def test_wfdb_roundtrip_fuzz(tmp_path):
    """Randomized round-trip: formats x gains x baselines x channel counts;
    native and NumPy decoders agree and recover to quantization error."""
    import numpy as np

    from scgrhc import native
    from scgrhc.io import wfdb as w

    rng = np.random.default_rng(7)
    for trial in range(12):
        fmt = ["16", "212"][trial % 2]
        n_sig = int(rng.integers(1, 5))
        n = int(rng.integers(10, 700))
        gain = float(rng.uniform(50, 1000))
        baseline = int(rng.integers(-100, 100))
        lim = (2047 - abs(baseline)) / gain if fmt == "212" else \
              (32000 - abs(baseline)) / gain
        sig = rng.uniform(-lim, lim, (n, n_sig))
        path = str(tmp_path / f"f{trial}")
        w.wrrecord(path, fs=500, sig_names=[f"s{i}" for i in range(n_sig)],
                   p_signal=sig, gain=gain, baseline=baseline, fmt=fmt)
        rec = w.rdrecord(path)
        # 0.5 ADC units of quantization + float round-off headroom
        np.testing.assert_allclose(rec.p_signal, sig, atol=0.51 / gain)
        if native.decode_calibrate is not None:
            dc = native.decode_calibrate
            try:
                native.decode_calibrate = None
                rec2 = w.rdrecord(path)
            finally:
                native.decode_calibrate = dc
            np.testing.assert_array_equal(rec.p_signal, rec2.p_signal)


def test_chamber_intervals_edge_cases():
    """Out-of-order events, labels without underscores, events past the
    Mac end time — semantics identical to recordutil.py:93-110."""
    sidecar = {
        "MacStTime": "x 08:00:00",
        "MacEndTime": "x 08:00:50",  # END at 50 s
        "ChamEvents_in_s": {
            "RV_entry": 30.0,   # insertion order != time order
            "PA": 10.0,         # bare label: prefix == whole label
            "PCW_late": 60.0,   # beyond END: sorts after it
        },
    }
    assert chamber_intervals_from_sidecar(sidecar, "PA", 500) == [(5000, 15000)]
    assert chamber_intervals_from_sidecar(sidecar, "RV", 500) == [(15000, 25000)]
    # PCW event sorts last; [:-1] drops it exactly like the reference
    assert chamber_intervals_from_sidecar(sidecar, "PCW", 500) == []
    # unknown chamber → nothing
    assert chamber_intervals_from_sidecar(sidecar, "RA", 500) == []
