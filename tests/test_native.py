"""Native WFDB decoder vs the NumPy reference path."""

import os

import numpy as np
import pytest

from scgrhc import native
from scgrhc.io import wfdb as w


@pytest.fixture(scope="module", autouse=True)
def built():
    if native.decode_calibrate is None and not native.build_inplace():
        pytest.skip("no C toolchain")


def _roundtrip(tmp_path, fmt, n_sig=3, n=1000, seed=0):
    rng = np.random.default_rng(seed)
    # amplitude stays inside each format's ADC range at gain 200:
    # 8-bit (80) clips at ±0.635, 12-bit (212) at ±10.24
    hi = {"80": 0.5, "212": 10}.get(fmt, 30)
    sig = rng.uniform(-hi, hi, size=(n, n_sig))
    path = str(tmp_path / f"rec{fmt}")
    w.wrrecord(path, fs=500, sig_names=[f"s{i}" for i in range(n_sig)],
               p_signal=sig, gain=200.0, fmt=fmt)
    return path, sig


@pytest.mark.parametrize("fmt", ["16", "24", "32", "61", "80", "160", "212"])
def test_native_matches_numpy_decoder(tmp_path, fmt, monkeypatch):
    """Every C-decoded format must match the NumPy reference path bit-for-
    bit (incl. the round-3 additions 24/61/160 — VERDICT r3 #7)."""
    path, sig = _roundtrip(tmp_path, fmt)
    rec_native = w.rdrecord(path)

    monkeypatch.setattr(native, "decode_calibrate", None)
    rec_numpy = w.rdrecord(path)

    np.testing.assert_array_equal(rec_native.p_signal, rec_numpy.p_signal)
    # and both recover the original signal to quantization precision
    tol = 1 / 200.0
    assert np.max(np.abs(rec_native.p_signal - sig)) <= tol


@pytest.mark.parametrize(
    "fmt,sentinel_bytes",
    [
        ("16", b"\x00\x80"),          # int16 LE -32768
        ("61", b"\x80\x00"),          # int16 BE -32768
        ("160", b"\x00\x00"),         # offset binary 0 -> -32768
        ("24", b"\x00\x00\x80"),      # 3-byte LE -8388608
        ("32", b"\x00\x00\x00\x80"),  # int32 LE -2147483648
    ],
)
def test_native_sentinel_maps_to_nan(tmp_path, fmt, sentinel_bytes, monkeypatch):
    path, _ = _roundtrip(tmp_path, fmt, n_sig=1, n=8)
    dat = path + ".dat"
    data = bytearray(open(dat, "rb").read())
    w_bytes = len(sentinel_bytes)
    data[2 * w_bytes : 3 * w_bytes] = sentinel_bytes  # corrupt sample t=2
    open(dat, "wb").write(bytes(data))

    rec_native = w.rdrecord(path)
    monkeypatch.setattr(native, "decode_calibrate", None)
    rec_numpy = w.rdrecord(path)
    assert np.isnan(rec_native.p_signal[2, 0])
    np.testing.assert_array_equal(rec_native.p_signal, rec_numpy.p_signal)


def test_native_rejects_short_file(tmp_path):
    path, _ = _roundtrip(tmp_path, "16")
    dat = path + ".dat"
    data = open(dat, "rb").read()
    with open(dat, "wb") as f:
        f.write(data[: len(data) // 2])
    with pytest.raises(ValueError):
        w.rdrecord(path)


def test_native_decode_calibrate_direct():
    # two int16 samples, 1 signal: baseline 5, gain 2
    raw = np.array([100, -20], dtype="<i2").tobytes()
    out = native.decode_calibrate(raw, 16, 1, 2, [5.0], [2.0])
    np.testing.assert_allclose(out[:, 0], [(100 - 5) / 2, (-20 - 5) / 2])
