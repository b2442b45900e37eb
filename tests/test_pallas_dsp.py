"""Fused Pallas gate+normalize kernel vs the host reference path
(scgrhc.ops.pallas.dsp vs scgrhc.dsp.segment/noise)."""

import numpy as np
import pytest

from scgrhc.data.store import NORM_EPS
from scgrhc.dsp.segment import gate_windows
from scgrhc.ops.pallas.dsp import gate_and_normalize, segment_record_on_device

T = 750


def _windows(n=13, c=3, seed=0):
    rng = np.random.default_rng(seed)
    # realistic pressures: sines + noise, well away from gate thresholds
    t = np.arange(T) / 500.0
    rhc = np.stack(
        [
            20 + 10 * np.sin(2 * np.pi * (1.0 + 0.2 * i) * t)
            + rng.standard_normal(T)
            for i in range(n)
        ]
    )
    scg = rng.standard_normal((n, c, T))
    if n > 7:
        # window 3: flat line (fails flat gate); window 5: ramp (straight
        # line); window 7: dips below min_RHC
        rhc[3] = 7.25
        rhc[5] = np.linspace(0, 30, T) + 0.01 * rng.standard_normal(T)
        rhc[7, 100] = -80.0
    return scg.astype(np.float32), rhc.astype(np.float32)


def test_gate_matches_host_reference():
    scg, rhc = _windows()
    keep, *_ = gate_and_normalize(scg, rhc, min_rhc=-50.0)
    want = gate_windows(rhc.astype(np.float64), min_rhc=-50.0)
    np.testing.assert_array_equal(np.asarray(keep), want)
    assert not want[3] and not want[5] and not want[7]
    assert want.sum() == 10


def test_normalization_matches_store_formula():
    scg, rhc = _windows(n=4)
    _, scg_n, rhc_n, mm_s, mm_r = gate_and_normalize(scg, rhc, min_rhc=-50.0)
    i = 2
    lo, hi = rhc[i].min(), rhc[i].max()
    np.testing.assert_allclose(
        np.asarray(rhc_n[i]), (rhc[i] - lo) / (hi - lo + NORM_EPS), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(mm_r[i]), [lo, hi], rtol=1e-6)
    # SCG min/max is joint over (C, T) (reference: recordutil.py:41-47)
    lo_s, hi_s = scg[i].min(), scg[i].max()
    np.testing.assert_allclose(np.asarray(mm_s[i]), [lo_s, hi_s], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(scg_n[i]), (scg[i] - lo_s) / (hi_s - lo_s + NORM_EPS), atol=1e-6
    )


def test_padding_to_block_multiple_is_dropped():
    scg, rhc = _windows(n=9)  # pads 9 → 16
    keep, scg_n, rhc_n, mm_s, mm_r = gate_and_normalize(scg, rhc, min_rhc=-50.0)
    assert keep.shape == (9,) and scg_n.shape == (9, 3, T) and mm_r.shape == (9, 2)


def test_data_backend_device_matches_host(use_synth_db, tmp_path):
    """get_segments with data_backend='device' (Pallas gate) emits the same
    segments as the host float64 path on the synthetic DB."""
    import json

    from scgrhc.core.params import Params
    from scgrhc.dsp.segment import get_segments

    cfg = {
        "dir_path": str(tmp_path), "in_channels": ["patch_ACC_lat"],
        "chamber": "PA", "segment_size": 1.5, "batch_size": 8,
        "train_path": "t.pickle", "valid_path": "v.pickle",
        "test_path": "s.pickle", "checkpoint_dir_path": "c",
        "comparison_dir_path": "co", "pred_top_dir_path": "p1",
        "pred_rand_dir_path": "p2", "alpha": 1e-4, "beta1": 0.5,
        "beta2": 0.999, "n_critic": 2, "lambda_gp": 10, "lambda_aux": 100,
        "total_epochs": 1, "min_RHC": -50, "use_global_min_max": False,
    }
    p = tmp_path / "params.json"
    p.write_text(json.dumps(cfg))
    host = get_segments(Params(str(p)))
    cfg["data_backend"] = "device"
    p.write_text(json.dumps(cfg))
    dev = get_segments(Params(str(p)))
    assert len(host) == len(dev) and len(host) > 0
    for a, b in zip(host, dev):
        assert (a.record_name, a.start_idx, a.stop_idx) == (
            b.record_name, b.start_idx, b.stop_idx)
        np.testing.assert_array_equal(a.rhc, b.rhc)
        np.testing.assert_array_equal(a.scg, b.scg)


def test_segment_record_on_device():
    rng = np.random.default_rng(1)
    L = T * 5 + 123  # tail truncated
    t = np.arange(L) / 500.0
    rhc = 20 + 10 * np.sin(2 * np.pi * t) + rng.standard_normal(L)
    scg = rng.standard_normal((L, 2))
    keep, scg_n, rhc_n, mm_s, mm_r, starts = segment_record_on_device(
        scg, rhc, T, min_rhc=-50.0
    )
    assert keep.shape == (5,)
    np.testing.assert_array_equal(starts, np.arange(5) * T)
    assert np.asarray(keep).all()

def test_normalize_windows_matches_jnp_frame_norm():
    """Norm-only streaming kernel == the jnp _frame_norm path exactly
    (same f32 min/max/divide), incl. a non-block-multiple window count."""
    import jax.numpy as jnp

    from scgrhc.ops.pallas.dsp import normalize_windows
    from scgrhc.parallel.stream import _frame_norm

    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 11 * T)).astype(np.float32)  # 11 windows
    want = np.asarray(_frame_norm(jnp.asarray(x), T, None))
    got = np.asarray(_frame_norm(jnp.asarray(x), T, None, "pallas"))
    assert got.shape == want.shape == (11, 3, T)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # direct entry point too
    w = x.reshape(3, 11, T).transpose(1, 0, 2)
    np.testing.assert_allclose(
        np.asarray(normalize_windows(jnp.asarray(w))), want, atol=1e-6
    )
