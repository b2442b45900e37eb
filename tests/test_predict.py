"""Whole-record prediction stage (scgrhc.pipeline.predict)."""

import json
import os

import numpy as np
import pytest

import jax

from scgrhc.core.params import Params
from scgrhc.train import checkpoint as ckpt_io
from scgrhc.train.wgan import TrainConfig, init_state


@pytest.fixture()
def exp_with_ckpt(use_synth_db, tmp_path):
    d = tmp_path / "exp"
    os.makedirs(d / "checkpoints")
    cfg = {
        "dir_path": str(d),
        "in_channels": ["patch_ACC_lat", "patch_ACC_hf"],
        "chamber": "PA", "segment_size": 1.5, "batch_size": 8,
        "train_path": "loader_train.pickle",
        "valid_path": "loader_valid.pickle",
        "test_path": "loader_test.pickle",
        "checkpoint_dir_path": "checkpoints",
        "comparison_dir_path": "comparisons",
        "pred_top_dir_path": "pred_top", "pred_rand_dir_path": "pred_rand",
        "alpha": 1e-4, "beta1": 0.5, "beta2": 0.999, "n_critic": 2,
        "lambda_gp": 10, "lambda_aux": 100, "total_epochs": 1,
        "min_RHC": -50, "use_global_min_max": False,
    }
    (d / "params.json").write_text(json.dumps(cfg))
    state = init_state(jax.random.key(0), 2, TrainConfig())
    ckpt_io.save(str(d / "checkpoints" / "003.checkpoint"), start_time=0.0,
                 epoch=3, g_losses=[], d_losses=[], state=state)
    return Params(str(d / "params.json"))


@pytest.mark.slow
def test_predict_full_record(exp_with_ckpt):
    from scgrhc.pipeline import predict

    out = predict.run(exp_with_ckpt, "SYN000", checkpoint="last")
    pred = np.load(out)
    # 120 s record → 80 full 1.5-s windows → 60000 samples
    assert pred.shape == (80 * 750,)
    assert np.isfinite(pred).all()
    meta = json.load(open(out.replace(".npy", ".json")))
    assert meta["checkpoint"] == "003.checkpoint"
    assert meta["sample_freq"] == 500


@pytest.mark.slow
def test_predict_overlap_and_denorm(exp_with_ckpt):
    from scgrhc.pipeline import predict

    out = predict.run(
        exp_with_ckpt, "SYN001", checkpoint="003.checkpoint",
        overlap_s=0.5, rhc_minmax=(-10.0, 40.0),
        out_dir=str(exp_with_ckpt.dir_path) + "/p2",
    )
    pred = np.load(out)
    assert np.isfinite(pred).all()
    meta = json.load(open(out.replace(".npy", ".json")))
    assert meta["overlap_samples"] == 250 and meta["denormalized"]


@pytest.mark.slow
def test_predict_continuous_mode(exp_with_ckpt):
    """Seam-free whole-record mode: full record length out, no window
    truncation (uses models.cp; CP-sharded when L divides the mesh)."""
    from scgrhc.pipeline import predict

    out = predict.run(
        exp_with_ckpt, "SYN000", checkpoint="last", continuous=True,
        out_dir=str(exp_with_ckpt.dir_path) + "/pc",
    )
    pred = np.load(out)
    assert pred.shape == (120 * 500,)  # full 120 s record, no truncation
    assert np.isfinite(pred).all()
    meta = json.load(open(out.replace(".npy", ".json")))
    assert meta["mode"] == "continuous"


@pytest.mark.slow
def test_predict_calibrated(exp_with_ckpt, use_synth_db):
    """--calibrate denormalizes with the train cohort's joint RHC range."""
    from scgrhc.data.loaders import SegmentLoader
    from scgrhc.data.store import SegmentStore
    from scgrhc.pipeline import predict

    # craft a train loader whose cohort range is [-7, 42]
    n = 4
    scg = np.zeros((n, 2, 750), np.float32)
    rhc = np.zeros((n, 1, 750), np.float32)
    mm = np.array([[-7.0, 10.0], [0.0, 42.0], [-3.0, 20.0], [1.0, 30.0]])
    store = SegmentStore(scg, rhc, ["r"] * n, np.arange(n), np.arange(n),
                         mm.copy(), mm.copy(), 750)
    SegmentLoader(store, 2).save(exp_with_ckpt.train_path)

    assert predict.cohort_rhc_minmax(exp_with_ckpt) == (-7.0, 42.0)
    out = predict.run(exp_with_ckpt, "SYN000", checkpoint="last",
                      calibrate=True,
                      out_dir=str(exp_with_ckpt.dir_path) + "/cal")
    meta = json.load(open(out.replace(".npy", ".json")))
    assert meta["denormalized"] is True


def test_predict_best_handshake(exp_with_ckpt):
    from scgrhc.pipeline import predict

    with open(os.path.join(exp_with_ckpt.dir_path, "checkpoint_best.txt"), "w") as f:
        f.write("checkpoint         003.checkpoint\npcc_r  0.5\n")
    assert predict.resolve_checkpoint(exp_with_ckpt, "best") == "003.checkpoint"


@pytest.mark.slow
def test_digital_stream_matches_physical(exp_with_ckpt):
    """The int16-ADC upload + on-device calibration path produces the same
    prediction as the float32 physical path (the predict stage and serve
    prefer it: half the host→device bytes)."""
    from scgrhc.io.catalog import (
        get_channels, read_record, read_record_digital,
    )
    from scgrhc.parallel.stream import stream_infer

    p = exp_with_ckpt
    from scgrhc.pipeline.predict import load_generator_params, resolve_checkpoint

    g = load_generator_params(p, resolve_checkpoint(p, "last"))

    dig = read_record_digital("SYN000", p.in_channels)
    assert dig is not None  # synthetic records are fmt 16, single-frame
    adc, gain, base, sentinel = dig
    assert adc.dtype == np.int16

    record = read_record("SYN000")
    scg = get_channels(record, p.in_channels, 0, record.sig_len)

    want = stream_infer(g, scg.T.astype(np.float32), segment_samples=750)
    got = stream_infer(
        g, np.ascontiguousarray(adc.T), segment_samples=750,
        calibration=(gain, base, sentinel),
    )
    # f32 on-device calibrate vs f64 host calibrate: tiny rounding only
    np.testing.assert_allclose(got, want, atol=2e-5)

    # calibration really is the WFDB physical conversion
    phys_dev = (adc.astype(np.float32) - base) / gain
    np.testing.assert_allclose(phys_dev, scg.astype(np.float32), atol=1e-5)


def test_digital_sentinel_maps_to_nan_windows(tmp_path):
    """A sentinel ADC sample yields NaN output in the affected window via
    the device-side mapping, matching the physical path's NaN parity."""
    from scgrhc.io import wfdb as w
    from scgrhc.io.catalog import read_record_digital
    from scgrhc.models import generator
    from scgrhc.parallel.stream import stream_infer

    t = 750
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.0, 1.0, size=(3 * t, 2))
    rec = str(tmp_path / "sent")
    w.wrrecord(rec, 500.0, ["a", "b"], x, gain=100.0)
    # inject a sentinel into window 1 of channel a
    dat = np.fromfile(rec + ".dat", dtype="<i2").reshape(-1, 2)
    dat[t + 5, 0] = -32768
    dat.tofile(rec + ".dat")

    dig = read_record_digital("sent", ["a", "b"], processed_dir=str(tmp_path))
    adc, gain, base, sentinel = dig
    g = generator.init(jax.random.key(0), 2)
    out = stream_infer(
        g, np.ascontiguousarray(adc.T), segment_samples=t,
        calibration=(gain, base, sentinel),
    )
    assert np.isfinite(out[:t]).all() and np.isfinite(out[2 * t:]).all()
    assert np.isnan(out[t: 2 * t]).any()
