"""Orbax checkpoint backend (scgrhc.train.orbax_io)."""

import numpy as np
import pytest

import jax

from scgrhc.train import checkpoint as ckpt_io
from scgrhc.train import orbax_io
from scgrhc.train.wgan import TrainConfig, init_state

pytest.importorskip("orbax.checkpoint")


@pytest.fixture(scope="module")
def state1():
    cfg = TrainConfig()
    return cfg, init_state(jax.random.key(0), 1, cfg)


def test_orbax_roundtrip(tmp_path, state1):
    cfg, state = state1
    path = str(tmp_path / "007.checkpoint")
    orbax_io.save(path, start_time=9.0, epoch=7, g_losses=[1.0, 2.0],
                  d_losses=[3.0], state=state)
    assert orbax_io.is_orbax_checkpoint(path + ".orbax")
    ckpt, restored = orbax_io.load(path, cfg, 1)
    assert ckpt["epoch"] == 7 and ckpt["g_losses"] == [1.0, 2.0]
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.g_params, state.g_params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.d_opt[0].mu, state.d_opt[0].mu)


def test_orbax_async_save(tmp_path, state1):
    """block=False returns early; wait() makes the checkpoint (arrays +
    meta.json) durable and loadable."""
    cfg, state = state1
    path = str(tmp_path / "002.checkpoint")
    orbax_io.save(path, start_time=1.0, epoch=2, g_losses=[9.0], d_losses=[],
                  state=state, block=False)
    orbax_io.wait()
    ckpt, restored = orbax_io.load(path, cfg, 1)
    assert ckpt["epoch"] == 2 and ckpt["g_losses"] == [9.0]
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.g_params, state.g_params)


def test_orbax_to_reference_shim(tmp_path, state1):
    cfg, state = state1
    path = str(tmp_path / "001.checkpoint")
    orbax_io.save(path, start_time=0.0, epoch=1, g_losses=[], d_losses=[],
                  state=state)
    ref = str(tmp_path / "001.ref.checkpoint")
    orbax_io.to_reference(path, ref, cfg, 1)
    ckpt = ckpt_io.load(ref)
    np.testing.assert_array_equal(
        ckpt["g_state_dict"]["final.weight"], np.asarray(state.g_params["final"]["w"])
    )
    assert ckpt["epoch"] == 1


def test_resume_prefers_latest_either_backend(tmp_path, state1):
    """get_last_checkpoint_path picks the newest entry whether the dir holds
    reference pickles or orbax dirs."""
    cfg, state = state1
    d = tmp_path / "ckpts"
    d.mkdir()
    orbax_io.save(str(d / "000.checkpoint"), start_time=0.0, epoch=0,
                  g_losses=[], d_losses=[], state=state)
    orbax_io.save(str(d / "001.checkpoint"), start_time=0.0, epoch=1,
                  g_losses=[], d_losses=[], state=state)
    last = ckpt_io.get_last_checkpoint_path(str(d))
    assert last == "001.checkpoint.orbax"
    ckpt, _ = orbax_io.load(str(d / last), cfg, 1)
    assert ckpt["epoch"] == 1


def test_export_cli_from_orbax(tmp_path, state1, monkeypatch):
    """'scgrhc export' re-encodes an orbax checkpoint as a torch file."""
    import json
    import os

    torch = pytest.importorskip("torch")
    import scgrhc.pipeline.run as pr

    cfg, state = state1
    d = tmp_path / "exp"
    os.makedirs(d / "checkpoints")
    (d / "params.json").write_text(json.dumps({
        "dir_path": str(d), "in_channels": ["a"], "chamber": "PA",
        "segment_size": 1.5, "batch_size": 4, "train_path": "t",
        "valid_path": "v", "test_path": "s", "checkpoint_dir_path": "checkpoints",
        "comparison_dir_path": "co", "pred_top_dir_path": "p1",
        "pred_rand_dir_path": "p2", "alpha": 1e-4, "beta1": 0.5,
        "beta2": 0.999, "n_critic": 2, "lambda_gp": 10, "lambda_aux": 100,
        "total_epochs": 1, "min_RHC": -50, "use_global_min_max": False,
    }))
    orbax_io.save(str(d / "checkpoints" / "004.checkpoint"), start_time=0.0,
                  epoch=4, g_losses=[], d_losses=[], state=state)
    out = str(tmp_path / "out.torch")
    assert pr.dispatch(["export", str(d), "004.checkpoint", out]) == 0
    ckpt = torch.load(out, weights_only=False)
    assert ckpt["epoch"] == 4
    np.testing.assert_array_equal(
        ckpt["g_state_dict"]["final.weight"].numpy(),
        np.asarray(state.g_params["final"]["w"]))


def test_crash_window_falls_back_to_previous_epoch(tmp_path, state1):
    """A crash between Orbax's atomic array commit and the meta.json write
    leaves a meta-less directory; resume must select the previous complete
    checkpoint instead of dying on FileNotFoundError.  In-flight Orbax tmp
    dirs and 'scgrhc export' .torch side-files must be skipped too."""
    import os

    cfg, state = state1
    d = tmp_path / "ckpts"
    d.mkdir()
    orbax_io.save(str(d / "000.checkpoint"), start_time=0.0, epoch=0,
                  g_losses=[], d_losses=[], state=state)
    orbax_io.save(str(d / "001.checkpoint"), start_time=0.0, epoch=1,
                  g_losses=[], d_losses=[], state=state)
    # crash injection: epoch-1 checkpoint committed but meta never landed
    os.remove(str(d / "001.checkpoint.orbax" / "meta.json"))
    # plus an in-flight orbax temp dir and a .torch export
    os.makedirs(str(d / "002.checkpoint.orbax.orbax-checkpoint-tmp-42"))
    (d / "001.checkpoint.torch").write_bytes(b"not a checkpoint")

    last = ckpt_io.get_last_checkpoint_path(str(d))
    assert last == "000.checkpoint.orbax"
    ckpt, _ = orbax_io.load(str(d / last), cfg, 1)
    assert ckpt["epoch"] == 0


def test_list_checkpoints_dedupes_and_filters(tmp_path, state1):
    """eval 'all' enumeration: one entry per epoch even when both backends
    (and export side-files) coexist; incomplete orbax dirs excluded."""
    import os
    import pickle

    cfg, state = state1
    d = tmp_path / "ckpts"
    d.mkdir()
    # epoch 0: native pickle; epoch 1: orbax; epoch 1 also exported .torch
    with open(d / "000.checkpoint", "wb") as f:
        pickle.dump({"epoch": 0}, f)
    orbax_io.save(str(d / "001.checkpoint"), start_time=0.0, epoch=1,
                  g_losses=[], d_losses=[], state=state)
    (d / "001.checkpoint.torch").write_bytes(b"x")
    # epoch 2: half-committed orbax (no meta)
    orbax_io.save(str(d / "002.checkpoint"), start_time=0.0, epoch=2,
                  g_losses=[], d_losses=[], state=state)
    os.remove(str(d / "002.checkpoint.orbax" / "meta.json"))

    assert ckpt_io.list_checkpoints(str(d)) == [
        "000.checkpoint", "001.checkpoint.orbax"
    ]
