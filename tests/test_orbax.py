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
