"""Context-parallel continuous inference (scgrhc.models.cp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scgrhc.models import cp, generator
from scgrhc.ops.nn import conv_transpose1d
from scgrhc.parallel.mesh import TIME_AXIS, make_mesh
from scgrhc.train.wgan import TrainConfig, init_state

L = 1024  # divisible by 8 shards
C = 2


@pytest.fixture(scope="module")
def g_params():
    return init_state(jax.random.key(0), C, TrainConfig()).g_params


def test_conv_transpose_same_equivalence(g_params):
    """The length-preserving upsample == ConvTranspose1d center-cropped."""
    w = g_params["up3"]["w"]
    b = g_params["up3"]["b"]
    x = jnp.asarray(np.random.default_rng(0).random((1, 512, 64)), jnp.float32)
    full = conv_transpose1d(x, w, b)  # (1, 256, 66)
    same = cp._conv_transpose3(x, w, b, None, 1)
    np.testing.assert_allclose(np.asarray(full[..., 1:-1]), np.asarray(same),
                               rtol=1e-5, atol=1e-5)


def test_continuous_runs_and_is_length_preserving(g_params):
    x = jnp.asarray(np.random.default_rng(1).random((1, C, L)), jnp.float32)
    y = cp.apply_continuous(g_params, x)
    assert y.shape == (1, 1, L)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_cp_sharded_equals_continuous(g_params):
    """8-way time-sharded forward (halo exchange + psum'd InstanceNorm
    moments) == the single-device continuous forward."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, axis=TIME_AXIS)
    rec = jnp.asarray(np.random.default_rng(2).random((C, L)), jnp.float32)

    ref = cp.apply_continuous(g_params, rec.reshape(1, C, L))
    out = cp.apply_cp(g_params, rec, mesh)
    assert out.shape == (1, 1, L)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
