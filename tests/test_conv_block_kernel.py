"""Fused conv+IN+relu Pallas layer vs the scgrhc.ops.nn composition
(forward and custom-VJP backward, f32 and bf16)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scgrhc.models.generator import _conv_block_apply
from scgrhc.ops.nn import conv1d, conv_init, instance_norm, relu
from scgrhc.ops.pallas.conv_block import conv_block_fused, conv_in_relu

T = 750


def _layer_ref(x, w, b):
    return relu(instance_norm(conv1d(x, w, b, padding=1)))


@pytest.mark.parametrize("ci,o", [(3, 64), (64, 128), (256, 512)])
def test_fused_forward_matches_ops(ci, o):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, ci, T)), jnp.float32)
    p = conv_init(jax.random.key(1), o, ci, 3)
    got = conv_in_relu(x, p["w"], p["b"])
    want = _layer_ref(x, p["w"], p["b"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_backward_matches_autodiff():
    ci, o = 16, 32
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, ci, T)), jnp.float32)
    p = conv_init(jax.random.key(2), o, ci, 3)
    cot = jnp.asarray(rng.standard_normal((3, o, T)), jnp.float32)

    def loss_f(fn):
        def f(x, w, b):
            return jnp.sum(fn(x, w, b) * cot)

        return jax.grad(f, argnums=(0, 1, 2))

    dx1, dw1, db1 = loss_f(conv_in_relu)(x, p["w"], p["b"])
    dx2, dw2, db2 = loss_f(_layer_ref)(x, p["w"], p["b"])
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2), atol=3e-4)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw2), atol=3e-4)
    np.testing.assert_allclose(np.asarray(db1), np.asarray(db2), atol=3e-4)


def test_fused_block_matches_generator_block():
    """Double-conv block wrapper == generator._conv_block_apply, fwd + grad."""
    from scgrhc.models.generator import _conv_block_init

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, T)), jnp.float32)
    p = _conv_block_init(jax.random.key(4), 8, 24)

    y1 = conv_block_fused(p, x)
    y2 = _conv_block_apply(p, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-5)

    g1 = jax.grad(lambda p, x: jnp.sum(jnp.square(conv_block_fused(p, x))))(p, x)
    g2 = jax.grad(lambda p, x: jnp.sum(jnp.square(_conv_block_apply(p, x))))(p, x)
    # Note db is analytically ZERO under IN (bias shifts are removed by the
    # mean), so bias grads are pure roundoff in both paths — atol covers it.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-3
        ),
        g1,
        g2,
    )


def test_fused_bf16_close_to_f32():
    ci, o = 8, 16
    rng = np.random.default_rng(5)
    x32 = jnp.asarray(rng.standard_normal((2, ci, T)), jnp.float32)
    p = conv_init(jax.random.key(6), o, ci, 3)
    y32 = conv_in_relu(x32, p["w"], p["b"])
    y16 = conv_in_relu(
        x32.astype(jnp.bfloat16),
        p["w"].astype(jnp.bfloat16),
        p["b"].astype(jnp.bfloat16),
    )
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y16, dtype=np.float32), np.asarray(y32), atol=0.05
    )


def test_fused_odd_lengths():
    """T values off the lane boundary (the model's 748/746/744) work."""
    rng = np.random.default_rng(8)
    for t in (748, 746, 744):
        x = jnp.asarray(rng.standard_normal((2, 4, t)), jnp.float32)
        p = conv_init(jax.random.key(7), 8, 4, 3)
        got = conv_in_relu(x, p["w"], p["b"])
        want = _layer_ref(x, p["w"], p["b"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
