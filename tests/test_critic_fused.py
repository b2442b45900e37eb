"""Second-order-capable fused critic layers (scgrhc.ops.pallas.critic_fused):
parity with the XLA critic path through forward, first-order gradients, and
the full WGAN-GP second-order critic loss (interpret mode on the CPU mesh;
on-chip numerics are re-verified in BENCH.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scgrhc.models import critic
from scgrhc.ops.pallas import critic_fused as cf

T = 32  # short segments: interpret mode is slow; the math is length-blind


def _rand(shape, seed, dtype=np.float32):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape),
                       dtype=dtype)


@pytest.mark.parametrize("mode", ["linear", "relu", "in_relu"])
@pytest.mark.parametrize("shape", [(3, 5, 8), (2, 8, 16)])  # (B, C_in, O)
def test_fused_layer_matches_reference(mode, shape):
    """Kernel forward == plain-jnp reference == per-sample XLA ops."""
    b, c, o = shape
    xb = _rand((b, c, T), 0)
    w = _rand((o, c, 3), 1) * 0.3
    bias = _rand((o,), 2) * 0.1
    x = cf.to_flat(xb, T)

    got = cf.fused_layer(x, w, bias, T, b, mode, interpret=True)
    ref = cf._ref_fwd(x, jnp.moveaxis(w, 2, 0), bias.reshape(1, -1), T,
                      cf.pad_t(T), mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    # cross-check the flat layout against the standard (N, C, T) ops
    from scgrhc.ops.nn import conv1d, instance_norm, relu

    cb = conv1d(xb, w, bias, padding=1)
    if mode == "in_relu":
        want = relu(instance_norm(cb))
    elif mode == "relu":
        want = relu(cb)
    else:
        want = cb
    back = cf.from_flat(got, b, T)
    np.testing.assert_allclose(np.asarray(back), np.asarray(want), atol=1e-5)


def test_fused_layer_first_order_grads_match():
    """jax.grad through the fused layer (Pallas bwd kernels) == autodiff of
    the reference implementation, for x, w, and b."""
    b, c, o = 3, 4, 8
    x = cf.to_flat(_rand((b, c, T), 3), T)
    w = _rand((o, c, 3), 4) * 0.3
    bias = _rand((o,), 5) * 0.1
    dy_w = _rand((o, b * cf.pad_t(T)), 6)  # fixed cotangent via weighted sum

    def loss_fused(x, w, bias):
        y = cf.fused_layer(x, w, bias, T, b, "in_relu", interpret=True)
        return jnp.sum(y * dy_w)

    def loss_ref(x, w, bias):
        y = cf._ref_fwd(x, jnp.moveaxis(w, 2, 0), bias.reshape(1, -1), T,
                        cf.pad_t(T), "in_relu")
        return jnp.sum(y * dy_w)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_fused_critic_forward_matches_xla():
    b, c_in = 3, 2
    params = critic.init(jax.random.key(0), c_in)
    x = _rand((b, c_in + 1, T), 7)
    want = critic.apply(params, x)
    got = critic.apply_fused(params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


@pytest.mark.slow
def test_fused_critic_param_grads_match_xla():
    b, c_in = 2, 1
    params = critic.init(jax.random.key(1), c_in)
    x = _rand((b, c_in + 1, T), 8)

    def loss(p, backend):
        return jnp.mean(jnp.square(critic.apply(p, x, False, backend)))

    g_x = jax.grad(loss)(params, "xla")
    g_f = jax.grad(loss)(params, "fused")
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4
        ),
        g_x, g_f,
    )


@pytest.mark.slow
def test_fused_critic_second_order_gp_matches_xla():
    """The money test: d(critic WGAN-GP loss)/d(params) — which
    differentiates the GP's input-gradient a second time — agrees between
    the fused path (Pallas first-order + XLA reference second-order) and
    the plain XLA path."""
    from scgrhc.train.wgan import TrainConfig, critic_loss, init_state

    b, c_in = 2, 1
    cfg = TrainConfig(n_critic=1)
    state = init_state(jax.random.key(2), c_in, cfg)
    scg = jnp.asarray(np.random.default_rng(9).random((b, c_in, T)), jnp.float32)
    rhc = jnp.asarray(np.random.default_rng(10).random((b, 1, T)), jnp.float32)
    k1, k2 = jax.random.key(3), jax.random.key(4)

    def d_grad(backend):
        c = cfg._replace(critic_backend=backend)
        loss, grads = jax.value_and_grad(critic_loss)(
            state.d_params, state.g_params, scg, rhc, k1, k2, c
        )
        return loss, grads

    l_x, g_x = d_grad("xla")
    l_f, g_f = d_grad("fused")
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-5)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-4
        ),
        g_x, g_f,
    )


@pytest.mark.slow
def test_fused_gp_value_matches_pinned_eps():
    """The gradient penalty VALUE (input-gradient norms through the fused
    bwd_dx kernels) matches the XLA path with a pinned interpolation eps."""
    from scgrhc.train.wgan import gradient_penalty_from_eps

    b, c_in = 3, 2
    d_params = critic.init(jax.random.key(5), c_in)
    rng = np.random.default_rng(11)
    scg = jnp.asarray(rng.random((b, c_in, T)), jnp.float32)
    rhc = jnp.asarray(rng.random((b, 1, T)), jnp.float32)
    pred = jnp.asarray(rng.random((b, 1, T)), jnp.float32)
    eps = jnp.asarray(rng.random((b, 1, 1)), jnp.float32)

    gp_x = gradient_penalty_from_eps(d_params, scg, rhc, pred, eps)
    gp_f = gradient_penalty_from_eps(
        d_params, scg, rhc, pred, eps, backend="fused"
    )
    np.testing.assert_allclose(float(gp_f), float(gp_x), rtol=1e-5)


@pytest.mark.slow
def test_train_step_fused_critic_matches_xla():
    """One full WGAN-GP train step with critic_backend='fused' produces the
    same losses and parameter updates as the XLA path (same RNG keys)."""
    from scgrhc.train.wgan import TrainConfig, init_state, train_step

    b, c_in = 4, 1
    cfg = TrainConfig(n_critic=2)
    state = init_state(jax.random.key(6), c_in, cfg)
    rng = np.random.default_rng(12)
    scg = jnp.asarray(rng.random((b, c_in, T)), jnp.float32)
    rhc = jnp.asarray(rng.random((b, 1, T)), jnp.float32)
    key = jax.random.key(7)

    def clone(tree):
        return jax.tree.map(lambda a: jnp.array(a), tree)

    s_x, d_x, g_x = train_step(clone(state), scg, rhc, key, cfg)
    s_f, d_f, g_f = train_step(
        clone(state), scg, rhc, key, cfg._replace(critic_backend="fused")
    )
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_x), rtol=2e-4)
    np.testing.assert_allclose(float(g_f), float(g_x), rtol=2e-4)
    # Adam normalizes each update to ~alpha regardless of grad magnitude,
    # so f32 reassociation jitter on near-zero grads can flip an element's
    # step sign: compare params to a few alpha (2 steps × 1e-4)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4
        ),
        s_x.d_params, s_f.d_params,
    )
