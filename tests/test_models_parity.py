"""Operator- and model-level numerical parity vs PyTorch (SURVEY.md §7
"operator parity details": InstanceNorm eps/no-affine, ceil-mode pooling,
ConvTranspose conventions, dropout train-only)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scgrhc.models import critic, generator, torch_compat  # noqa: E402
from scgrhc.ops import nn as ops  # noqa: E402

RTOL, ATOL = 1e-5, 1e-5


def t2n(t):
    return t.detach().numpy()


def test_conv1d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 50)).astype(np.float32)
    w = rng.standard_normal((8, 3, 3)).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    want = t2n(F.conv1d(torch.tensor(x), torch.tensor(w), torch.tensor(b), padding=1))
    got = np.asarray(ops.conv1d(jnp.array(x), jnp.array(w), jnp.array(b), padding=1))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_conv_transpose1d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 50)).astype(np.float32)
    w = rng.standard_normal((8, 4, 3)).astype(np.float32)  # (in, out, k)
    b = rng.standard_normal(4).astype(np.float32)
    want = t2n(F.conv_transpose1d(torch.tensor(x), torch.tensor(w), torch.tensor(b)))
    got = np.asarray(ops.conv_transpose1d(jnp.array(x), jnp.array(w), jnp.array(b)))
    assert got.shape == (2, 4, 52)  # L → L+2
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_instance_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, 40)).astype(np.float32) * 3 + 1
    want = t2n(F.instance_norm(torch.tensor(x)))
    got = np.asarray(ops.instance_norm(jnp.array(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # single-channel case (psi gate uses InstanceNorm1d(1))
    x1 = rng.standard_normal((2, 1, 40)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ops.instance_norm(jnp.array(x1))),
        t2n(F.instance_norm(torch.tensor(x1))),
        rtol=1e-4,
        atol=1e-5,
    )


def test_max_pool_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4, 750)).astype(np.float32)
    want = t2n(F.max_pool1d(torch.tensor(x), 3, stride=1, ceil_mode=True))
    got = np.asarray(ops.max_pool1d_k3s1(jnp.array(x)))
    assert got.shape == (2, 4, 748)  # L → L-2
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_dropout_semantics():
    x = jnp.ones((4, 8, 100))
    assert np.array_equal(np.asarray(ops.dropout(x, 0.3, None, train=False)), np.ones_like(x))
    y = np.asarray(ops.dropout(x, 0.3, jax.random.key(0), train=True))
    zeros = (y == 0).mean()
    assert 0.2 < zeros < 0.4  # ~rate
    kept = y[y != 0]
    np.testing.assert_allclose(kept, 1.0 / 0.7, rtol=1e-6)  # inverted scaling


@pytest.mark.parametrize("in_ch", [1, 3])
def test_generator_forward_parity(in_ch):
    """Same weights → same output (eval mode, f32). The parity gate from
    BASELINE.md: Pearson-r within 1e-3 is implied by ~1e-5 output agreement."""
    from tests.torch_oracles import TorchGenerator

    tg = TorchGenerator(in_ch).eval()
    params = torch_compat.generator_from_torch_sd(tg.state_dict())
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, in_ch, 750)).astype(np.float32)
    with torch.no_grad():
        want = t2n(tg(torch.tensor(x)))
    got = np.asarray(generator.apply(params, jnp.array(x)))
    assert got.shape == (2, 1, 750)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_critic_forward_parity():
    from tests.torch_oracles import TorchCritic

    tc = TorchCritic(3).eval()
    params = torch_compat.critic_from_torch_sd(tc.state_dict())
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 4, 750)).astype(np.float32)
    with torch.no_grad():
        want = t2n(tc(torch.tensor(x)))
    got = np.asarray(critic.apply(params, jnp.array(x)))
    assert got.shape == (2, 1, 750)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_state_dict_roundtrip():
    g = generator.init(jax.random.key(0), 3)
    sd = torch_compat.generator_to_torch_sd(g, as_torch=False)
    back = torch_compat.generator_from_torch_sd(sd)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b), g, back)
    d = critic.init(jax.random.key(1), 3)
    back_d = torch_compat.critic_from_torch_sd(
        torch_compat.critic_to_torch_sd(d, as_torch=False)
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b), d, back_d
    )


def test_torch_sd_loads_into_torch_module():
    """Our exported state_dict must load into a reference-architecture torch
    module without key/shape errors (checkpoint save parity)."""
    from tests.torch_oracles import TorchCritic, TorchGenerator

    g = generator.init(jax.random.key(2), 3)
    TorchGenerator(3).load_state_dict(torch_compat.generator_to_torch_sd(g))
    d = critic.init(jax.random.key(3), 3)
    TorchCritic(3).load_state_dict(torch_compat.critic_to_torch_sd(d))
