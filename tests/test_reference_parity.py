"""Direct parity against the ACTUAL reference implementation.

These tests import the reference's own modules from /root/reference
(read-only; the ``wfdb`` package it imports is stubbed since it's not
installed) and compare our outputs against the genuine
``waveform_train.Generator`` / ``Discriminator`` / ``compute_gp`` — a
stronger guarantee than the re-implemented torch oracles.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def ref_train():
    """Import the reference waveform_train with wfdb stubbed."""
    if "wfdb" not in sys.modules:
        sys.modules["wfdb"] = types.ModuleType("wfdb")  # never called here
    sys.path.insert(0, REF)
    try:
        import waveform_train as wt
    finally:
        sys.path.remove(REF)
    return wt


T = 750


def test_generator_forward_matches_reference_module(ref_train):
    from scgrhc.models import generator, torch_compat

    ref_g = ref_train.Generator(3).eval()
    params = jax.tree.map(
        jnp.asarray, torch_compat.generator_from_torch_sd(ref_g.state_dict())
    )
    x = np.random.default_rng(0).random((2, 3, T)).astype(np.float32)
    with torch.no_grad():
        want = ref_g(torch.tensor(x)).numpy()
    got = np.asarray(generator.apply(params, jnp.asarray(x), train=False))
    # atol covers XLA-CPU reduction-order jitter under host oversubscription
    # (thread-count-dependent partitioning); torch-f32 vs jax-f32 agree to
    # ~1e-6 on an idle host
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_critic_forward_matches_reference_module(ref_train):
    from scgrhc.models import critic, torch_compat

    ref_d = ref_train.Discriminator(3).eval()
    params = jax.tree.map(
        jnp.asarray, torch_compat.critic_from_torch_sd(ref_d.state_dict())
    )
    x = np.random.default_rng(1).random((2, 4, T)).astype(np.float32)
    with torch.no_grad():
        want = ref_d(torch.tensor(x)).numpy()
    got = np.asarray(critic.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gradient_penalty_matches_reference_compute_gp(ref_train):
    from scgrhc.models import torch_compat
    from scgrhc.train.wgan import gradient_penalty_from_eps

    ref_d = ref_train.Discriminator(2).double()
    d_params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a)),
        torch_compat.critic_from_torch_sd(ref_d.state_dict()),
    )
    rng = np.random.default_rng(2)
    scg = torch.tensor(rng.standard_normal((3, 2, T)))
    rhc = torch.tensor(rng.standard_normal((3, 1, T)))
    pred = torch.tensor(rng.standard_normal((3, 1, T)))

    # pin the reference's random eps, then feed the same to ours
    eps = rng.uniform(size=(3, 1, 1))
    real_torch_rand = torch.rand

    def pinned_rand(*size, **kw):
        if tuple(size) == (3, 1, 1):
            return torch.tensor(eps, **{k: v for k, v in kw.items() if k == "device"})
        return real_torch_rand(*size, **kw)

    torch.rand = pinned_rand
    try:
        want = ref_train.compute_gp(ref_d, scg, rhc, pred).item()
    finally:
        torch.rand = real_torch_rand

    got = float(
        gradient_penalty_from_eps(
            d_params,
            jnp.asarray(np.asarray(scg)),
            jnp.asarray(np.asarray(rhc)),
            jnp.asarray(np.asarray(pred)),
            jnp.asarray(eps),
        )
    )
    assert abs(got - want) / abs(want) < 1e-4, (got, want)


def test_reference_checkpoint_loads_into_reference_generator(ref_train, tmp_path):
    """Checkpoint save parity: a checkpoint written by OUR trainer loads
    into the REFERENCE's Generator/Discriminator classes unchanged."""
    from scgrhc.train import checkpoint as ckpt_io
    from scgrhc.train.wgan import TrainConfig, init_state

    state = init_state(jax.random.key(0), 3, TrainConfig())
    native = str(tmp_path / "000.checkpoint")
    ckpt_io.save(native, start_time=0.0, epoch=0, g_losses=[], d_losses=[],
                 state=state)
    exported = str(tmp_path / "000.torch.checkpoint")
    ckpt_io.export_torch(native, exported)

    ckpt = torch.load(exported, weights_only=False)
    g = ref_train.Generator(3)
    g.load_state_dict(ckpt["g_state_dict"])  # raises on any mismatch
    d = ref_train.Discriminator(3)
    d.load_state_dict(ckpt["d_state_dict"])
    g_opt = torch.optim.Adam(g.parameters(), lr=1e-4, betas=(0.5, 0.999))
    g_opt.load_state_dict(ckpt["g_optimizer_state_dict"])
    d_opt = torch.optim.Adam(d.parameters(), lr=1e-4, betas=(0.5, 0.999))
    d_opt.load_state_dict(ckpt["d_optimizer_state_dict"])
