"""Training parity + smoke tests (reference: waveform_train.py:249-418)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scgrhc.core.params import Params
from scgrhc.models import critic, generator, torch_compat
from scgrhc.train import checkpoint as ckpt_io
from scgrhc.train.wgan import (
    TrainConfig,
    gradient_penalty_from_eps,
    init_state,
    make_optimizer,
    train_step,
)

# 256 keeps all math shape-generic (pcc/rmse/CSV/quirks are length-
# agnostic) while cutting the 1-core-CPU compile+run cost of every
# jitted U-Net/WGAN program in this file ~3x; reference-length (750)
# parity coverage lives in test_models_parity / test_reference_parity.
T = 256


def test_gradient_penalty_matches_torch():
    """Second-order GP vs torch autograd with pinned eps/weights/inputs
    (reference: waveform_train.py:249-286)."""
    torch = pytest.importorskip("torch")
    from tests.torch_oracles import TorchCritic

    tc = TorchCritic(2).double()
    d_params = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x)),
        torch_compat.critic_from_torch_sd(tc.state_dict()),
    )
    rng = np.random.default_rng(0)
    scg = rng.standard_normal((3, 2, T))
    rhc = rng.standard_normal((3, 1, T))
    pred = rng.standard_normal((3, 1, T))
    eps = rng.uniform(size=(3, 1, 1))

    # torch oracle (same math as reference compute_gp)
    t_scg, t_rhc, t_pred = map(torch.tensor, (scg, rhc, pred))
    interp = (torch.tensor(eps) * t_rhc + (1 - torch.tensor(eps)) * t_pred).requires_grad_(True)
    scores = tc(torch.cat((t_scg, interp), dim=1))
    grads = torch.autograd.grad(scores, interp, torch.ones_like(scores),
                                create_graph=True)[0]
    want = ((grads.view(3, -1).norm(2, dim=1) - 1) ** 2).mean().item()

    got = float(
        gradient_penalty_from_eps(
            d_params, jnp.array(scg), jnp.array(rhc), jnp.array(pred), jnp.array(eps)
        )
    )
    # f32 jax vs f64 torch: second-order grads through 5 convs accumulate
    # reduction-order jitter that varies with XLA's CPU partitioning —
    # measured up to 2.1e-4 when the 1-core host is oversubscribed
    # (thread-count-dependent reduction order); real GP breakage is
    # orders of magnitude larger
    assert abs(got - want) / abs(want) < 1e-3, (got, want)


def test_adam_update_matches_torch():
    """optax.adam(eps_root=0) reproduces torch.optim.Adam exactly
    (reference: waveform_train.py:325-326)."""
    torch = pytest.importorskip("torch")
    cfg = TrainConfig(alpha=1e-4, beta1=0.5, beta2=0.999)
    w0 = np.random.default_rng(0).standard_normal((4, 5)).astype(np.float32)
    grads = [np.random.default_rng(i + 1).standard_normal((4, 5)).astype(np.float32)
             for i in range(3)]

    tw = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.Adam([tw], lr=cfg.alpha, betas=(cfg.beta1, cfg.beta2))
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()

    opt = make_optimizer(cfg)
    params = {"w": jnp.array(w0)}
    state = opt.init(params)
    for g in grads:
        updates, state = opt.update({"w": jnp.array(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-6, atol=1e-7
    )


def _clone(tree):
    """Deep-copy a pytree of arrays — train_step donates its state arg, so
    tests must not hand it shared fixture buffers."""
    return jax.tree.map(lambda x: jnp.array(x), tree)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = TrainConfig(n_critic=2, lambda_gp=10.0, lambda_aux=100.0, alpha=1e-3)
    state = init_state(jax.random.key(0), 1, cfg)
    rng = np.random.default_rng(0)
    scg = jnp.asarray(rng.random((2, 1, T)), dtype=jnp.float32)
    rhc = jnp.asarray(rng.random((2, 1, T)), dtype=jnp.float32)
    return cfg, state, scg, rhc


def test_train_step_updates_and_finite(tiny_setup):
    cfg, state, scg, rhc = tiny_setup
    new_state, d_losses, g_loss = train_step(_clone(state), scg, rhc, jax.random.key(1), cfg)
    assert d_losses.shape == (cfg.n_critic,)
    assert np.isfinite(np.asarray(d_losses)).all() and np.isfinite(float(g_loss))
    # critic AND generator params actually moved
    d_delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     new_state.d_params, state.d_params))
    g_delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     new_state.g_params, state.g_params))
    assert d_delta > 0 and g_delta > 0


def test_generator_adversarial_term_zero_grad(tiny_setup):
    """The reference's G loss feeds the REAL rhc to the critic
    (waveform_train.py:376) → G's gradient must equal the pure-MSE gradient."""
    from scgrhc.train.wgan import generator_loss

    cfg, state, scg, rhc = tiny_setup
    rng = jax.random.key(3)
    # jitted: eager grad re-traces per op on the 1-core host (~4x slower)
    full = jax.jit(jax.grad(generator_loss), static_argnames=("cfg",))(
        state.g_params, state.d_params, scg, rhc, rng, cfg
    )

    def mse_only(g_params):
        pred = generator.apply(g_params, scg, rng=rng, train=True)
        return cfg.lambda_aux * jnp.mean(jnp.square(pred - rhc))

    mse_grad = jax.jit(jax.grad(mse_only))(state.g_params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-7),
        full, mse_grad,
    )


def test_fix_g_adversarial_changes_gradient(tiny_setup):
    """With fix_g_adversarial the generator DOES receive adversarial
    gradient (unlike the reference quirk, tested zero above)."""
    from scgrhc.train.wgan import generator_loss

    cfg, state, scg, rhc = tiny_setup
    cfg_fix = cfg._replace(fix_g_adversarial=True)
    rng = jax.random.key(3)
    fixed = jax.jit(jax.grad(generator_loss), static_argnames=("cfg",))(
        state.g_params, state.d_params, scg, rhc, rng, cfg_fix
    )

    def mse_only(g_params):
        pred = generator.apply(g_params, scg, rng=rng, train=True)
        return cfg.lambda_aux * jnp.mean(jnp.square(pred - rhc))

    mse_grad = jax.jit(jax.grad(mse_only))(state.g_params)
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), fixed, mse_grad),
    )
    assert diff > 1e-3  # adversarial term now contributes


def test_checkpoint_roundtrip(tmp_path, tiny_setup):
    cfg, state, scg, rhc = tiny_setup
    state2, _, _ = train_step(_clone(state), scg, rhc, jax.random.key(2), cfg)
    path = str(tmp_path / "005.checkpoint")
    ckpt_io.save(path, start_time=123.0, epoch=5, g_losses=[1.0], d_losses=[2.0, 3.0],
                 state=state2)
    ckpt = ckpt_io.load(path)
    assert ckpt["epoch"] == 5 and ckpt["g_losses"] == [1.0]
    restored = ckpt_io.restore_state(ckpt, cfg, 1)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.g_params, state2.g_params)
    # Adam moments survive the roundtrip (momentum-preserving resume)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.d_opt[0].mu)[0]),
        np.asarray(jax.tree.leaves(state2.d_opt[0].mu)[0]), rtol=1e-6)
    assert int(restored.g_opt[0].count) == int(state2.g_opt[0].count)


def test_checkpoint_async_bytes_identical(tmp_path, tiny_setup):
    """``block=False`` (params ``checkpoint_async``) writes the exact
    same bytes as the sync path, snapshots the loss histories at call
    time (the training loop keeps appending while the write is in
    flight), and survives the caller's state buffers being donated to
    the next step."""
    cfg, state, scg, rhc = tiny_setup
    state2, _, _ = train_step(_clone(state), scg, rhc, jax.random.key(2), cfg)
    sync_p = str(tmp_path / "001.checkpoint")
    async_p = str(tmp_path / "001a.checkpoint")
    ckpt_io.save(sync_p, start_time=1.0, epoch=1, g_losses=[1.0],
                 d_losses=[2.0, 3.0], state=state2, cfg=cfg)
    g, d = [1.0], [2.0, 3.0]
    ckpt_io.save(async_p, start_time=1.0, epoch=1, g_losses=g, d_losses=d,
                 state=state2, cfg=cfg, block=False)
    g.append(99.0)
    d.append(99.0)
    # donate state2's buffers to a new step while the write is in flight
    # (run.py does exactly this: next epoch starts before the write lands)
    train_step(state2, scg, rhc, jax.random.key(3), cfg)
    ckpt_io.wait()
    with open(sync_p, "rb") as f1, open(async_p, "rb") as f2:
        assert f1.read() == f2.read()
    assert not os.path.exists(async_p + ".tmp")  # atomic rename landed


def test_checkpoint_async_error_surfaces(tmp_path, tiny_setup):
    """A failed background write must raise at wait(), not vanish."""
    cfg, state, *_ = tiny_setup
    bad = str(tmp_path / "no_such_dir" / "000.checkpoint")
    ckpt_io.save(bad, start_time=0.0, epoch=0, g_losses=[], d_losses=[],
                 state=state, cfg=cfg, block=False)
    with pytest.raises(FileNotFoundError):
        ckpt_io.wait()
    ckpt_io.wait()  # error consumed; writer usable again


def test_checkpoint_tmp_excluded_from_resume(tmp_path):
    """An in-flight ``.tmp`` (crash mid-async-write) must not be picked
    as the resume point — resume falls back to the previous epoch."""
    (tmp_path / "004.checkpoint").write_bytes(b"x")
    (tmp_path / "005.checkpoint.tmp").write_bytes(b"partial")
    assert ckpt_io.get_last_checkpoint_path(str(tmp_path)) == "004.checkpoint"


def test_async_plotter_latest_wins_and_flush(tmp_path):
    """The background plotter (params ``plot_async``) collapses
    backlogged redraws to the newest and flush() leaves the SAME final
    png bytes as a sync draw of the last submission."""
    pytest.importorskip("matplotlib")
    from scgrhc.train.run import _AsyncPlotter, _plot_losses

    sync_dir = tmp_path / "sync"
    async_dir = tmp_path / "async"
    sync_dir.mkdir()
    async_dir.mkdir()
    g, d = [1.0, 2.0, 3.0], [4.0, 5.0]
    _plot_losses(g, d, 2, 3, 9, 10, str(sync_dir))

    p = _AsyncPlotter()
    for k in range(5):  # stale submissions must be skipped, not queued
        p.submit([0.0] * (k + 1), [0.0], 0, 3, k, 10, str(async_dir))
    p.submit(list(g), list(d), 2, 3, 9, 10, str(async_dir))
    p.flush()
    assert (async_dir / "train_losses.png").read_bytes() == (
        sync_dir / "train_losses.png"
    ).read_bytes()
    # reusable after drain (worker thread exits when idle)
    p.submit(list(g), list(d), 2, 3, 9, 10, str(async_dir))
    p.flush()


def test_checkpoint_torch_interop(tmp_path, tiny_setup):
    """export_torch → torch.load → reference-architecture modules load it;
    and a torch.save checkpoint loads back through ckpt_io.load."""
    torch = pytest.importorskip("torch")
    from tests.torch_oracles import TorchCritic, TorchGenerator

    cfg, state, *_ = tiny_setup
    native = str(tmp_path / "000.checkpoint")
    ckpt_io.save(native, start_time=0.0, epoch=0, g_losses=[], d_losses=[], state=state)
    exported = str(tmp_path / "000.torch.checkpoint")
    ckpt_io.export_torch(native, exported)
    ckpt = torch.load(exported, weights_only=False)
    TorchGenerator(1).load_state_dict(ckpt["g_state_dict"])
    TorchCritic(1).load_state_dict(ckpt["d_state_dict"])
    # round back through our loader
    back = ckpt_io.load(exported)
    np.testing.assert_array_equal(
        back["g_state_dict"]["final.weight"],
        np.asarray(state.g_params["final"]["w"]))


@pytest.mark.slow
def test_train_epoch_scan_matches_sequential_steps(tiny_setup):
    """The whole-epoch lax.scan program == the same batches stepped one by
    one with the same per-batch keys (scgrhc.train.wgan.train_epoch)."""
    from scgrhc.train.wgan import train_epoch

    cfg, state, scg, rhc = tiny_setup
    # tiny lr: at 1e-3 the WGAN-GP trajectory is chaotic enough that f32
    # fusion differences between the scanned and standalone programs
    # visibly diverge by step 3 — the comparison needs glued trajectories
    cfg = cfg._replace(alpha=1e-6)
    nb = 3
    rng = np.random.default_rng(7)
    scg_b = jnp.asarray(rng.random((nb, 2, 1, T)), jnp.float32)
    rhc_b = jnp.asarray(rng.random((nb, 2, 1, T)), jnp.float32)
    key = jax.random.key(11)

    seq_state = _clone(state)
    keys = jax.random.split(key, nb)
    seq_d, seq_g = [], []
    for i in range(nb):
        seq_state, d, g = train_step(seq_state, scg_b[i], rhc_b[i], keys[i], cfg)
        seq_d.append(np.asarray(d))
        seq_g.append(float(g))

    scan_state, d_hist, g_hist = train_epoch(_clone(state), scg_b, rhc_b, key, cfg)

    np.testing.assert_allclose(np.asarray(d_hist), np.stack(seq_d), rtol=2e-3)
    np.testing.assert_allclose(np.asarray(g_hist), np.asarray(seq_g), rtol=2e-3)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4
        ),
        scan_state.g_params, seq_state.g_params,
    )


@pytest.mark.slow
def test_train_epoch_gather_matches_prestacked(tiny_setup):
    """The HBM-resident gather path == pre-stacked batches (same data,
    same keys; only the permutation crosses host→device)."""
    from scgrhc.train.wgan import train_epoch, train_epoch_gather

    cfg, state, scg, rhc = tiny_setup
    cfg = cfg._replace(alpha=1e-6)
    rng = np.random.default_rng(9)
    N, bs, nb = 8, 2, 3  # uses 6 of 8 segments, permuted
    scg_all = jnp.asarray(rng.random((N, 1, T)), jnp.float32)
    rhc_all = jnp.asarray(rng.random((N, 1, T)), jnp.float32)
    order = np.array([[5, 2], [7, 0], [3, 6]], dtype=np.int32)
    key = jax.random.key(4)

    s1, d1, g1 = train_epoch(
        _clone(state),
        scg_all[order.reshape(-1)].reshape(nb, bs, 1, T),
        rhc_all[order.reshape(-1)].reshape(nb, bs, 1, T),
        key, cfg,
    )
    s2, d2, g2 = train_epoch_gather(
        _clone(state), scg_all, rhc_all, jnp.asarray(order), key, cfg
    )
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-3)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4
        ),
        s1.g_params, s2.g_params,
    )


def test_resume_from_genuine_torch_checkpoint(tmp_path):
    """A reference-style torch.save checkpoint (real torch Adam state, torch
    param-id ordering) restores with Adam moments mapped to the right
    parameters (reference: waveform_train.py:334-346,401-411)."""
    torch = pytest.importorskip("torch")
    from tests.torch_oracles import TorchCritic, TorchGenerator

    g, d = TorchGenerator(1), TorchCritic(1)
    g_opt = torch.optim.Adam(g.parameters(), lr=1e-4, betas=(0.5, 0.999))
    d_opt = torch.optim.Adam(d.parameters(), lr=1e-4, betas=(0.5, 0.999))
    x = torch.rand(2, 1, T)
    y = torch.rand(2, 1, T)
    for _ in range(2):  # a couple of real steps → nonzero moments
        g_opt.zero_grad()
        torch.nn.functional.mse_loss(g(x), y).backward()
        g_opt.step()
        d_opt.zero_grad()
        d(torch.cat((x, y), dim=1)).mean().backward()
        d_opt.step()

    path = str(tmp_path / "004.checkpoint")
    torch.save(
        {
            "start_time": 1.0, "epoch": 4, "g_losses": [0.5], "d_losses": [0.1],
            "g_state_dict": g.state_dict(), "d_state_dict": d.state_dict(),
            "g_optimizer_state_dict": g_opt.state_dict(),
            "d_optimizer_state_dict": d_opt.state_dict(),
        },
        path,
    )

    cfg = TrainConfig(alpha=1e-4, beta1=0.5, beta2=0.999)
    state = ckpt_io.restore_state(ckpt_io.load(path), cfg, 1)

    # spot-check: torch's exp_avg for named params landed on our leaves
    named = dict(g.named_parameters())
    torch_state = g_opt.state_dict()["state"]
    order = list(named)  # registration order == param id order
    for probe in ("final.weight", "enc1.0.bias", "att3.W_g.0.weight", "up2.weight"):
        pid = order.index(probe)
        want = torch_state[pid]["exp_avg"].numpy()
        mu = state.g_opt[0].mu
        node = mu
        if probe == "final.weight":
            got = node["final"]["w"]
        elif probe == "enc1.0.bias":
            got = node["enc1"]["conv1"]["b"]
        elif probe == "att3.W_g.0.weight":
            got = node["att3"]["W_g"]["w"]
        else:
            got = node["up2"]["w"]
        np.testing.assert_array_equal(np.asarray(got), want)
    assert int(state.g_opt[0].count) == 2

    # and training continues from it
    scg = jnp.asarray(np.random.default_rng(0).random((2, 1, T)), jnp.float32)
    rhc = jnp.asarray(np.random.default_rng(1).random((2, 1, T)), jnp.float32)
    new_state, d_l, g_l = train_step(state, scg, rhc, jax.random.key(0), cfg)
    assert np.isfinite(float(g_l))

    # our export round-trips into a real torch.optim.Adam
    native = str(tmp_path / "005.checkpoint")
    ckpt_io.save(native, start_time=0.0, epoch=5, g_losses=[], d_losses=[],
                 state=new_state, cfg=cfg)
    exported = str(tmp_path / "005.torch.checkpoint")
    ckpt_io.export_torch(native, exported)
    back = torch.load(exported, weights_only=False)
    g2 = TorchGenerator(1)
    g2.load_state_dict(back["g_state_dict"])
    opt2 = torch.optim.Adam(g2.parameters(), lr=1e-4, betas=(0.5, 0.999))
    opt2.load_state_dict(back["g_optimizer_state_dict"])  # raises on mismatch
    # torch adopts the SAVED param_groups wholesale, so the export must
    # carry the full hyperparameter set — prove it by actually stepping
    # (a params-only group would KeyError on 'lr'/'betas' right here)
    opt2.zero_grad()
    torch.nn.functional.mse_loss(g2(x), y).backward()
    opt2.step()
    assert opt2.param_groups[0]["lr"] == 1e-4
    assert opt2.param_groups[0]["betas"] == (0.5, 0.999)


@pytest.mark.slow
def test_train_stage_and_resume(tmp_path, monkeypatch):
    """2-epoch stage run writes per-epoch checkpoints; a rerun with
    total_epochs=3 resumes from the last checkpoint (reference:
    waveform_train.py:334-346).  Uses a deliberately tiny database (30 s
    records → ~1 small batch) — the second-order WGAN-GP step is expensive
    on the CPU test platform."""
    from scgrhc.core import paths
    from scgrhc.utils.synth import make_synthetic_database

    db = make_synthetic_database(str(tmp_path / "db"), n_records=2, duration_s=30.0)
    monkeypatch.setattr(paths, "DATA_PATH", os.path.dirname(db))
    monkeypatch.setattr(paths, "PROCESSED_DATA_PATH", db)
    cfg = {
        "dir_path": str(tmp_path / "exp"),
        "in_channels": ["patch_ACC_lat"],
        "chamber": "RA",
        "segment_size": 1.5,
        "batch_size": 64,  # > n_train → one batch shape → one jit compile
        "train_path": "loader_train.pickle",
        "valid_path": "loader_valid.pickle",
        "test_path": "loader_test.pickle",
        "checkpoint_dir_path": "checkpoints",
        "comparison_dir_path": "comparisons",
        "pred_top_dir_path": "pred_top",
        "pred_rand_dir_path": "pred_rand",
        "alpha": 1e-4, "beta1": 0.5, "beta2": 0.999,
        "n_critic": 2, "lambda_gp": 10, "lambda_aux": 100,
        "total_epochs": 2, "min_RHC": -50, "use_global_min_max": False,
        "seed": 0,
    }
    os.makedirs(cfg["dir_path"])
    cfg_path = tmp_path / "exp" / "params.json"
    cfg_path.write_text(json.dumps(cfg))
    params = Params(str(cfg_path))

    from scgrhc.data.run import run as data_run
    from scgrhc.train.run import run as train_run

    data_run(params)
    train_run(params, plot=False)
    ckpts = sorted(os.listdir(params.checkpoint_dir_path))
    assert ckpts == ["000.checkpoint", "001.checkpoint"]

    # resume leg also exercises the async-writer wiring (checkpoint_async
    # / plot_async): the stage must flush before returning, so the new
    # checkpoint is durable and complete right here
    cfg["total_epochs"] = 3
    cfg["checkpoint_async"] = True
    cfg["plot_async"] = True
    cfg_path.write_text(json.dumps(cfg))
    train_run(Params(str(cfg_path)), plot=False)
    ckpts = sorted(os.listdir(params.checkpoint_dir_path))
    assert ckpts == ["000.checkpoint", "001.checkpoint", "002.checkpoint"]
    last = ckpt_io.load(os.path.join(params.checkpoint_dir_path, "002.checkpoint"))
    assert last["epoch"] == 2
    # loss histories accumulate across the resume
    assert len(last["g_losses"]) > len(
        ckpt_io.load(os.path.join(params.checkpoint_dir_path, "001.checkpoint"))["g_losses"]
    )

    # Seed reproducibility across interruption: an UNINTERRUPTED 3-epoch
    # run with the same seed must produce the identical final checkpoint
    # (same weights, same loss histories) — the resumed leg fast-forwards
    # the loop PRNG stream to its starting epoch, so epoch 2 draws the
    # same keys either way (it previously replayed epoch 0's).
    cfg2 = dict(cfg)
    cfg2["dir_path"] = str(tmp_path / "exp_straight")
    cfg2.pop("checkpoint_async"), cfg2.pop("plot_async")
    os.makedirs(cfg2["dir_path"])
    cfg2_path = tmp_path / "exp_straight" / "params.json"
    cfg2_path.write_text(json.dumps(cfg2))
    p2 = Params(str(cfg2_path))
    data_run(p2)
    train_run(p2, plot=False)
    straight = ckpt_io.load(
        os.path.join(p2.checkpoint_dir_path, "002.checkpoint")
    )
    assert straight["g_losses"] == last["g_losses"]
    assert straight["d_losses"] == last["d_losses"]
    for k in ("g_state_dict", "d_state_dict"):
        assert straight[k].keys() == last[k].keys()
        for name in straight[k]:
            np.testing.assert_array_equal(straight[k][name], last[k][name])


@pytest.mark.slow
def test_step_and_epoch_modes_share_rng_stream(tiny_setup):
    """train_mode 'step' and 'epoch' derive IDENTICAL per-batch PRNG keys
    (threefry split prefix property), so both modes produce the same loss
    histories — incl. the remainder batch (round-1 advisor finding)."""
    from scgrhc.data.loaders import SegmentLoader
    from scgrhc.data.store import SegmentStore
    from scgrhc.train.run import _run_epoch_scan_mode, _run_epoch_step_mode

    cfg, state, _, _ = tiny_setup
    cfg = cfg._replace(alpha=1e-6, n_critic=1)
    rng = np.random.default_rng(3)
    N = 5  # batch 2 -> 2 full batches + 1 tail batch
    store = SegmentStore(
        rng.random((N, 1, T)).astype(np.float32),
        rng.random((N, 1, T)).astype(np.float32),
        [f"r{i}" for i in range(N)], np.zeros(N, np.int64),
        np.zeros(N, np.int64), np.zeros((N, 2)), np.zeros((N, 2)),
        segment_samples=T,
    )
    loader = SegmentLoader(store, 2, shuffle=True, seed=11)
    epoch_rng = jax.random.key(42)

    step_out = list(
        _run_epoch_step_mode(None, cfg, _clone(state), loader, epoch_rng, 0)
    )
    scan_out = _run_epoch_scan_mode(None, cfg, _clone(state), loader, epoch_rng, 0)

    assert len(step_out) == len(scan_out) == 3
    for (s_state, si, sd, sg), (e_state, ei, ed, eg) in zip(step_out, scan_out):
        assert si == ei
        np.testing.assert_allclose(sd, ed, rtol=2e-3)
        np.testing.assert_allclose(sg, eg, rtol=2e-3)


@pytest.mark.slow
def test_shape_bucket_matches_unbucketed(tiny_setup):
    """``shape_bucket: true`` pads the scan's batch-row count, the HBM
    store's segment count, and the remainder batch — but the observable
    trajectory must match the unbucketed epoch scan: scanned batches via
    prefix-stable keys + cond-skipped pad rows, the padded tail batch via
    masked losses (pad rows contribute nothing to any term)."""
    from types import SimpleNamespace

    from scgrhc.data.loaders import SegmentLoader
    from scgrhc.data.store import SegmentStore
    from scgrhc.train.run import _run_epoch_scan_mode

    cfg, state, _, _ = tiny_setup
    cfg = cfg._replace(alpha=1e-6, n_critic=1)
    rng = np.random.default_rng(3)
    N = 7  # batch 2 → 3 full batches (row-bucket to 4) + a 1-row tail
    store = SegmentStore(
        rng.random((N, 1, T)).astype(np.float32),
        rng.random((N, 1, T)).astype(np.float32),
        [f"r{i}" for i in range(N)], np.zeros(N, np.int64),
        np.zeros(N, np.int64), np.zeros((N, 2)), np.zeros((N, 2)),
        segment_samples=T,
    )
    loader = SegmentLoader(store, 2, shuffle=True, seed=11)
    epoch_rng = jax.random.key(42)

    plain = _run_epoch_scan_mode(
        None, cfg, _clone(state), loader, epoch_rng, 0
    )
    bucketed = _run_epoch_scan_mode(
        SimpleNamespace(shape_bucket=True), cfg, _clone(state), loader,
        epoch_rng, 0,
    )

    assert len(plain) == len(bucketed) == 4  # 3 scanned + 1 tail
    for (_, pi, pd, pg), (_, bi, bd, bg) in zip(plain, bucketed):
        assert pi == bi
        np.testing.assert_allclose(pd, bd, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(pg, bg, rtol=1e-5, atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        plain[-1][0].g_params, bucketed[-1][0].g_params,
    )


@pytest.mark.slow
def test_shape_bucket_step_mode_tail_matches(tiny_setup):
    """In step mode (`train_mode: step`, the sweep default), shape_bucket
    pads the remainder batch to a full batch_size with masked rows — the
    losses must equal the unpadded tail's, and the tail then reuses the
    full-batch compiled program instead of compiling its own shape."""
    from types import SimpleNamespace

    from scgrhc.data.loaders import SegmentLoader
    from scgrhc.data.store import SegmentStore
    from scgrhc.train import wgan
    from scgrhc.train.run import _run_epoch_step_mode

    cfg, _, _, _ = tiny_setup
    cfg = cfg._replace(alpha=1e-6, n_critic=1)
    t = 96
    state = init_state(jax.random.key(0), 1, cfg)
    rng = np.random.default_rng(9)
    N = 5  # batch 2 → 2 full batches + 1-row tail
    store = SegmentStore(
        rng.random((N, 1, t)).astype(np.float32),
        rng.random((N, 1, t)).astype(np.float32),
        [f"r{i}" for i in range(N)], np.zeros(N, np.int64),
        np.zeros(N, np.int64), np.zeros((N, 2)), np.zeros((N, 2)),
        segment_samples=t,
    )
    loader = SegmentLoader(store, 2, shuffle=True, seed=11)
    epoch_rng = jax.random.key(42)

    plain = list(
        _run_epoch_step_mode(None, cfg, _clone(state), loader, epoch_rng, 0)
    )
    base = wgan.train_step._cache_size()
    bucketed = list(
        _run_epoch_step_mode(
            SimpleNamespace(shape_bucket=True), cfg, _clone(state), loader,
            epoch_rng, 0,
        )
    )
    assert len(plain) == len(bucketed) == 3
    for (_, pi, pd, pg), (_, bi, bd, bg) in zip(plain, bucketed):
        assert pi == bi
        np.testing.assert_allclose(pd, bd, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(pg, bg, rtol=1e-5, atol=1e-6)
    # the masked full-batch program differs from the maskless one (one
    # compile), but the TAIL adds none on top — 1 new entry, not 2
    assert wgan.train_step._cache_size() == base + 1


@pytest.mark.slow
def test_shape_bucket_shares_programs_across_dataset_sizes(tiny_setup):
    """The point of ``shape_bucket``: two datasets with different segment
    counts in the same size octave must produce IDENTICAL train-program
    signatures — one jit cache entry (and, on-chip, one ~minutes-long
    remote XLA compile) instead of one per chamber (round-2 VERDICT #2)."""
    from types import SimpleNamespace

    from scgrhc.data.loaders import SegmentLoader
    from scgrhc.data.store import SegmentStore
    from scgrhc.train import wgan
    from scgrhc.train.run import _run_epoch_scan_mode

    cfg, _, _, _ = tiny_setup
    cfg = cfg._replace(alpha=1e-6, n_critic=1)
    t = 96  # short segments keep the two CPU compiles cheap
    state = init_state(jax.random.key(0), 1, cfg)
    rng = np.random.default_rng(4)

    def run(n):
        store = SegmentStore(
            rng.random((n, 1, t)).astype(np.float32),
            rng.random((n, 1, t)).astype(np.float32),
            [f"r{i}" for i in range(n)], np.zeros(n, np.int64),
            np.zeros(n, np.int64), np.zeros((n, 2)), np.zeros((n, 2)),
            segment_samples=t,
        )
        loader = SegmentLoader(store, 2, shuffle=True, seed=11)
        _run_epoch_scan_mode(
            SimpleNamespace(shape_bucket=True), cfg, _clone(state), loader,
            jax.random.key(7), 0,
        )

    # 6 and 8 segments: store rows bucket to 8, scan rows (3, 4) to 4,
    # both tail-free — same octave, so the second run must re-use the
    # first run's compiled epoch program
    run(6)
    base = wgan.train_epoch_gather._cache_size()
    run(8)
    assert wgan.train_epoch_gather._cache_size() == base


@pytest.mark.slow
def test_bf16_training_trajectory_tracks_f32(tiny_setup):
    """bf16 compute with f32 master weights (train_dtype='bfloat16') must
    track the f32 loss trajectory over multiple epochs — the gate for
    shipping bf16 training as an opt-in (VERDICT round-1 item 1b)."""
    from scgrhc.train.wgan import train_epoch_gather

    t = 96
    cfg32 = TrainConfig(n_critic=1, alpha=1e-4)
    cfg16 = cfg32._replace(compute_dtype="bfloat16")
    rng = np.random.default_rng(5)
    N, bs, nb = 8, 4, 2
    scg_all = jnp.asarray(rng.random((N, 1, t)), jnp.float32)
    # learnable signal: rhc is a smoothed copy of scg
    rhc_np = rng.random((N, 1, t)).astype(np.float32)
    rhc_all = jnp.asarray(0.5 * rhc_np + 0.5 * np.asarray(scg_all))

    def run(cfg, epochs=8):
        state = init_state(jax.random.key(0), 1, cfg)
        hist = []
        for ep in range(epochs):
            order = jnp.asarray(
                np.random.default_rng(ep).permutation(N)[: nb * bs]
                .reshape(nb, bs).astype(np.int32))
            state, d_h, g_h = train_epoch_gather(
                state, scg_all, rhc_all, order, jax.random.key(100 + ep), cfg)
            hist.extend(np.asarray(g_h).tolist())
        return np.asarray(hist)

    g32 = run(cfg32)
    g16 = run(cfg16)
    assert np.isfinite(g16).all()
    # same-scale, same-direction trajectories: pointwise within a few
    # percent of the f32 loss magnitude (G loss is lambda_aux*MSE-dominated)
    np.testing.assert_allclose(g16, g32, rtol=0.05)
    # and both actually learn (loss decreases over the run)
    assert g32[-1] < g32[0] and g16[-1] < g16[0]


@pytest.mark.slow
def test_remat_step_matches_plain(tiny_setup):
    """remat=True (recompute-for-bandwidth) changes scheduling only:
    same keys -> same losses/params to f32 reassociation tolerance."""
    cfg, state, scg, rhc = tiny_setup
    cfg = cfg._replace(n_critic=1)
    k = jax.random.key(9)
    s1, d1, g1 = train_step(_clone(state), scg, rhc, k, cfg)
    s2, d2, g2 = train_step(_clone(state), scg, rhc, k, cfg._replace(remat=True))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4)
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4
        ),
        s1.g_params, s2.g_params,
    )


@pytest.mark.slow
def test_pallas_conv_backend_step_matches_xla(tiny_setup):
    """conv_backend='pallas' (fused generator conv blocks) is a pure
    scheduling change: same keys -> same losses/params within f32
    reassociation tolerance."""
    cfg, state, scg, rhc = tiny_setup
    cfg = cfg._replace(n_critic=1)
    k = jax.random.key(12)
    s1, d1, g1 = train_step(_clone(state), scg, rhc, k, cfg)
    s2, d2, g2 = train_step(
        _clone(state), scg, rhc, k, cfg._replace(conv_backend="pallas")
    )
    # The GP term squares ~750-sample gradient norms of an untrained
    # critic, amplifying conv-reassociation jitter; ~1e-3 relative is the
    # expected scale for a scheduling-equivalent program.
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=5e-3)
    np.testing.assert_allclose(float(g1), float(g2), rtol=2e-3)
    # A first Adam step from zero state is ~alpha*sign(grad) per element,
    # so components with near-zero gradients (IN makes bias grads exactly
    # zero analytically) land at +/-alpha on roundoff alone; 3*alpha
    # bounds that.  Tight elementwise grad parity is covered by
    # tests/test_conv_block_kernel.py.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3 * cfg.alpha
        ),
        s1.g_params, s2.g_params,
    )


@pytest.mark.slow
def test_reuse_pred_and_rng_impl_run(tiny_setup):
    """Opt-in reuse_pred (one shared G forward per step) and the rbg loop
    RNG produce finite losses and genuinely different trajectories from
    the reference-semantics default (fresh dropout per critic iter)."""
    cfg, state, scg, rhc = tiny_setup
    cfg = cfg._replace(n_critic=2)
    k = jax.random.key(11)
    _, d0, g0 = train_step(_clone(state), scg, rhc, k, cfg)
    _, d1, g1 = train_step(
        _clone(state), scg, rhc, k, cfg._replace(reuse_pred=True)
    )
    assert np.isfinite(np.asarray(d1)).all() and np.isfinite(float(g1))
    # different dropout stream -> different (valid) trajectory
    assert not np.allclose(np.asarray(d0), np.asarray(d1))

    k_rbg = jax.random.key(11, impl="rbg")
    _, d2, g2 = train_step(_clone(state), scg, rhc, k_rbg, cfg)
    assert np.isfinite(np.asarray(d2)).all() and np.isfinite(float(g2))


def test_params_rng_impl_reuse_pred_keys(tmp_path):
    import json

    from scgrhc.core.params import Params

    cfg = json.load(open("/root/reference/waveform_06/params.json"))
    cfg.update(dir_path=str(tmp_path), rng_impl="rbg", reuse_pred=True)
    p = tmp_path / "params.json"
    p.write_text(json.dumps(cfg))
    pp = Params(str(p))
    assert pp.rng_impl == "rbg" and pp.reuse_pred is True
    assert TrainConfig.from_params(pp).reuse_pred is True


def test_loop_key_impl_mapping():
    """'threefry' (the documented params.rng_impl default) must map to
    jax's default key impl — jax's own registry spells it 'threefry2x32',
    and passing the alias verbatim crashes the train stage (regression)."""
    from scgrhc.train.run import _loop_key

    k_def = _loop_key(3, "threefry")
    assert "fry" in str(k_def.dtype)
    k_rbg = _loop_key(3, "rbg")
    assert "rbg" in str(k_rbg.dtype)


def _tiny_store(rng, n, c, t):
    from scgrhc.data.store import SegmentStore

    return SegmentStore(
        rng.random((n, c, t)).astype(np.float32),
        rng.random((n, 1, t)).astype(np.float32),
        [f"r{i}" for i in range(n)], np.zeros(n, np.int64),
        np.zeros(n, np.int64), np.zeros((n, 2)), np.zeros((n, 2)),
        segment_samples=t,
    )


@pytest.mark.slow
def test_channel_bucket_trajectory_identical():
    """``channel_bucket: true`` zero-pads the SCG channel axis to the
    sweep maximum (4) — and unlike row bucketing this must be EXACTLY
    trajectory-identical: zero weight columns meet zero input channels,
    their grads (hence Adam moments) stay identically zero, and no PRNG
    draw changes shape.  Losses, the sliced-back state, and checkpoint
    layout all match the unpadded run."""
    from types import SimpleNamespace

    from scgrhc.data.loaders import SegmentLoader
    from scgrhc.models import channel_pad
    from scgrhc.train.run import _run_epoch_scan_mode

    cfg = TrainConfig(n_critic=2, lambda_gp=10.0, lambda_aux=100.0, alpha=1e-3)
    t, c = 96, 2
    state = init_state(jax.random.key(0), c, cfg)
    store = _tiny_store(np.random.default_rng(5), 6, c, t)
    loader = SegmentLoader(store, 2, shuffle=True, seed=11)
    epoch_rng = jax.random.key(42)

    plain = _run_epoch_scan_mode(None, cfg, _clone(state), loader, epoch_rng, 0)

    padded_state = channel_pad.pad_state(_clone(state), c, 4)
    params = SimpleNamespace(channel_bucket=True, in_channels=["x", "y"])
    bucketed = _run_epoch_scan_mode(
        params, cfg, padded_state, loader, epoch_rng, 0
    )

    assert len(plain) == len(bucketed) == 3
    for (_, pi, pd, pg), (_, bi, bd, bg) in zip(plain, bucketed):
        assert pi == bi
        np.testing.assert_array_equal(np.asarray(pd), np.asarray(bd))
        np.testing.assert_array_equal(np.asarray(pg), np.asarray(bg))

    final = bucketed[-1][0]
    # padded weight columns provably never moved
    gw = np.asarray(final.g_params["enc1"]["conv1"]["w"])
    dw = np.asarray(final.d_params["conv0"]["w"])
    assert gw.shape[1] == 4 and dw.shape[1] == 5
    np.testing.assert_array_equal(gw[:, c:], 0.0)
    np.testing.assert_array_equal(dw[:, c:4], 0.0)
    # slicing back reproduces the unpadded trajectory bit-for-bit —
    # checkpoints therefore keep the reference layout
    sliced = channel_pad.slice_state(final, c, 4)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        (sliced.g_params, sliced.d_params),
        (plain[-1][0].g_params, plain[-1][0].d_params),
    )


def test_channel_bucket_pad_slice_roundtrip():
    """pad_state → slice_state is the identity on params AND both Adam
    moment trees (mu/nu mirror the param structure)."""
    from scgrhc.models import channel_pad

    cfg = TrainConfig()
    state = init_state(jax.random.key(1), 3, cfg)
    back = channel_pad.slice_state(channel_pad.pad_state(state, 3, 4), 3, 4)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state, back,
    )


@pytest.mark.slow
def test_channel_bucket_shares_programs_across_channel_counts():
    """The point of ``channel_bucket``: configs with different SCG channel
    subsets (1 vs 2 here) must hit ONE compiled train program — on-chip
    that's one ~minutes-long remote XLA compile for the whole sweep
    dimension instead of one per subset (round-2 VERDICT next-round #2)."""
    from types import SimpleNamespace

    from scgrhc.data.loaders import SegmentLoader
    from scgrhc.models import channel_pad
    from scgrhc.train import wgan
    from scgrhc.train.run import _run_epoch_scan_mode

    cfg = TrainConfig(n_critic=1, alpha=1e-6)
    t = 96
    rng = np.random.default_rng(6)

    def run(c):
        state = channel_pad.pad_state(init_state(jax.random.key(0), c, cfg), c, 4)
        loader = SegmentLoader(_tiny_store(rng, 4, c, t), 2, shuffle=True, seed=11)
        params = SimpleNamespace(channel_bucket=True, in_channels=list(range(c)))
        _run_epoch_scan_mode(params, cfg, state, loader, jax.random.key(7), 0)

    run(1)
    base = wgan.train_epoch_gather._cache_size()
    run(2)
    assert wgan.train_epoch_gather._cache_size() == base


@pytest.mark.slow
def test_channel_bucket_step_mode_matches(tiny_setup):
    """Step mode (`train_mode: step`, the sweep default) pads each loader
    batch via pad_batch — losses must equal the unpadded run's exactly,
    composing with shape_bucket's masked tail padding."""
    from types import SimpleNamespace

    from scgrhc.data.loaders import SegmentLoader
    from scgrhc.models import channel_pad
    from scgrhc.train.run import _run_epoch_step_mode

    cfg, _, _, _ = tiny_setup
    cfg = cfg._replace(alpha=1e-6, n_critic=1)
    t, c = 96, 2
    state = init_state(jax.random.key(0), c, cfg)
    store = _tiny_store(np.random.default_rng(8), 5, c, t)  # 2+2+1 tail
    loader = SegmentLoader(store, 2, shuffle=True, seed=11)
    epoch_rng = jax.random.key(42)

    plain = list(
        _run_epoch_step_mode(None, cfg, _clone(state), loader, epoch_rng, 0)
    )
    params = SimpleNamespace(
        channel_bucket=True, shape_bucket=True, in_channels=["x", "y"]
    )
    bucketed = list(
        _run_epoch_step_mode(
            params, cfg, channel_pad.pad_state(_clone(state), c, 4), loader,
            epoch_rng, 0,
        )
    )
    assert len(plain) == len(bucketed) == 3
    for (_, pi, pd, pg), (_, bi, bd, bg) in zip(plain, bucketed):
        assert pi == bi
        np.testing.assert_allclose(pd, bd, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(pg, bg, rtol=1e-6, atol=1e-7)


def test_async_writer_drained_when_train_loop_raises(
    tmp_path, tiny_setup, monkeypatch
):
    """A config that crashes mid-epoch must still flush the module-global
    async writers: in an in-process sweep the NEXT config's first save()
    joins the same writer and would otherwise re-raise THIS config's
    stale error.  The original loop error must win over any secondary
    flush error."""
    from scgrhc.train import run as train_run

    cfg, state, *_ = tiny_setup
    bad = str(tmp_path / "no_such_dir" / "000.checkpoint")

    def boom(*a, **k):
        ckpt_io.save(bad, start_time=0.0, epoch=0, g_losses=[], d_losses=[],
                     state=state, cfg=cfg, block=False)
        raise RuntimeError("mid-epoch crash")

    monkeypatch.setattr(train_run, "_train_epochs", boom)
    with pytest.raises(RuntimeError, match="mid-epoch crash"):
        train_run._train_loop(
            None, cfg, state, None, None, 0, 1, [], [], 0.0, 0.0, 0.0, 0,
            False,
        )
    assert ckpt_io._async_thread is None
    assert not ckpt_io._async_error


def test_train_loop_surfaces_async_error_on_success_path(
    tmp_path, tiny_setup, monkeypatch
):
    """When the epoch loop completes, a silently-dropped background
    checkpoint write must still fail the run at the final flush."""
    from scgrhc.train import run as train_run

    cfg, state, *_ = tiny_setup
    bad = str(tmp_path / "no_such_dir" / "000.checkpoint")

    def quiet_failure(*a, **k):
        ckpt_io.save(bad, start_time=0.0, epoch=0, g_losses=[], d_losses=[],
                     state=state, cfg=cfg, block=False)

    monkeypatch.setattr(train_run, "_train_epochs", quiet_failure)
    with pytest.raises(FileNotFoundError):
        train_run._train_loop(
            None, cfg, state, None, None, 0, 1, [], [], 0.0, 0.0, 0.0, 0,
            False,
        )
    assert ckpt_io._async_thread is None
    assert not ckpt_io._async_error


def test_batched_state_fetch_identical(tiny_setup):
    """The one-transfer checkpoint pull must be byte-identical to the
    per-leaf np.asarray path (it feeds the reference-layout pickle)."""
    cfg, _, _, _ = tiny_setup
    state = init_state(jax.random.key(3), 2, cfg)
    a = ckpt_io._fetch_tree_batched(state)
    b = ckpt_io._to_numpy(state)
    assert isinstance(a, type(state))
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        a, b,
    )
    assert all(isinstance(l, np.ndarray) for l in jax.tree.leaves(a))
