"""WGAN-GP training step, fully jitted (single XLA program per batch).

Loss parity with the reference (reference: waveform_train.py:249-286,
356-381):

  * critic (×n_critic, unrolled — n_critic is static):
      ``-E[D(scg‖rhc)] + E[D(scg‖G(scg))] + λ_gp · GP``
    with the gradient penalty's second-order autodiff expressed as
    ``jax.grad`` (w.r.t. the interpolated input) *inside* the critic loss
    that is itself differentiated w.r.t. critic params — the JAX analog of
    torch's ``autograd.grad(create_graph=True)``.
  * generator:
      ``-E[D(scg‖rhc)] + λ_aux · MSE(G(scg), rhc)``
    Reproducing a reference quirk on purpose: the adversarial term feeds the
    REAL rhc (waveform_train.py:376), so it has zero gradient w.r.t. G and
    only contributes to the reported loss value; G trains on the MSE term.

Every generator forward in the critic loop uses a fresh dropout key, like
the reference's repeated ``generator(scg)`` calls in train mode
(waveform_train.py:364-368).

Optimizer: optax Adam with ``eps=1e-8, eps_root=0`` — the exact torch
``optim.Adam`` update rule (reference: waveform_train.py:325-326).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from scgrhc.models import critic, generator


class TrainConfig(NamedTuple):
    """Static hyperparameters (hashable → usable as jit static arg)."""

    n_critic: int = 2
    lambda_gp: float = 10.0
    lambda_aux: float = 100.0
    alpha: float = 1e-4
    beta1: float = 0.5
    beta2: float = 0.999
    # False reproduces the reference quirk (waveform_train.py:376: the
    # adversarial term scores the REAL rhc → zero generator gradient);
    # True feeds the prediction — textbook conditional WGAN-GP.
    fix_g_adversarial: bool = False
    # Forward/backward compute dtype.  "bfloat16" runs the matmul-heavy
    # passes in the MXU's native dtype with float32 master weights: the
    # differentiated loss casts params/activations down internally, so
    # gradients arrive back in f32 through the cast transpose, and the
    # Adam update + optimizer state stay full-precision.  Convs still
    # accumulate f32 and norm statistics are f32 (scgrhc.ops.nn); the GP
    # gradient norm is reduced in f32.
    compute_dtype: str = "float32"
    # Rematerialize conv blocks in the backward pass (activations
    # recomputed instead of stored).  Measured a net LOSS at every
    # batch/dtype tried (XLA's remat scheduling re-adds passes; BENCH.md)
    # — kept as an opt-in knob.
    remat: bool = False
    # Generator conv-block backend: "xla" | "pallas" (fused conv+IN+relu
    # kernel, scgrhc.ops.pallas.conv_block — first-order custom_vjp, so
    # generator-only; the critic keeps XLA convs for the second-order GP).
    conv_backend: str = "xla"
    # How many critic forwards to batch into one program per critic step.
    # "off": the reference's 3 separate forwards — measured FASTEST on-chip
    #        (BENCH.md: the epoch scan is one XLA program, so there are no
    #        dispatch launches to amortize and XLA already fuses freely).
    # "2b": score [scg‖pred] and [scg‖real] as one 2B-batch call, GP on its
    #       own B-batch grad pass — same FLOPs, ~5% slower in f32, ~1%
    #       faster in bf16.
    # "3b": everything incl. the GP interpolant in one 3B call — the GP
    #       input-grad backward then runs over 3B: ~37% slower.  Kept as a
    #       measured negative result.
    # All three are per-sample identical math (convs/InstanceNorm never
    # cross the batch dim), so loss histories match across modes.
    critic_fuse: str = "off"
    # Critic layer backend: "xla" | "fused" (second-order-capable fused
    # Pallas layers in a channel-major flat layout —
    # scgrhc.ops.pallas.critic_fused; the GP's input-gradient pass runs
    # fused kernels, its params-gradient traversal an XLA reference vjp).
    critic_backend: str = "xla"
    # True scores ONE shared G(scg) prediction in every critic iteration
    # instead of the reference's fresh dropout-resampled forward per
    # iteration (waveform_train.py:364-368): saves (n_critic-1) generator
    # forwards per step — the generator side is ~60% of the measured step
    # (BENCH.md).  A different (equally valid) dropout-stream trajectory.
    reuse_pred: bool = False

    @classmethod
    def from_params(cls, params) -> "TrainConfig":
        return cls(
            n_critic=int(params.n_critic),
            lambda_gp=float(params.lambda_gp),
            lambda_aux=float(params.lambda_aux),
            alpha=float(params.alpha),
            beta1=float(params.beta1),
            beta2=float(params.beta2),
            fix_g_adversarial=bool(getattr(params, "fix_g_adversarial", False)),
            compute_dtype=str(getattr(params, "train_dtype", "float32")),
            critic_fuse=str(getattr(params, "critic_fuse", "off")),
            remat=bool(getattr(params, "remat", False)),
            conv_backend=str(getattr(params, "conv_backend", "xla")),
            critic_backend=str(getattr(params, "critic_backend", "xla")),
            reuse_pred=bool(getattr(params, "reuse_pred", False)),
        )


class TrainState(NamedTuple):
    g_params: dict
    d_params: dict
    g_opt: optax.OptState
    d_opt: optax.OptState


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(cfg.alpha, b1=cfg.beta1, b2=cfg.beta2, eps=1e-8, eps_root=0.0)


def init_state(rng, in_channels: int, cfg: TrainConfig) -> TrainState:
    g_rng, d_rng = jax.random.split(rng)
    g_params = generator.init(g_rng, in_channels)
    d_params = critic.init(d_rng, in_channels)
    opt = make_optimizer(cfg)
    return TrainState(g_params, d_params, opt.init(g_params), opt.init(d_params))


def _cast_tree(tree, dtype):
    return jax.tree.map(lambda a: a.astype(dtype), tree)


def _masked_mean(v, mask):
    """Mean over (B, ...) with per-sample 0/1 weights; ``mask=None`` is the
    plain mean.  With weights, padded samples contribute nothing and the
    result equals the mean over the real samples alone."""
    if mask is None:
        return jnp.mean(v)
    m = mask.astype(v.dtype)
    per_sample = jnp.mean(v.reshape(v.shape[0], -1), axis=1)
    return jnp.sum(per_sample * m) / jnp.sum(m)


def _stat_dtype(x):
    """Reduction dtype: float32 normally (bf16 reductions of ~750·C terms
    lose the signal), float64 when the computation is already f64 (the f64
    oracle tests under ``jax_enable_x64`` — production never sees f64)."""
    return jnp.float64 if x.dtype == jnp.dtype(jnp.float64) else jnp.float32


def _gp_norms(grads):
    """Per-sample ℓ2 of the interpolant gradient, reduced in float32
    (bf16 squares of ~750·C terms would lose the penalty's signal)."""
    b = grads.shape[0]
    g32 = grads.astype(_stat_dtype(grads)).reshape(b, -1)
    return jnp.sqrt(jnp.sum(jnp.square(g32), axis=1) + 1e-12)


def _draw_eps(eps_rng, b: int):
    """The GP interpolation draw (reference: waveform_train.py:260
    ``torch.rand(batch_size, 1, 1)``).  A module-level seam so the
    composed-trajectory oracle test can replay the reference loop's
    recorded eps stream; production always takes this default."""
    return jax.random.uniform(eps_rng, (b, 1, 1), dtype=jnp.float32)


def gradient_penalty_from_eps(d_params, scg, rhc, pred_rhc, eps, mask=None,
                              remat: bool = False, backend: str = "xla"):
    """WGAN-GP (reference: waveform_train.py:249-286): per-sample uniform
    interpolation between real and predicted RHC, ∥∇_x D∥₂ penalized to 1.
    ``eps`` (B, 1, 1) is passed in so parity tests can pin it."""
    interp = eps * rhc + (1.0 - eps) * pred_rhc

    def score_sum(z):
        # grad_outputs=ones ≡ grad of the sum of all patch scores
        return jnp.sum(
            critic.apply(d_params, jnp.concatenate((scg, z), axis=1), remat,
                         backend)
        )

    grads = jax.grad(score_sum)(interp)
    return _masked_mean(jnp.square(_gp_norms(grads) - 1.0), mask)


def _critic_terms(d_params, scg, rhc, pred_rhc, eps, fuse: str, mask=None,
                  remat: bool = False, backend: str = "xla"):
    """(E[D(pred)], E[D(real)], GP) with the chosen forward batching.

    Convs and InstanceNorm never mix samples, so all three modes compute
    identical per-sample scores; only launch count / batch shape differ.
    """
    interp = eps * rhc + (1.0 - eps) * pred_rhc
    if fuse == "3b":
        scg3 = jnp.concatenate((scg, scg, scg), axis=0)

        def obj(z):
            x = jnp.concatenate((pred_rhc, rhc, z), axis=0)
            v = critic.apply(d_params, jnp.concatenate((scg3, x), axis=1), remat,
                             backend)
            vp, vr, vi = jnp.split(v, 3, axis=0)
            return jnp.sum(vi), (_masked_mean(vp, mask), _masked_mean(vr, mask))

        (_, (pred_mean, real_mean)), grads = jax.value_and_grad(
            obj, has_aux=True
        )(interp)
        gp = _masked_mean(jnp.square(_gp_norms(grads) - 1.0), mask)
    elif fuse == "2b":
        v = critic.apply(
            d_params,
            jnp.concatenate(
                (
                    jnp.concatenate((scg, pred_rhc), axis=1),
                    jnp.concatenate((scg, rhc), axis=1),
                ),
                axis=0,
            ),
            remat,
            backend,
        )
        vp, vr = jnp.split(v, 2, axis=0)
        pred_mean, real_mean = _masked_mean(vp, mask), _masked_mean(vr, mask)
        gp = gradient_penalty_from_eps(
            d_params, scg, rhc, pred_rhc, eps, mask, remat, backend
        )
    else:  # "off": the reference's three separate forwards
        vp = critic.apply(d_params, jnp.concatenate((scg, pred_rhc), axis=1),
                          remat, backend)
        vr = critic.apply(d_params, jnp.concatenate((scg, rhc), axis=1),
                          remat, backend)
        pred_mean, real_mean = _masked_mean(vp, mask), _masked_mean(vr, mask)
        gp = gradient_penalty_from_eps(
            d_params, scg, rhc, pred_rhc, eps, mask, remat, backend
        )
    return pred_mean, real_mean, gp


def _train_pred(g_params, scg, drop_rng, cfg: TrainConfig):
    """One train-mode generator forward in the configured compute dtype.

    Under bf16, ``generator.cast_params`` leaves the final 1×1 conv in
    f32, so the returned prediction is full-precision (the critic casts
    it down at its own boundary; the G MSE term keeps the f32 value)."""
    dt = jnp.dtype(cfg.compute_dtype)
    if dt != jnp.dtype(jnp.float32):
        g_params = generator.cast_params(g_params, dt)
        scg = scg.astype(dt)
    return generator.apply(
        g_params, scg, rng=drop_rng, train=True, remat=cfg.remat,
        conv_backend=cfg.conv_backend,
    )


def critic_loss(
    d_params, g_params, scg, rhc, drop_rng, eps_rng, cfg: TrainConfig,
    mask=None, pred_rhc=None,
):
    dt = jnp.dtype(cfg.compute_dtype)
    if pred_rhc is None:  # fresh dropout-resampled forward (reference)
        pred_rhc = _train_pred(g_params, scg, drop_rng, cfg)
    if dt != jnp.dtype(jnp.float32):
        # master weights stay f32 outside; grads return f32 via the cast.
        # pred arrives f32 from the generator's f32 epilogue — the critic
        # boundary casts it down like the other inputs.
        d_params = _cast_tree(d_params, dt)
        scg, rhc = scg.astype(dt), rhc.astype(dt)
        pred_rhc = pred_rhc.astype(dt)
    # eps drawn in f32 so the stream is identical across compute dtypes
    eps = _draw_eps(eps_rng, rhc.shape[0]).astype(rhc.dtype)
    pred_mean, real_mean, gp = _critic_terms(
        d_params, scg, rhc, pred_rhc, eps, cfg.critic_fuse, mask, cfg.remat,
        cfg.critic_backend,
    )
    loss = -real_mean + pred_mean + cfg.lambda_gp * gp
    return loss.astype(_stat_dtype(loss))


def generator_loss(
    g_params, d_params, scg, rhc, drop_rng, cfg: TrainConfig, mask=None
):
    dt = jnp.dtype(cfg.compute_dtype)
    if dt != jnp.dtype(jnp.float32):
        d_params = _cast_tree(d_params, dt)
        g_params = generator.cast_params(g_params, dt)  # f32 epilogue kept
        scg, rhc = scg.astype(dt), rhc.astype(dt)
    pred_rhc = generator.apply(
        g_params, scg, rng=drop_rng, train=True, remat=cfg.remat,
        conv_backend=cfg.conv_backend,
    )
    # Reference quirk (default): adversarial term scores the REAL rhc
    # (waveform_train.py:376) — constant w.r.t. g_params.  With
    # fix_g_adversarial it scores the prediction (true conditional WGAN).
    # The critic boundary casts the f32-epilogue prediction down to dt.
    adv_input = pred_rhc.astype(dt) if cfg.fix_g_adversarial else rhc
    pred_validity = critic.apply(
        d_params, jnp.concatenate((scg, adv_input), axis=1), cfg.remat,
        backend=cfg.critic_backend,
    )
    resid = pred_rhc - rhc
    sq = jnp.square(resid.astype(_stat_dtype(resid)))
    if mask is None:
        mse = jnp.mean(sq)
    else:
        m = mask.astype(sq.dtype)
        mse = jnp.sum(jnp.mean(sq.reshape(sq.shape[0], -1), axis=1) * m) / jnp.sum(m)
    loss = -_masked_mean(pred_validity, mask) + cfg.lambda_aux * mse
    return loss.astype(_stat_dtype(loss))


def _train_step_impl(state: TrainState, scg, rhc, rng, cfg: TrainConfig, mask=None):
    """One batch: n_critic critic updates then one generator update
    (reference: waveform_train.py:357-381).  Returns (state, d_losses
    (n_critic,), g_loss).  ``mask`` (B,) 0/1 makes padded samples inert
    (loss values equal the unpadded batch's) for divisibility padding."""
    opt = make_optimizer(cfg)
    g_params, d_params, g_opt, d_opt = state
    d_losses = []
    keys = jax.random.split(rng, 2 * cfg.n_critic + 1)
    # reuse_pred: one shared prediction (constant w.r.t. d_params) scored
    # by every critic iteration; default recomputes per iteration like the
    # reference (fresh dropout each time, waveform_train.py:364-368).
    # Deliberately keyed with the SAME dropout key as the generator update
    # (keys[-1]): the G-loss primal forward is then an identical
    # subcomputation and XLA's CSE collapses the two, so the whole step
    # runs n_critic fewer generator forwards than the reference step.
    pred_shared = (
        _train_pred(g_params, scg, keys[-1], cfg) if cfg.reuse_pred else None
    )

    for i in range(cfg.n_critic):  # static unroll
        d_loss, d_grads = jax.value_and_grad(critic_loss)(
            d_params, g_params, scg, rhc, keys[2 * i], keys[2 * i + 1], cfg,
            mask, pred_shared,
        )
        updates, d_opt = opt.update(d_grads, d_opt, d_params)
        d_params = optax.apply_updates(d_params, updates)
        d_losses.append(d_loss)

    g_loss, g_grads = jax.value_and_grad(generator_loss)(
        g_params, d_params, scg, rhc, keys[-1], cfg, mask
    )
    updates, g_opt = opt.update(g_grads, g_opt, g_params)
    g_params = optax.apply_updates(g_params, updates)

    return TrainState(g_params, d_params, g_opt, d_opt), jnp.stack(d_losses), g_loss


train_step = partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))(
    _train_step_impl
)


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def train_epoch(state: TrainState, scg_batches, rhc_batches, rng, cfg: TrainConfig):
    """A whole epoch of equal-size batches as ONE XLA program.

    ``lax.scan`` over (nb, B, C, T) pre-batched arrays: per-step host
    dispatch (and its round-trip latency, which dominates small-batch
    steps) collapses into a single launch per epoch.  Step math is
    identical to :func:`train_step`.  Returns
    (state, d_losses (nb, n_critic), g_losses (nb,)).
    """
    keys = jax.random.split(rng, scg_batches.shape[0])

    def body(st, xs):
        scg, rhc, key = xs
        st, d_losses, g_loss = _train_step_impl(st, scg, rhc, key, cfg)
        return st, (d_losses, g_loss)

    state, (d_hist, g_hist) = jax.lax.scan(
        body, state, (scg_batches, rhc_batches, keys)
    )
    return state, d_hist, g_hist


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def train_epoch_gather(
    state: TrainState, scg_all, rhc_all, order, rng, cfg: TrainConfig,
    mask=None, row_valid=None,
):
    """Epoch scan that gathers batches from the HBM-resident store.

    ``scg_all``/``rhc_all`` are the FULL split arrays, uploaded once and
    reused every epoch; ``order`` is the (nb, B) int32 permutation for
    this epoch.  Only the permutation (a few KB) crosses host→device per
    epoch instead of re-staging the whole shuffled dataset (~MBs/epoch ×
    250 epochs).  Step math identical to :func:`train_step`.

    Multi-chip DP: pass the store replicated, ``order`` sharded on its B
    axis, and (when B doesn't divide the mesh) pad ``order`` with dummy
    rows masked out by ``mask`` (B,) — each device then gathers only its
    local batch shard and GSPMD all-reduces the gradients over ICI.

    ``row_valid`` (nb,) bool marks real vs padding batch rows
    (``shape_bucket``): padded rows pass the state through untouched via
    ``lax.cond`` (no compute, no optimizer update) and report zero
    losses.  ``split`` is counter-based (prefix-stable), so real rows
    draw the exact keys of the unpadded scan — trajectories identical.
    """
    keys = jax.random.split(rng, order.shape[0])

    def step(st, idx, key):
        st, d_losses, g_loss = _train_step_impl(
            st, scg_all[idx], rhc_all[idx], key, cfg, mask
        )
        return st, (d_losses, g_loss)

    if row_valid is None:
        def body(st, xs):
            idx, key = xs
            return step(st, idx, key)

        xs = (order, keys)
    else:
        def real(st, idx, key):
            # losses to f32 so both cond branches have identical avals
            # (under bf16 compute some loss terms come back bf16)
            st, (d, g) = step(st, idx, key)
            return st, (d.astype(jnp.float32), g.astype(jnp.float32))

        def body(st, xs):
            idx, key, valid = xs
            return jax.lax.cond(
                valid,
                lambda s: real(s, idx, key),
                lambda s: (
                    s,
                    (
                        jnp.zeros((cfg.n_critic,), jnp.float32),
                        jnp.float32(0.0),
                    ),
                ),
                st,
            )

        xs = (order, keys, row_valid)

    state, (d_hist, g_hist) = jax.lax.scan(body, state, xs)
    return state, d_hist, g_hist
