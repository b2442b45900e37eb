"""Zero-pad the models' input-channel axis to a fixed bucket.

``channel_bucket: true`` (scgrhc extension; see core/params.py) pads the
SCG channel count every XLA train/eval program sees up to
:data:`CHANNEL_BUCKET` (the sweep's maximum — reference configs use 1-4
SCG channels, waveform_06..37), so program shapes stop depending on the
per-config channel subset and the sweep shares compile-cache entries
across subsets.

Unlike batch/row padding this is EXACTLY trajectory-identical, not just
loss-identical:

* the padded input channels are all-zero and the corresponding
  first-layer weight columns are all-zero, so every activation equals
  the unpadded model's (0-weight x 0-input contributes nothing);
* gradients w.r.t. the padded weight columns are identically zero
  (they multiply the zero input), so Adam's moments stay zero and the
  padded columns never move;
* no PRNG draw changes shape — dropout and GP epsilon act on hidden
  activations and the batch axis, neither of which this touches.

Only the models' FIRST layers see the channel count: the generator's
``enc1.conv1.w`` (64, C, 3) and the critic's ``conv0.w`` (64, C+1, 3)
where the critic input is ``concat((scg, rhc), axis=1)`` — the zero
block therefore inserts BETWEEN the SCG columns and the RHC column.

Checkpoints keep the reference layout at the TRUE channel count:
:func:`slice_state` strips the zero columns before every save, and
:func:`pad_state` re-inserts them after init/restore (covering the Adam
moment trees, which mirror the param tree structure).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

CHANNEL_BUCKET = 4  # max SCG channel count across the reference sweep


def bucket_for(params):
    """The pad target (4) when ``channel_bucket`` applies to ``params``
    (opt-in key set and the true SCG count below the bucket), else None."""
    if (
        getattr(params, "channel_bucket", False)
        and len(params.in_channels) < CHANNEL_BUCKET
    ):
        return CHANNEL_BUCKET
    return None


def _insert_zeros(w, extra: int, at: int):
    """Insert ``extra`` zero columns along axis 1 at index ``at``."""
    z = jnp.zeros((w.shape[0], extra, *w.shape[2:]), jnp.asarray(w).dtype)
    w = jnp.asarray(w)
    return jnp.concatenate([w[:, :at], z, w[:, at:]], axis=1)


def pad_generator(g, c_from: int, c_to: int):
    """Pad a generator-shaped tree (params or Adam moments)."""
    g = dict(g)
    enc1 = dict(g["enc1"])
    conv1 = dict(enc1["conv1"])
    conv1["w"] = _insert_zeros(conv1["w"], c_to - c_from, c_from)
    enc1["conv1"] = conv1
    g["enc1"] = enc1
    return g


def slice_generator(g, c_from: int):
    g = dict(g)
    enc1 = dict(g["enc1"])
    conv1 = dict(enc1["conv1"])
    conv1["w"] = jnp.asarray(conv1["w"])[:, :c_from]
    enc1["conv1"] = conv1
    g["enc1"] = enc1
    return g


def pad_critic(d, c_from: int, c_to: int):
    """Pad a critic-shaped tree: input is (scg C, rhc 1) concatenated, so
    the zero block goes between the SCG and RHC weight columns."""
    d = dict(d)
    conv0 = dict(d["conv0"])
    conv0["w"] = _insert_zeros(conv0["w"], c_to - c_from, c_from)
    d["conv0"] = conv0
    return d


def slice_critic(d, c_from: int, c_to: int):
    d = dict(d)
    conv0 = dict(d["conv0"])
    w = jnp.asarray(conv0["w"])
    conv0["w"] = jnp.concatenate([w[:, :c_from], w[:, c_to:]], axis=1)
    d["conv0"] = conv0
    return d


def _map_param_trees(obj, fn):
    """Apply ``fn`` to every params-shaped dict subtree inside an optax
    state (the Adam mu/nu trees mirror the param tree structure)."""
    is_params = lambda x: isinstance(x, dict) and ("enc1" in x or "conv0" in x)
    return jax.tree.map(
        lambda x: fn(x) if is_params(x) else x, obj, is_leaf=is_params
    )


def pad_state(state, c_from: int, c_to: int):
    """TrainState at the true channel count → bucket-padded TrainState."""
    from scgrhc.train.wgan import TrainState

    pg = partial(pad_generator, c_from=c_from, c_to=c_to)
    pd = partial(pad_critic, c_from=c_from, c_to=c_to)
    return TrainState(
        pg(state.g_params),
        pd(state.d_params),
        _map_param_trees(state.g_opt, pg),
        _map_param_trees(state.d_opt, pd),
    )


def slice_state(state, c_from: int, c_to: int):
    """Bucket-padded TrainState → reference-layout TrainState (the form
    every checkpoint is written in)."""
    from scgrhc.train.wgan import TrainState

    sg = partial(slice_generator, c_from=c_from)
    sd = partial(slice_critic, c_from=c_from, c_to=c_to)
    return TrainState(
        sg(state.g_params),
        sd(state.d_params),
        _map_param_trees(state.g_opt, sg),
        _map_param_trees(state.d_opt, sd),
    )


def pad_batch(scg, c_to: int):
    """(B, C, T) SCG batch → (B, c_to, T) with zero channels appended.
    Works on numpy or jax arrays; returns the input unchanged when the
    channel axis already matches."""
    c = scg.shape[1]
    if c >= c_to:
        return scg
    import numpy as np

    mod = jnp if isinstance(scg, jax.Array) else np
    z = mod.zeros((scg.shape[0], c_to - c, *scg.shape[2:]), scg.dtype)
    return mod.concatenate([scg, z], axis=1)
