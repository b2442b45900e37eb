"""Conditional PatchGAN critic over channel-concatenated [SCG ‖ RHC].

Functional re-design of the reference discriminator (reference:
waveform_train.py:198-246): five conv k3 s1 p1 layers 64→128→256→512→1 with
instance norm + ReLU between (no norm after the first conv, no sigmoid —
WGAN critic), emitting a per-position patch score map (N, 1, T).
"""

from __future__ import annotations

import jax

from scgrhc.ops.nn import conv1d, conv_init, instance_norm, relu

NDF = 64  # reference: waveform_train.py:224


def init(rng, in_channels: int, condition_channels: int = 1, ndf: int = NDF):
    widths = [in_channels + condition_channels, ndf, ndf * 2, ndf * 4, ndf * 8, 1]
    keys = jax.random.split(rng, 5)
    return {
        f"conv{i}": conv_init(keys[i], widths[i + 1], widths[i], 3)
        for i in range(5)
    }


def _layer(p, h):
    return relu(instance_norm(conv1d(h, p["w"], p["b"], padding=1)))


def apply(params, x, remat: bool = False):
    """x: (N, C_scg + 1, T) → (N, 1, T) patch scores.

    ``remat`` recomputes each conv+norm layer in the backward pass (see
    scgrhc.models.generator.apply — the WGAN-GP step is HBM-bound, and the
    critic backward runs under a second-order grad where saved activations
    are pure bandwidth)."""
    layer = jax.checkpoint(_layer) if remat else _layer
    h = relu(conv1d(x, params["conv0"]["w"], params["conv0"]["b"], padding=1))
    for i in (1, 2, 3):
        h = layer(params[f"conv{i}"], h)
    p = params["conv4"]
    return conv1d(h, p["w"], p["b"], padding=1)
