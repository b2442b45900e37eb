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


def apply(params, x, remat: bool = False, backend: str = "xla"):
    """x: (N, C_scg + 1, T) → (N, 1, T) patch scores.

    ``remat`` recomputes each conv+norm layer in the backward pass (see
    scgrhc.models.generator.apply — the WGAN-GP step is HBM-bound, and the
    critic backward runs under a second-order grad where saved activations
    are pure bandwidth).

    ``backend="fused"`` runs the layers through the second-order-capable
    fused Pallas path (scgrhc.ops.pallas.critic_fused): channel-major flat
    layout, one HBM read+write per layer, twice-differentiable for the
    gradient penalty.  ``remat`` is moot there (the fused backward already
    recomputes in VMEM)."""
    if backend == "fused":
        return apply_fused(params, x)
    layer = jax.checkpoint(_layer) if remat else _layer
    h = relu(conv1d(x, params["conv0"]["w"], params["conv0"]["b"], padding=1))
    for i in (1, 2, 3):
        h = layer(params[f"conv{i}"], h)
    p = params["conv4"]
    return conv1d(h, p["w"], p["b"], padding=1)


def apply_fused(params, x, interpret: bool | None = None):
    """Fused-kernel critic forward (numerics: scgrhc.ops.pallas.critic_fused).

    The (N, C, T) input is transposed ONCE into the channel-major flat
    layout (cheap: the critic input has ≤ C_scg+1 channels) and every
    layer stays in it; the (1, N·T) score map reshapes straight back."""
    from scgrhc.ops.pallas.critic_fused import from_flat, fused_layer, to_flat

    n, _, t = x.shape
    h = to_flat(x, t)
    h = fused_layer(h, params["conv0"]["w"], params["conv0"]["b"], t, n,
                    "relu", interpret)
    for i in (1, 2, 3):
        p = params[f"conv{i}"]
        h = fused_layer(h, p["w"], p["b"], t, n, "in_relu", interpret)
    p = params["conv4"]
    h = fused_layer(h, p["w"], p["b"], t, n, "linear", interpret)
    return from_flat(h, n, t)
