"""Additive (soft) attention gate for U-Net skip connections.

Functional re-design of the reference's ``AttentionBlock`` (reference:
waveform_train.py:16-64): 1x1 convs + instance norm on the gating signal g
and the skip activation x, ReLU, a 1x1 conv → instance norm → sigmoid
producing a per-position weight map ψ, output ``x * ψ``.  This is a local
sigmoid gate — not softmax sequence attention — so cost is linear in T and
fuses entirely into elementwise XLA ops around the 1x1 convs (which hit the
MXU as (C_in × C_out) matmuls over the time axis).
"""

from __future__ import annotations

import jax

from scgrhc.ops.nn import conv1d, conv_init, instance_norm, relu, sigmoid


def init(rng, f_x: int, f_g: int, f_int: int):
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "W_x": conv_init(r1, f_int, f_x, 1),
        "W_g": conv_init(r2, f_int, f_g, 1),
        "psi": conv_init(r3, 1, f_int, 1),
    }


def apply(params, g, x):
    """g: gating signal (decoder), x: skip activation (encoder)."""
    g1 = instance_norm(conv1d(g, params["W_g"]["w"], params["W_g"]["b"]))
    x1 = instance_norm(conv1d(x, params["W_x"]["w"], params["W_x"]["b"]))
    psi = sigmoid(
        instance_norm(conv1d(relu(g1 + x1), params["psi"]["w"], params["psi"]["b"]))
    )
    return x * psi
