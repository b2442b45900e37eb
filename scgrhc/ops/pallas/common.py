"""Helpers shared by the fused Pallas conv kernels.

Both kernel families (:mod:`scgrhc.ops.pallas.conv_block` — the
first-order generator layer — and :mod:`scgrhc.ops.pallas.critic_fused`
— the second-order-capable critic layer) express the k=3 p=1 conv as
three shifted matmuls over tap-major weights so the contraction rides
the MXU with the lane dimension on T.  One implementation here keeps a
numerics fix (shift boundary handling, accumulation dtype) from silently
missing one family.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_F32 = jnp.float32


def shift_r(a):
    """(C, T) → columns moved one right, zero-filled: out[:, t] = a[:, t-1]."""
    z = jnp.zeros((a.shape[0], 1), a.dtype)
    return jnp.concatenate((z, a[:, :-1]), axis=1)


def shift_l(a):
    """(C, T) → columns moved one left, zero-filled: out[:, t] = a[:, t+1]."""
    z = jnp.zeros((a.shape[0], 1), a.dtype)
    return jnp.concatenate((a[:, 1:], z), axis=1)


def conv3(ws, x):
    """k=3 p=1 conv as three shifted matmuls.

    ws (3, O, I) tap-major weights, x (I, T) → (O, T) f32.
    out[:, t] = ws[0]·x[:, t-1] + ws[1]·x[:, t] + ws[2]·x[:, t+1].
    (In the flattened multi-sample layout the inter-sample zero pad
    columns double as the conv's padding=1.)
    """
    return (
        jnp.dot(ws[0], shift_r(x), preferred_element_type=_F32)
        + jnp.dot(ws[1], x, preferred_element_type=_F32)
        + jnp.dot(ws[2], shift_l(x), preferred_element_type=_F32)
    )


def conv3_t(ws, dc):
    """Input-gradient of :func:`conv3`: dx (I, T) from dc (O, T).

    dx[:, s] = ws[0]ᵀ·dc[:, s+1] + ws[1]ᵀ·dc[:, s] + ws[2]ᵀ·dc[:, s-1].
    The O-axis contraction is expressed through dot_general so no weight
    transpose is materialized in VMEM.
    """
    tdot = partial(
        jax.lax.dot_general,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=_F32,
    )
    return tdot(ws[0], shift_l(dc)) + tdot(ws[1], dc) + tdot(ws[2], shift_r(dc))


def auto_interpret(interpret):
    """Default to interpret mode off-TPU (CPU tests), compiled on-chip."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret
