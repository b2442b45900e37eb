"""Functional neural-net primitives (NCH layout), PyTorch-semantics-exact.

These are the operator-parity building blocks for the generator/critic
(SURVEY.md §7 "operator parity details").  Weight layouts follow the torch
conventions so checkpoint conversion is a transpose-free relabeling:

  * ``conv1d``            weight (O, I, K), bias (O,)   — ``nn.Conv1d``
  * ``conv_transpose1d``  weight (I, O, K), bias (O,)   — ``nn.ConvTranspose1d``
  * ``instance_norm``     affine-free, eps 1e-5, biased variance
                          — ``nn.InstanceNorm1d`` defaults
  * ``max_pool1d``        kernel 3, stride 1, ceil_mode (with stride 1 this
                          equals a VALID window; L → L-2)
                          — ``F.max_pool1d(..., ceil_mode=True)``
                            (reference: waveform_train.py:155-163)
  * ``dropout``           inverted dropout, train-only

Everything is jit/vmap/grad-safe with static shapes; XLA fuses the
elementwise ops (norm, relu, dropout) into the surrounding convolutions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

IN_EPS = 1e-5  # torch InstanceNorm1d default


def _acc_dtype(x):
    """HLO accumulation type request.  float32 inputs ask for f32 explicitly;
    bf16 inputs emit bf16 HLO (the TPU MXU still accumulates bf16 partial
    sums in f32 internally) — requesting an f32 result for bf16 inputs
    would break autodiff: the cast-back transpose hands the conv transpose
    an f32 cotangent against bf16 weights.

    Backend dependence (deliberate, TPU-first): the internal-f32 guarantee
    is a property of the TPU MXU.  On other backends (the CPU test mesh,
    a future GPU port) bf16 convs genuinely accumulate at bf16 precision;
    opt-in bf16 numerics are validated by the on-chip trajectory gate, not
    by the CPU suite (which runs bf16 paths for shape/plumbing coverage
    only)."""
    return jnp.float32 if x.dtype == jnp.float32 else None


def conv1d(x, w, b=None, padding: int = 0):
    """(N, C, L) ⊛ (O, C, K) → (N, O, L'), cross-correlation like torch."""
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=_acc_dtype(x),
    )
    if b is not None:
        out = out + b.astype(out.dtype)[None, :, None]
    return out.astype(x.dtype)


def conv_transpose1d(x, w, b=None):
    """``nn.ConvTranspose1d(kernel_size=K, stride=1, padding=0)``.

    With stride 1 the transposed convolution is an ordinary convolution with
    the kernel flipped along K, in/out channel axes swapped, and full
    (K-1, K-1) padding — a form XLA maps straight onto its conv HLO
    (reference usage: waveform_train.py:143-153).
    """
    k = w.shape[-1]
    w_conv = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # (I,O,K) → (O,I,K)
    out = lax.conv_general_dilated(
        x,
        w_conv,
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=_acc_dtype(x),
    )
    if b is not None:
        out = out + b.astype(out.dtype)[None, :, None]
    return out.astype(x.dtype)


def instance_norm(x, eps: float = IN_EPS):
    """Per-(sample, channel) normalization over time; no affine params
    (torch ``nn.InstanceNorm1d`` defaults; reference: waveform_train.py:47,136).

    Statistics are computed in float32 (a 750-sample mean/variance in bf16
    loses ~2 decimal digits, which the normalization would amplify) — or in
    float64 when the input is float64 (the f64 oracle tests under
    ``jax_enable_x64``; f64 never occurs in production paths).
    """
    x32 = x.astype(jnp.float64 if x.dtype == jnp.dtype(jnp.float64) else jnp.float32)
    # One-pass stats: E[x] and E[x²] reduce in the same XLA fusion (one
    # HBM read), where E[(x-mean)²] would chain a second read behind the
    # mean.  Biased variance either way; f32 keeps the cancellation in
    # E[x²]−mean² far below IN_EPS for waveform-scale data.
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    msq = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    var = jnp.maximum(msq - jnp.square(mean), 0.0)
    return ((x32 - mean) * lax.rsqrt(var + eps)).astype(x.dtype)


def max_pool1d_k3s1(x):
    """kernel 3, stride 1; ceil_mode is a no-op at stride 1 → VALID, L→L-2."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 1, 3), (1, 1, 1), "VALID"
    )


def dropout(x, rate: float, rng, train: bool):
    """Inverted dropout (torch ``nn.Dropout``); identity when not training."""
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def relu(x):
    return jnp.maximum(x, 0.0)


def sigmoid(x):
    return jax.nn.sigmoid(x)


# -- initialization ----------------------------------------------------------


def conv_init(rng, out_ch: int, in_ch: int, k: int, transpose: bool = False):
    """torch Conv1d/ConvTranspose1d default init: kaiming_uniform(a=√5) for
    the weight and U(±1/√fan_in) for the bias — both reduce to
    U(±1/√(in_ch·k)) for conv (fan_in of a transposed conv counts out_ch)."""
    w_rng, b_rng = jax.random.split(rng)
    if transpose:
        shape = (in_ch, out_ch, k)
        fan_in = out_ch * k  # torch _calculate_fan_in for ConvTranspose
    else:
        shape = (out_ch, in_ch, k)
        fan_in = in_ch * k
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(w_rng, shape, jnp.float32, -bound, bound)
    b = jax.random.uniform(b_rng, (out_ch,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}
