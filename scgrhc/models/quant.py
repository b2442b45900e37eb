"""int8 quantized generator inference (opt-in ``dtype: "int8"``).

TPU-first rationale: the v5e MXU runs int8×int8→int32 convolutions at
~2× its bf16 rate and int8 activations halve inter-layer HBM traffic, so
the U-Net body — 14 k3 convs in the double-conv blocks plus 3 transpose
convs, ~97% of the generator's FLOPs — runs quantized, while everything
the quantization error could actually distort stays in float32:

  * **InstanceNorm makes the design work**: every quantized conv is
    immediately followed by a per-(sample, channel) InstanceNorm
    (reference: waveform_train.py:119-141), which renormalizes away any
    per-channel scale error the weight quantization introduces.  Only the
    *shape* error of the int8 rounding survives, and that is ~1e-2
    relative per layer.
  * Weights: symmetric per-output-channel scales (the standard conv
    post-training quantization), biases kept f32.
  * Activations: symmetric per-tensor dynamic scales (one fused max-abs
    reduce per layer — cheap next to the conv it feeds).
  * Attention gates, the final 1×1 conv, all norms and the denorm
    epilogue: f32 (≈3% of FLOPs).

This is an inference-only path (the reference has no quantized anything;
training rejects int8 — core/params.py).  Accuracy and throughput are
measured on-chip in BENCH.md; the parity contract for int8 is
task-level (prediction PCC vs the f32 forward), not the 1e-4 elementwise
gate the f32/bf16 paths meet.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from scgrhc.models import attention
from scgrhc.ops.nn import instance_norm, max_pool1d_k3s1, relu

_Q = 127.0
_EPS = 1e-12


def is_quantized(params) -> bool:
    """Structural marker: a tree from :func:`quantize_generator`."""
    try:
        return "wq" in params["enc1"]["conv1"]
    except (KeyError, TypeError, IndexError):
        return False


def _quant_conv_weight(w, b):
    """(O, I, K) f32 → int8 weights + per-output-channel f32 scales."""
    s = jnp.max(jnp.abs(w), axis=(1, 2)) / _Q
    s = jnp.maximum(s, _EPS)
    wq = jnp.clip(jnp.round(w / s[:, None, None]), -_Q, _Q).astype(jnp.int8)
    return {"wq": wq, "ws": s.astype(jnp.float32), "b": jnp.asarray(b, jnp.float32)}


def quantize_generator(params):
    """f32 generator pytree → quantized inference pytree.

    The double-conv blocks and the three transpose convs become int8
    (transpose convs are pre-lowered to their equivalent ordinary conv —
    kernel flipped, in/out axes swapped, full padding — matching
    ops.nn.conv_transpose1d so only one quant conv primitive exists);
    attention and the final 1×1 conv stay f32.
    """
    q = {}
    for name in ("enc1", "enc2", "enc3", "bottleneck", "dec3", "dec2", "dec1"):
        blk = params[name]
        q[name] = {
            "conv1": _quant_conv_weight(jnp.asarray(blk["conv1"]["w"], jnp.float32),
                                        blk["conv1"]["b"]),
            "conv2": _quant_conv_weight(jnp.asarray(blk["conv2"]["w"], jnp.float32),
                                        blk["conv2"]["b"]),
        }
    for name in ("up3", "up2", "up1"):
        w = jnp.asarray(params[name]["w"], jnp.float32)  # (I, O, K)
        w_conv = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # → (O, I, K)
        q[name] = _quant_conv_weight(w_conv, params[name]["b"])
    q["att3"] = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params["att3"])
    q["att2"] = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params["att2"])
    q["att1"] = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params["att1"])
    q["final"] = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params["final"])
    return q


def _quantize_act(x):
    """f32 (N, C, T) → (int8 tensor, f32 scalar scale), symmetric per-tensor."""
    s = jnp.maximum(jnp.max(jnp.abs(x)) / _Q, _EPS)
    xq = jnp.clip(jnp.round(x / s), -_Q, _Q).astype(jnp.int8)
    return xq, s


def _conv_q(xq, sx, layer, padding: int):
    """int8 conv on the MXU int8 path (int32 accumulation), dequantized to
    f32 with the fused per-channel scale, bias added in f32."""
    y = lax.conv_general_dilated(
        xq,
        layer["wq"],
        window_strides=(1,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.int32,
    )
    scale = (sx * layer["ws"])[None, :, None]
    return y.astype(jnp.float32) * scale + layer["b"][None, :, None]


def _block_q(p, x):
    """Quantized double-conv block: 2 × (int8 conv k3 p1 → IN → relu).
    Accepts f32 or a pre-quantized (xq, sx) pair; returns f32."""
    if isinstance(x, tuple):
        xq, sx = x
    else:
        xq, sx = _quantize_act(x)
    h = relu(instance_norm(_conv_q(xq, sx, p["conv1"], 1)))
    h = relu(instance_norm(_conv_q(*_quantize_act(h), p["conv2"], 1)))
    return h


def _pool_q(x):
    """Quantize-then-maxpool.  round/clip are monotone non-decreasing and
    post-relu activations are ≥0, so pool(quant(x)) == quant(pool(x))
    exactly — pooling reads 1-byte elements instead of 4."""
    xq, sx = _quantize_act(x)
    pooled = lax.reduce_window(
        xq, jnp.int8(-128), lax.max, (1, 1, 3), (1, 1, 1), "VALID"
    )
    return pooled, sx


def _up_q(x, layer):
    """Quantized ConvTranspose1d k3 s1 (pre-lowered weights): int8 conv
    with full (K−1, K−1) padding."""
    xq, sx = _quantize_act(x)
    k = layer["wq"].shape[-1]
    return _conv_q(xq, sx, layer, k - 1)


def _pad_size(a, b):
    from scgrhc.models.generator import _pad_size as ps

    return ps(a, b)


def apply(qparams, x):
    """Quantized inference forward — mirrors generator.apply
    (reference: waveform_train.py:175-195) with dropout off (eval mode)."""
    x = x.astype(jnp.float32)

    e1 = _block_q(qparams["enc1"], x)
    e2 = _block_q(qparams["enc2"], _pool_q(e1))
    e3 = _block_q(qparams["enc3"], _pool_q(e2))
    b = _block_q(qparams["bottleneck"], _pool_q(e3))

    d3 = _pad_size(_up_q(b, qparams["up3"]), e3)
    a3 = attention.apply(qparams["att3"], d3, e3)
    d3 = _block_q(qparams["dec3"], jnp.concatenate((d3, a3), axis=1))

    d2 = _pad_size(_up_q(d3, qparams["up2"]), e2)
    a2 = attention.apply(qparams["att2"], d2, e2)
    d2 = _block_q(qparams["dec2"], jnp.concatenate((d2, a2), axis=1))

    d1 = _pad_size(_up_q(d2, qparams["up1"]), e1)
    a1 = attention.apply(qparams["att1"], d1, e1)
    d1 = _block_q(qparams["dec1"], jnp.concatenate((d1, a1), axis=1))

    fw, fb = qparams["final"]["w"], qparams["final"]["b"]
    from scgrhc.ops.nn import conv1d

    f = conv1d(d1.astype(fw.dtype), fw, fb)
    return _pad_size(f, x)
