"""1-D attention U-Net generator (SCG channels → RHC pressure waveform).

Functional/pytree re-design of the reference generator (reference:
waveform_train.py:67-195): encoder 64→128→256, bottleneck 512, decoder with
attention-gated skip concatenation, ConvTranspose upsampling (k3 s1, L→L+2),
MaxPool downsampling (k3 s1 ceil, L→L-2), dropout 0.3 after every pool/up,
and a final 1x1 conv to one channel.

Quirk parity, reproduced deliberately:
  * ``pad_size(A, B)``'s shorter-branch pads **B** and returns it instead of
    A (reference: waveform_train.py:165-173).  For the pipeline's static
    750-sample segments every branch is dead (lengths reconcile exactly:
    750→748→746→744→746→748→750), but we keep identical semantics — the
    branch is resolved at trace time since shapes are static under jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from scgrhc.models import attention
from scgrhc.ops.nn import (
    conv1d,
    conv_init,
    conv_transpose1d,
    dropout,
    instance_norm,
    max_pool1d_k3s1,
    relu,
)

DROPOUT_RATE = 0.3  # reference: waveform_train.py:117

# (name, in, out) for the double-conv blocks, in forward order.
_BLOCKS = (
    ("enc1", None, 64),  # in filled from in_channels at init
    ("enc2", 64, 128),
    ("enc3", 128, 256),
    ("bottleneck", 256, 512),
    ("dec3", 512, 256),
    ("dec2", 256, 128),
    ("dec1", 128, 64),
)


def _conv_block_init(rng, in_ch: int, out_ch: int):
    r1, r2 = jax.random.split(rng)
    return {
        "conv1": conv_init(r1, out_ch, in_ch, 3),
        "conv2": conv_init(r2, out_ch, out_ch, 3),
    }


def _conv_block_apply(p, x):
    """2 × (conv k3 s1 p1 → instance norm → relu)
    (reference: waveform_train.py:119-141)."""
    x = relu(instance_norm(conv1d(x, p["conv1"]["w"], p["conv1"]["b"], padding=1)))
    x = relu(instance_norm(conv1d(x, p["conv2"]["w"], p["conv2"]["b"], padding=1)))
    return x


def init(rng, in_channels: int):
    keys = jax.random.split(rng, 11)
    params = {}
    for key, (name, cin, cout) in zip(keys[:7], _BLOCKS):
        params[name] = _conv_block_init(key, in_channels if cin is None else cin, cout)
    params["att3"] = attention.init(keys[7], 256, 256, 128)
    params["att2"] = attention.init(keys[8], 128, 128, 64)
    params["att1"] = attention.init(keys[9], 64, 64, 32)
    k_up3, k_up2, k_up1, k_final = jax.random.split(keys[10], 4)
    params["up3"] = conv_init(k_up3, 256, 512, 3, transpose=True)
    params["up2"] = conv_init(k_up2, 128, 256, 3, transpose=True)
    params["up1"] = conv_init(k_up1, 64, 128, 3, transpose=True)
    params["final"] = conv_init(k_final, 1, 64, 1)
    return params


def cast_params(params, dtype):
    """Cast a weight pytree for reduced-precision compute (bf16 on MXU),
    EXCEPT the final 1×1 conv, which keeps its stored dtype: ``apply``
    runs the output epilogue in the final weights' dtype, so an f32
    ``final`` gives full-precision outputs (bf16 quantizes predictions to
    ~3 significant digits — on near-constant outputs that rounding noise
    can swamp the signal the Pearson gate measures).  Convs accumulate in
    f32 on the MXU and norm statistics stay f32 either way (see ops.nn).

    ``dtype=int8`` returns the quantized *inference* tree instead (int8
    weights + per-channel scales, models.quant) — ``apply`` dispatches on
    its structure, so every f32 call site works unchanged."""
    if jnp.dtype(dtype) == jnp.int8:
        from scgrhc.models import quant

        return quant.quantize_generator(params)
    return {
        k: (v if k == "final"
            else jax.tree.map(lambda a: jnp.asarray(a).astype(dtype), v))
        for k, v in params.items()
    }


def _pad_size(a, b):
    """Reference size-reconciler incl. its shorter-branch quirk
    (waveform_train.py:165-173); static under jit."""
    la, lb = a.shape[-1], b.shape[-1]
    if la > lb:
        return a[..., :lb]
    elif la < lb:
        return jnp.pad(b, ((0, 0), (0, 0), (0, lb - la)))
    return a


def encode(params, x, block=_conv_block_apply, drop=lambda a, rng=None: a,
           drops=(None,) * 6):
    """Encoder half: enc1..enc3 + bottleneck (reference:
    waveform_train.py:175-181).  Returns the skip activations and the
    bottleneck — the exact inter-stage payload of the pipeline-parallel
    split (scgrhc.parallel.pp).  ``block``/``drop``/``drops`` are the same
    knobs ``apply`` resolves (fused/remat block, dropout keys)."""
    e1 = block(params["enc1"], x)
    e2 = block(params["enc2"], drop(max_pool1d_k3s1(e1), rng=drops[0]))
    e3 = block(params["enc3"], drop(max_pool1d_k3s1(e2), rng=drops[1]))
    b = block(params["bottleneck"], drop(max_pool1d_k3s1(e3), rng=drops[2]))
    return e1, e2, e3, b


def decode(params, x, e1, e2, e3, b, block=_conv_block_apply,
           drop=lambda a, rng=None: a, drops=(None,) * 6):
    """Decoder half: up/attention/dec ×3 + final 1×1 conv (reference:
    waveform_train.py:183-195).  ``x`` is only consulted for the output
    length reconciliation quirk (``_pad_size(f, x)``)."""
    d3 = _pad_size(drop(conv_transpose1d(b, params["up3"]["w"], params["up3"]["b"]),
                        rng=drops[3]), e3)
    a3 = attention.apply(params["att3"], d3, e3)
    d3 = block(params["dec3"], jnp.concatenate((d3, a3), axis=1))

    d2 = _pad_size(drop(conv_transpose1d(d3, params["up2"]["w"], params["up2"]["b"]),
                        rng=drops[4]), e2)
    a2 = attention.apply(params["att2"], d2, e2)
    d2 = block(params["dec2"], jnp.concatenate((d2, a2), axis=1))

    d1 = _pad_size(drop(conv_transpose1d(d2, params["up1"]["w"], params["up1"]["b"]),
                        rng=drops[5]), e1)
    a1 = attention.apply(params["att1"], d1, e1)
    d1 = block(params["dec1"], jnp.concatenate((d1, a1), axis=1))

    # Output epilogue in the final weights' own dtype: with an f32
    # ``final`` (cast_params leaves it uncast) the prediction is computed
    # and returned at full precision even under bf16 compute — the 6
    # MFLOP 1×1 conv is free next to the U-Net body, and it removes the
    # bf16 output quantization (~2^-8 relative) that dominates Pearson
    # drift on near-constant outputs.
    fw, fb = params["final"]["w"], params["final"]["b"]
    f = conv1d(d1.astype(fw.dtype), fw, fb)
    return _pad_size(f, x)


def apply(params, x, rng=None, train: bool = False, dtype=None,
          remat: bool = False, conv_backend: str = "xla"):
    """Forward pass (reference: waveform_train.py:175-195).

    x: (N, C, T) SCG → (N, 1, T) predicted (normalized) RHC.
    ``rng`` is required when ``train`` (dropout); ignored otherwise.
    ``dtype`` defaults to the params' own dtype (bf16 params ⇒ bf16
    compute), so callers pick precision by casting the weight pytree.
    ``remat`` recomputes each double-conv block in the backward pass
    instead of keeping its activations (measured: a net LOSS under XLA's
    scheduling — kept as an opt-in knob; BENCH.md).
    ``conv_backend="pallas"`` runs the double-conv blocks through the
    fused conv+IN+relu kernel (scgrhc.ops.pallas.conv_block): one HBM
    read+write per layer instead of XLA's ~4 passes, with a
    recompute-based fused backward.  First-order only — the generator is
    never under a second-order gradient.  Takes precedence over
    ``remat`` (the fused backward already rematerializes in VMEM).
    """
    from scgrhc.models import quant

    if quant.is_quantized(params):
        # int8 inference tree (cast_params(..., int8)): dropout is an
        # eval-mode identity, so a train call would silently change
        # semantics — refuse it instead.
        if train:
            raise ValueError("int8 quantized generator is inference-only")
        return quant.apply(params, x)
    if dtype is None:
        dtype = jax.tree.leaves(params)[0].dtype
    elif jnp.dtype(dtype) == jnp.int8:
        raise ValueError(
            "dtype=int8 requires a quantized weight tree — call "
            "generator.cast_params(params, jnp.int8) first"
        )
    if conv_backend == "pallas":
        from scgrhc.ops.pallas.conv_block import conv_block_fused as block
    elif remat:
        block = jax.checkpoint(_conv_block_apply)
    else:
        block = _conv_block_apply
    if train:
        drops = jax.random.split(rng, 6)
    else:
        drops = [None] * 6
    drop = partial(dropout, rate=DROPOUT_RATE, train=train)
    x = x.astype(dtype)

    e1, e2, e3, b = encode(params, x, block, drop, drops)
    return decode(params, x, e1, e2, e3, b, block, drop, drops)
