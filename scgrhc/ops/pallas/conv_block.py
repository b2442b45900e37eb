"""Fused conv1d(k3,p1) + bias + InstanceNorm + ReLU Pallas layer.

The generator's double-conv blocks (scgrhc.models.generator, reference:
waveform_train.py:119-141) are chains of ``relu(IN(conv(x)))``.  Under
XLA each link costs ~4 HBM passes over the activation: the conv HLO
writes its output, the IN statistics reduce reads it back, and the
normalize+relu fusion reads it again and writes the result (reductions
cannot fuse into the convolution, and elementwise consumers cannot fuse
into the next conv's input).  The WGAN-GP train step is
HBM-bandwidth-bound with ~2.5x MXU headroom (BENCH.md), so those extra
passes are the step's critical path.

This kernel runs the whole layer in VMEM: one grid program per sample
pulls ``x (C_in, T)`` on chip, evaluates the k=3 convolution as three
shifted MXU matmuls, computes the one-pass IN statistics and the
normalize+relu epilogue without leaving VMEM, and writes only the final
activation — one HBM read + one write per layer.

The backward pass (``custom_vjp``, first-order — the generator is never
differentiated twice; the critic keeps XLA convs for the second-order
gradient penalty) is a single kernel per layer that *recomputes* the
conv output in VMEM instead of saving residuals (remat-style, but
without XLA's extra scheduling passes: the measured whole-graph
``jax.checkpoint`` remat is a net loss, BENCH.md), then applies the
relu/IN backward and emits dx plus the cross-sample-accumulated dw/db.

T stays the logical length (750/748/746/744 — Mosaic masks the lane
padding); channel counts are the model's 64..512.  Matmuls accumulate
f32 (`preferred_element_type`), IN statistics are f32, outputs cast back
to the input dtype — numerics match scgrhc.ops.nn to f32 reassociation
tolerance in both precisions.

On-chip numerics (verified on the real v5e, not just interpret mode):
forward matches the XLA chain to <5e-5 absolute at both the 3→64 and
256→512 shapes; the recompute backward's dx matches autodiff to ~6e-4
absolute (≲1e-4 relative) — MXU accumulation-order jitter between XLA's
fused conv and this kernel's three-matmul decomposition.

MEASURED OUTCOME (BENCH.md): XLA's own conv+IN+relu scheduling matches
this kernel's forward within ~4% and beats its recompute backward, so
``conv_backend: "pallas"`` is an opt-in with a documented negative
result, not the default.  Also note the f32 backward at the 512-channel
blocks slightly exceeds the 16 MB VMEM scoped limit (compile-time
error); use the backend with ``train_dtype: bfloat16`` if at all.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scgrhc.ops.nn import IN_EPS

from scgrhc.ops.pallas.common import auto_interpret as _auto_interpret
from scgrhc.ops.pallas.common import conv3 as _conv3
from scgrhc.ops.pallas.common import conv3_t as _conv3_t
from scgrhc.ops.pallas.common import shift_l as _shift_l
from scgrhc.ops.pallas.common import shift_r as _shift_r

_F32 = jnp.float32


def _in_stats(c):
    """One-pass biased IN statistics over T → (mean, rsig), both (O, 1) f32."""
    mean = jnp.mean(c, axis=1, keepdims=True)
    msq = jnp.mean(c * c, axis=1, keepdims=True)
    var = jnp.maximum(msq - mean * mean, 0.0)
    return mean, jax.lax.rsqrt(var + IN_EPS)


def _fwd_kernel(x_ref, ws_ref, b_ref, y_ref):
    x = x_ref[0]  # (I, T)
    c = _conv3(ws_ref[...], x) + b_ref[...].astype(_F32).reshape(-1, 1)
    mean, rsig = _in_stats(c)
    y_ref[0] = jnp.maximum((c - mean) * rsig, 0.0).astype(y_ref.dtype)


def _bwd_kernel(x_ref, ws_ref, b_ref, dy_ref, dx_ref, dw_ref, db_ref):
    n = pl.program_id(0)
    x = x_ref[0]  # (I, T)
    t = x.shape[1]

    # recompute the forward in VMEM (cheaper than saving/reloading it)
    c = _conv3(ws_ref[...], x) + b_ref[...].astype(_F32).reshape(-1, 1)
    mean, rsig = _in_stats(c)
    xhat = (c - mean) * rsig

    # relu + IN backward: dc = r·(g − mean_T(g) − x̂·mean_T(g·x̂))
    g = dy_ref[0].astype(_F32) * (xhat > 0)
    dc = rsig * (
        g
        - jnp.mean(g, axis=1, keepdims=True)
        - xhat * jnp.mean(g * xhat, axis=1, keepdims=True)
    )

    dcd = dc.astype(x.dtype)
    dx_ref[0] = _conv3_t(ws_ref[...], dcd).astype(dx_ref.dtype)

    # weight/bias grads, accumulated across the sequential sample grid
    wdot = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),  # contract T
        preferred_element_type=_F32,
    )
    dw = jnp.stack(
        (wdot(dcd, _shift_r(x)), wdot(dcd, x), wdot(dcd, _shift_l(x)))
    )
    db = jnp.sum(dc, axis=1, keepdims=True).T  # (1, O)

    @pl.when(n == 0)
    def _init():
        dw_ref[...] = dw
        db_ref[...] = db

    @pl.when(n != 0)
    def _acc():
        dw_ref[...] += dw
        db_ref[...] += db


def _fwd_call(x, ws, b2, interpret: bool):
    n, ci, t = x.shape
    o = ws.shape[1]
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, ci, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, o, ci), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, o, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, o, t), x.dtype),
        interpret=interpret,
    )(x, ws, b2)


def _bwd_call(x, ws, b2, dy, interpret: bool):
    n, ci, t = x.shape
    o = ws.shape[1]
    return pl.pallas_call(
        _bwd_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, ci, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, o, ci), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, ci, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, o, ci), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, ci, t), x.dtype),
            jax.ShapeDtypeStruct((3, o, ci), _F32),
            jax.ShapeDtypeStruct((1, o), _F32),
        ),
        interpret=interpret,
    )(x, ws, b2, dy)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv_in_relu(x, w, b, interpret: bool | None = None):
    """Fused ``relu(instance_norm(conv1d(x, w, b, padding=1)))``.

    x (N, C_in, T); w (O, C_in, 3) / b (O,) in the torch layouts of
    scgrhc.ops.nn.  First-order differentiable (generator training path);
    not for use under a second-order gradient.
    """
    ws = jnp.moveaxis(w, 2, 0)  # tap-major: lane dim = C_in, not 3
    return _fwd_call(x, ws, b.reshape(1, -1), _auto_interpret(interpret))


def _cir_fwd(x, w, b, interpret):
    return conv_in_relu(x, w, b, interpret), (x, w, b)


def _cir_bwd(interpret, res, dy):
    x, w, b = res
    ws = jnp.moveaxis(w, 2, 0)
    dx, dws, db2 = _bwd_call(
        x, ws, b.reshape(1, -1), dy, _auto_interpret(interpret)
    )
    return (
        dx,
        jnp.moveaxis(dws, 0, 2).astype(w.dtype),
        db2[0].astype(b.dtype),
    )


conv_in_relu.defvjp(_cir_fwd, _cir_bwd)


def conv_block_fused(p, x, interpret: bool | None = None):
    """Drop-in fused version of the generator's double-conv block
    (scgrhc.models.generator._conv_block_apply)."""
    h = conv_in_relu(x, p["conv1"]["w"], p["conv1"]["b"], interpret)
    return conv_in_relu(h, p["conv2"]["w"], p["conv2"]["b"], interpret)
