"""Second-order-capable fused conv1d(k3,p1)+bias[+InstanceNorm][+ReLU]
layers for the WGAN critic, in a channel-major flat layout.

Why (round-2 VERDICT #1): the WGAN-GP step is HBM-bandwidth-bound and the
critic side — whose activations cross HBM once per XLA pass under the
second-order gradient penalty (scgrhc.train.wgan:141-155; reference
semantics /root/reference/waveform_train.py:249-286) — had no fused-kernel
path: the round-2 generator kernel (ops/pallas/conv_block.py) is
first-order-only and its per-sample grid measured −17%.

Design differences vs that kernel:

* **Flat layout.**  The whole critic runs on ``(C, B·T̂)`` 2-D arrays —
  samples concatenated along the lane axis, each padded from T to
  ``T̂ = roundup128(T)`` columns (750 → 768, +2.4%) — so a layer is ONE
  matmul chain ``Σ_tap W_tap · shift_tap(x)`` over all samples at once
  instead of a per-sample grid, and every ``S·T̂`` column tile satisfies
  Mosaic's lane-divisibility rule.  The ≥1 zero pad column between
  samples supplies the conv's padding=1 zeros AND isolates neighboring
  samples from the shifts (no boundary masks needed); kernels zero their
  outputs' pad columns so the invariant holds layer to layer.
  InstanceNorm's per-(sample, channel) statistics are computed with
  block-diagonal selector matmuls (no in-kernel 3-D reshapes — Mosaic
  layout-inference gotcha).  The layout transform happens once on the
  tiny critic *input* (≤10 channels), not per layer.
* **Multi-sample column tiles.**  The grid walks ``S·T̂``-column tiles
  (``S`` samples per program, chosen per layer from a VMEM estimate and
  dividing B); weights use a constant index map, so Mosaic fetches them
  once, not per tile.
* **Second-order capable.**  ``layer`` is a ``custom_vjp`` whose backward
  calls two further ``custom_vjp`` ops — ``bwd_dx`` (input gradient: the
  gradient-penalty hot path) and ``bwd_dwdb`` (parameter gradients) —
  each a recompute-style fused kernel.  Their OWN backwards (the
  second-order core that ``jax.grad``-of-``jax.grad`` reaches through the
  gradient penalty) are ``jax.vjp`` of a plain-jnp reference
  implementation of the same math, so XLA differentiates them exactly;
  only the first-order hot paths run Pallas.  Splitting dx from dw/db
  lets XLA dead-code-eliminate the parameter-gradient kernel inside the
  GP's input-gradient pass (where only dx is consumed).

Numerics: matmuls accumulate f32 (``preferred_element_type``),
InstanceNorm statistics are f32 with the one-pass E[x²]−mean² form and
biased variance (torch ``nn.InstanceNorm1d`` parity, scgrhc.ops.nn), and
outputs cast back to the input dtype.

Modes per critic layer (reference critic: waveform_train.py:198-246):
``relu`` (first conv, no norm), ``in_relu`` (hidden convs), ``linear``
(final score conv).

MEASURED OUTCOME (v5e chip, bf16, B=64, amortized per-iteration — full
table and step decomposition in BENCH.md): the fused forward essentially
ties XLA (2.19 vs 1.95 ms — XLA's conv+IN+relu schedule already matches
a hand-fused single-HBM-pass kernel here), the recompute-style backward
loses 2× (4.92 vs 2.41 ms: bwd_dx and bwd_dwdb each re-run the conv,
doubling MXU work where XLA reuses saved activations), and the
reference-vjp second-order path loses 5× (20.7 vs 3.9 ms).  End-to-end
WGAN-GP step: 895 vs 2,060 seg/s/chip.  ``critic_backend: "fused"`` is
therefore a documented measured-negative opt-in, and — decisively — the
same measurement campaign showed the critic is only ~35% of the step
(the generator side is ~62%), closing round-2 VERDICT #1's premise.
Correctness (the second-order custom_vjp architecture) is fully tested
(tests/test_critic_fused.py) and the design is the template to reuse if
a future workload IS critic-bound.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scgrhc.ops.nn import IN_EPS

from scgrhc.ops.pallas.common import auto_interpret as _auto_interpret
from scgrhc.ops.pallas.common import conv3 as _conv3_flat
from scgrhc.ops.pallas.common import conv3_t as _conv3_flat_t
from scgrhc.ops.pallas.common import shift_l as _shift_l
from scgrhc.ops.pallas.common import shift_r as _shift_r

_F32 = jnp.float32

MODES = ("linear", "relu", "in_relu")


def pad_t(t: int) -> int:
    """Per-sample padded column count: the next multiple of 128 STRICTLY
    greater than t, so (a) every S·T̂ tile obeys Mosaic's lane rule and
    (b) at least one zero column separates samples (conv isolation)."""
    return (t // 128 + 1) * 128


def _valid_mask(cols: int, t: int, tp: int):
    """(1, cols) f32 mask of real (non-pad) columns."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1)
    return ((idx % tp) < t).astype(_F32)


def _selector(cols: int, s: int, t: int, tp: int):
    """(cols, S) 0/1 block-diagonal selector: column j → sample j // T̂,
    excluding pad columns.  Per-sample reductions/broadcasts become
    matmuls (MXU) instead of 3-D reshapes (Mosaic layout gotcha); the
    broadcast side also auto-zeroes pad columns."""
    row = jax.lax.broadcasted_iota(jnp.int32, (cols, s), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (cols, s), 1)
    return ((row // tp == col) & (row % tp < t)).astype(_F32)


def _per_sample_mean(v, sel, t: int):
    """(O, cols) → per-sample mean broadcast back to (O, cols) (zero at
    pad columns), via two selector matmuls."""
    sums = jnp.dot(v, sel, preferred_element_type=_F32)  # (O, S)
    return jax.lax.dot_general(
        sums / t, sel,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=_F32,
    )


def _in_stats_flat(c, sel, t: int):
    """One-pass per-(sample, channel) IN statistics in the flat layout:
    (mean, rsig) broadcast to (O, cols) f32, zero at pad columns."""
    mean = _per_sample_mean(c, sel, t)
    msq = _per_sample_mean(c * c, sel, t)
    var = jnp.maximum(msq - mean * mean, 0.0)
    rsig = jax.lax.rsqrt(var + IN_EPS)
    return mean, rsig


def _activation(c, sel, valid, t: int, mode: str):
    """conv output (O, cols) f32 → layer output, with pad columns zeroed
    (the next layer's shifts read them as conv padding)."""
    if mode == "in_relu":
        mean, rsig = _in_stats_flat(c, sel, t)
        y = jnp.maximum((c - mean) * rsig, 0.0)
    elif mode == "relu":
        y = jnp.maximum(c, 0.0)
    else:
        y = c
    return y * valid


def _dc_from_dy(dy, c, sel, valid, t: int, mode: str):
    """Cotangent at the conv output (zero at pad columns): ReLU/IN
    backward in f32.

    IN backward (biased variance, no affine):
    ``dc = rsig · (g − mean_T(g) − x̂ · mean_T(g·x̂))`` with per-sample
    means; matches jax.vjp of the reference forward."""
    dy = dy * valid
    if mode == "linear":
        return dy
    if mode == "relu":
        return dy * (c > 0)
    mean, rsig = _in_stats_flat(c, sel, t)
    xhat = (c - mean) * rsig
    g = dy * (xhat > 0)
    return rsig * (
        g
        - _per_sample_mean(g, sel, t)
        - xhat * _per_sample_mean(g * xhat, sel, t)
    ) * valid


# -- reference (plain-jnp) implementation: the second-order oracle -----------


def _ref_fwd(x, w3, b2, t: int, tp: int, mode: str):
    """Flat-layout forward as ordinary jnp ops — same math as the Pallas
    forward kernel.  ``jax.vjp`` of this function (and of its vjp) is the
    exact backward/second-order semantics the kernels implement; the
    custom_vjp wiring below routes all second-order traversals here."""
    cols = x.shape[1]
    s = cols // tp
    c = _conv3_flat(w3, x) + b2.astype(_F32).reshape(-1, 1)
    y = _activation(c, _selector(cols, s, t, tp), _valid_mask(cols, t, tp),
                    t, mode)
    return y.astype(x.dtype)


def _ref_bwd_dx(x, w3, b2, dy, t: int, tp: int, mode: str):
    _, vjp = jax.vjp(lambda xx: _ref_fwd(xx, w3, b2, t, tp, mode), x)
    return vjp(dy)[0]


def _ref_bwd_dwdb(x, w3, b2, dy, t: int, tp: int, mode: str):
    _, vjp = jax.vjp(lambda ww, bb: _ref_fwd(x, ww, bb, t, tp, mode), w3, b2)
    return vjp(dy)


# -- Pallas kernels ----------------------------------------------------------


def _fwd_kernel(x_ref, w_ref, b_ref, y_ref, *, t, tp, s, mode):
    x = x_ref[...]  # (C, S·T̂)
    cols = x.shape[1]
    c = _conv3_flat(w_ref[...], x) + b_ref[...].astype(_F32).reshape(-1, 1)
    y = _activation(c, _selector(cols, s, t, tp), _valid_mask(cols, t, tp),
                    t, mode)
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_dx_kernel(x_ref, w_ref, b_ref, dy_ref, dx_ref, *, t, tp, s, mode):
    x = x_ref[...]
    w3 = w_ref[...]
    cols = x.shape[1]
    sel = _selector(cols, s, t, tp)
    valid = _valid_mask(cols, t, tp)
    # recompute the conv output in VMEM (recompute beats saving/reloading
    # residuals on a bandwidth-bound step)
    c = _conv3_flat(w3, x) + b_ref[...].astype(_F32).reshape(-1, 1)
    dc = _dc_from_dy(dy_ref[...].astype(_F32), c, sel, valid, t, mode)
    # NOTE: dx is NOT masked at pad columns — the reference vjp propagates
    # gradient into them (a pad column of x feeds its neighbors' conv
    # outputs), and exact agreement with _ref_bwd_dx is what keeps the
    # second-order path consistent; upstream consumers mask pads anyway.
    dx_ref[...] = _conv3_flat_t(w3, dc.astype(x.dtype)).astype(dx_ref.dtype)


def _bwd_dwdb_kernel(x_ref, w_ref, b_ref, dy_ref, dw_ref, db_ref,
                     *, t, tp, s, mode):
    j = pl.program_id(0)
    x = x_ref[...]
    cols = x.shape[1]
    sel = _selector(cols, s, t, tp)
    c = _conv3_flat(w_ref[...], x) + b_ref[...].astype(_F32).reshape(-1, 1)
    dc = _dc_from_dy(
        dy_ref[...].astype(_F32), c, sel, _valid_mask(cols, t, tp), t, mode
    )

    dcd = dc.astype(x.dtype)
    wdot = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),  # contract columns
        preferred_element_type=_F32,
    )
    # dc is zero at pad columns, so the pad region contributes nothing
    dw = jnp.stack((wdot(dcd, _shift_r(x)), wdot(dcd, x), wdot(dcd, _shift_l(x))))
    db = jnp.sum(dc, axis=1, keepdims=True).T  # (1, O)

    @pl.when(j == 0)
    def _init():
        dw_ref[...] = dw
        db_ref[...] = db

    @pl.when(j != 0)
    def _acc():
        dw_ref[...] += dw
        db_ref[...] += db


def _esize(dtype) -> int:
    return jnp.dtype(dtype).itemsize


def _pick_s(o: int, c: int, tp: int, n: int, dtype, budget=8 * 2**20) -> int:
    """Samples per program: the largest divisor of the batch whose
    bwd-pass VMEM footprint estimate stays under ``budget`` (f32
    intermediates dominate; weights excluded — constant blocks are
    fetched once)."""
    e = _esize(dtype)
    per_col = 4 * c * e + 2 * o * e + 3 * o * 4
    s_max = max(1, budget // max(1, per_col * tp))
    for s in range(min(s_max, n), 0, -1):
        if n % s == 0:
            return s
    return 1


def _call(kernel, x, w3, b2, extra, out_shapes, cols: int, interpret):
    """Shared pallas_call builder: grid over S·T̂-column tiles; weights and
    bias use constant index maps (single fetch)."""
    cflat, cols_total = x.shape
    o = w3.shape[1]
    grid = (cols_total // cols,)
    in_specs = [
        pl.BlockSpec((cflat, cols), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, o, cflat), lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, o), lambda j: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x, w3, b2]
    for arr, ch in extra:  # e.g. dy with its channel count
        in_specs.append(
            pl.BlockSpec((ch, cols), lambda j: (0, j), memory_space=pltpu.VMEM)
        )
        operands.append(arr)
    out_specs, out_shape = [], []
    for shape, dtype, tiled in out_shapes:
        if tiled:  # activation-shaped: tile over columns
            out_specs.append(
                pl.BlockSpec(
                    (shape[0], cols), lambda j: (0, j), memory_space=pltpu.VMEM
                )
            )
        else:  # accumulator (weights/bias grads): constant block
            out_specs.append(
                pl.BlockSpec(
                    shape,
                    lambda j, nd=len(shape): (0,) * nd,  # bind nd NOW (the
                    # loop would otherwise late-bind every lambda to db's)
                    memory_space=pltpu.VMEM,
                )
            )
        out_shape.append(jax.ShapeDtypeStruct(shape, dtype))
    single = len(out_shape) == 1
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs[0] if single else tuple(out_specs),
        out_shape=out_shape[0] if single else tuple(out_shape),
        interpret=interpret,
    )(*operands)


@lru_cache(maxsize=None)
def _make_layer(o: int, c: int, t: int, tp: int, s: int, mode: str,
                interpret: bool):
    """Build the custom_vjp'd fused layer for one static configuration.

    Cached so repeated traces reuse the same function objects (jit caches
    by identity).  ``layer(x, w3, b2)``: x (C, B·T̂), w3 (3, O, C)
    tap-major, b2 (1, O) → (O, B·T̂).
    """
    kw = dict(t=t, tp=tp, s=s, mode=mode)
    cols = s * tp

    def fwd_call(x, w3, b2):
        return _call(
            partial(_fwd_kernel, **kw), x, w3, b2, [],
            [((o, x.shape[1]), x.dtype, True)], cols, interpret,
        )

    def bwd_dx_call(x, w3, b2, dy):
        return _call(
            partial(_bwd_dx_kernel, **kw), x, w3, b2, [(dy, o)],
            [((c, x.shape[1]), x.dtype, True)], cols, interpret,
        )

    def bwd_dwdb_call(x, w3, b2, dy):
        return _call(
            partial(_bwd_dwdb_kernel, **kw), x, w3, b2, [(dy, o)],
            [((3, o, c), _F32, False), ((1, o), _F32, False)], cols, interpret,
        )

    @jax.custom_vjp
    def bwd_dx(x, w3, b2, dy):
        return bwd_dx_call(x, w3, b2, dy)

    def bwd_dx_fwd(x, w3, b2, dy):
        return bwd_dx(x, w3, b2, dy), (x, w3, b2, dy)

    def bwd_dx_bwd(res, ct):
        # SECOND-order core (grad-of-GP w.r.t. critic params): exact XLA
        # autodiff of the reference implementation of this op
        x, w3, b2, dy = res
        _, vjp = jax.vjp(
            lambda *a: _ref_bwd_dx(*a, t=t, tp=tp, mode=mode), x, w3, b2, dy
        )
        return vjp(ct)

    bwd_dx.defvjp(bwd_dx_fwd, bwd_dx_bwd)

    @jax.custom_vjp
    def bwd_dwdb(x, w3, b2, dy):
        return bwd_dwdb_call(x, w3, b2, dy)

    def bwd_dwdb_fwd(x, w3, b2, dy):
        return bwd_dwdb(x, w3, b2, dy), (x, w3, b2, dy)

    def bwd_dwdb_bwd(res, cts):
        x, w3, b2, dy = res
        _, vjp = jax.vjp(
            lambda *a: _ref_bwd_dwdb(*a, t=t, tp=tp, mode=mode), x, w3, b2, dy
        )
        return vjp(cts)

    bwd_dwdb.defvjp(bwd_dwdb_fwd, bwd_dwdb_bwd)

    @jax.custom_vjp
    def layer(x, w3, b2):
        return fwd_call(x, w3, b2)

    def layer_fwd(x, w3, b2):
        return layer(x, w3, b2), (x, w3, b2)

    def layer_bwd(res, dy):
        x, w3, b2 = res
        dx = bwd_dx(x, w3, b2, dy)
        dw3, db2 = bwd_dwdb(x, w3, b2, dy)
        return dx, dw3.astype(w3.dtype), db2.astype(b2.dtype)

    layer.defvjp(layer_fwd, layer_bwd)
    return layer


def fused_layer(x, w, b, t: int, n: int, mode: str,
                interpret: bool | None = None):
    """Apply one fused critic layer in the flat padded layout.

    x (C, n·pad_t(t)); w (O, C, 3) / b (O,) in the torch layouts of
    scgrhc.ops.nn; returns (O, n·pad_t(t)) with pad columns zeroed.
    Twice-differentiable (the second-order path runs the XLA reference
    vjp — see module docstring).
    """
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
    o, c = w.shape[0], w.shape[1]
    tp = pad_t(t)
    if x.shape[1] != n * tp:
        raise ValueError(
            f"flat input has {x.shape[1]} columns, want n*pad_t(t) = {n * tp}"
        )
    s = _pick_s(o, c, tp, n, x.dtype)
    op = _make_layer(o, c, t, tp, s, mode, _auto_interpret(interpret))
    return op(x, jnp.moveaxis(w, 2, 0), b.reshape(1, -1))


def to_flat(x, t: int):
    """(N, C, T) → (C, N·pad_t(T)) channel-major flat layout (zero pad
    columns between samples)."""
    n, c0, _ = x.shape
    tp = pad_t(t)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, tp - t)))
    return xp.transpose(1, 0, 2).reshape(c0, n * tp)


def from_flat(h, n: int, t: int):
    """(C, N·pad_t(T)) → (N, C, T) (drops pad columns)."""
    c0 = h.shape[0]
    tp = pad_t(t)
    return h.reshape(c0, n, tp).transpose(1, 0, 2)[..., :t]
