"""Fused Pallas DSP kernel: window gating + normalization in one HBM pass.

The reference's per-segment pipeline makes ~5 separate passes over every
window on host: pandas rolling max/min flat-line scan (waveform_noise.py:
10-13), sklearn line-fit R² (waveform_noise.py:29-34), range check
(waveform_noise.py:37-41), then per-segment min-max normalization
(recordutil.py:41-47).  This kernel fuses all of it: each grid program
pulls a block of windows HBM→VMEM once and emits the keep-mask, the
normalized SCG/RHC windows, and the per-window min/max — one read, one
write, VPU-resident in between.

Decision semantics match :mod:`scgrhc.dsp.noise` (including the
``>= 2`` flat-window quirk).  The host float64 path remains the
bit-exact dataset-build reference; this kernel is the float32
training/streaming-scale path (gate thresholds are scale-level, so
decisions only differ for windows sitting exactly on a threshold).

The sliding 50-sample max/min is computed as a statically-unrolled
shift-max over the window axis — 2×49 VPU max ops per block, no
reduce_window lowering needed inside the kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scgrhc.data.store import NORM_EPS
from scgrhc.dsp.noise import FLAT_THRESHOLD, FLAT_WINDOW_S, R2_THRESHOLD

WINDOWS_PER_BLOCK = 8  # f32 sublane tile


def _gate_norm_kernel(
    scg_ref, rhc_ref, scg_out, rhc_out, keep_out, mm_scg_out, mm_rhc_out,
    *, t: int, win: int, min_rhc: float
):
    rhc = rhc_ref[:]  # (W, T)
    scg = scg_ref[:]  # (W, C*T) — flattened: Mosaic's layout inference
    # mishandles 3-D reshapes, and the joint (C, T) min/max only needs 2-D

    # -- flat-line scan: sliding max-min over `win` samples ------------------
    # Log-step doubling (sparse-table): build power-of-two window maxes,
    # then combine two overlapping blocks — O(log win) VPU ops instead of
    # O(win); a naive 49-step unroll blows up Mosaic compile time.
    valid = t - win + 1
    m_max, m_min, cur = rhc, rhc, 1
    while cur * 2 <= win:
        m_max = jnp.maximum(m_max[:, : t - 2 * cur + 1], m_max[:, cur:])
        m_min = jnp.minimum(m_min[:, : t - 2 * cur + 1], m_min[:, cur:])
        cur *= 2
    off = win - cur  # overlap: [i, i+cur) ∪ [i+off, i+win) = [i, i+win)
    s_max = jnp.maximum(m_max[:, :valid], m_max[:, off : off + valid])
    s_min = jnp.minimum(m_min[:, :valid], m_min[:, off : off + valid])
    flat_count = jnp.sum(
        ((s_max - s_min) < FLAT_THRESHOLD).astype(jnp.int32), axis=-1
    )
    flat = flat_count >= 2

    # -- straight-line R² (closed-form OLS vs sample index) ------------------
    # tpu.iota is integer-only; cast after (guide: "Iota (Index Generation)")
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, t), dimension=1).astype(jnp.float32)
    xc = idx - (t - 1) / 2.0
    sxx = jnp.sum(xc * xc)
    yc = rhc - jnp.mean(rhc, axis=-1, keepdims=True)
    num = jnp.sum(yc * xc, axis=-1)
    syy = jnp.sum(yc * yc, axis=-1)
    denom = sxx * syy
    r2 = jnp.where(denom > 0, (num * num) / jnp.where(denom > 0, denom, 1.0), 1.0)
    straight = r2 > R2_THRESHOLD

    # -- range gate ----------------------------------------------------------
    below = jnp.any(rhc < min_rhc, axis=-1)

    keep_out[:] = jnp.logical_not(flat | straight | below)[:, None].astype(jnp.int32)

    # -- per-window min-max normalization (reference: recordutil.py:41-47) ---
    rhc_lo = jnp.min(rhc, axis=-1, keepdims=True)
    rhc_hi = jnp.max(rhc, axis=-1, keepdims=True)
    rhc_out[:] = (rhc - rhc_lo) / (rhc_hi - rhc_lo + NORM_EPS)
    mm_rhc_out[:] = jnp.concatenate((rhc_lo, rhc_hi), axis=-1)

    scg_lo = jnp.min(scg, axis=-1, keepdims=True)  # joint over (C, T)
    scg_hi = jnp.max(scg, axis=-1, keepdims=True)
    scg_out[:] = (scg - scg_lo) / (scg_hi - scg_lo + NORM_EPS)
    mm_scg_out[:] = jnp.concatenate((scg_lo, scg_hi), axis=-1)


@partial(jax.jit, static_argnames=("min_rhc", "sampling_rate", "interpret"))
def gate_and_normalize(
    scg_windows,
    rhc_windows,
    min_rhc: float,
    sampling_rate: int = 500,
    interpret: bool | None = None,
):
    """Fused gate + normalize over framed windows.

    scg_windows (N, C, T), rhc_windows (N, T) float32 →
    (keep (N,) bool, scg_norm (N, C, T), rhc_norm (N, T),
     mm_scg (N, 2), mm_rhc (N, 2)).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, c, t = scg_windows.shape
    win = int(FLAT_WINDOW_S * sampling_rate)
    W = WINDOWS_PER_BLOCK
    n_pad = -(-n // W) * W
    scg_flat = scg_windows.reshape(n, c * t)  # kernel works on 2-D blocks
    if n_pad != n:
        scg_flat = jnp.pad(scg_flat, ((0, n_pad - n), (0, 0)))
        # pad rhc with 1.0 so padded windows are harmlessly "flat-gated"
        rhc_windows = jnp.pad(
            rhc_windows, ((0, n_pad - n), (0, 0)), constant_values=1.0
        )

    grid = (n_pad // W,)
    kernel = partial(_gate_norm_kernel, t=t, win=win, min_rhc=float(min_rhc))
    scg_n, rhc_n, keep, mm_scg, mm_rhc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((W, c * t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((W, c * t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, c * t), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, t), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 2), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 2), jnp.float32),
        ),
        interpret=interpret,
    )(scg_flat.astype(jnp.float32), rhc_windows.astype(jnp.float32))

    return (
        keep[:n, 0].astype(bool),
        scg_n[:n].reshape(n, c, t),
        rhc_n[:n],
        mm_scg[:n],
        mm_rhc[:n],
    )


def _norm_kernel(w_ref, out_ref):
    w = w_ref[:]  # (W, C*T) — joint (C, T) min/max needs only 2-D
    lo = jnp.min(w, axis=-1, keepdims=True)
    hi = jnp.max(w, axis=-1, keepdims=True)
    out_ref[:] = (w - lo) / (hi - lo + NORM_EPS)


@partial(jax.jit, static_argnames=("interpret",))
def normalize_windows(w, interpret: bool | None = None):
    """Fused per-window joint min-max normalization (no gate).

    w (N, C, T) float32 → (N, C, T): one HBM read + one write per window,
    vs the jnp path's separate reduce + broadcast-elementwise passes.
    Inference-side counterpart of :func:`gate_and_normalize`
    (reference norm: recordutil.py:41-47; min/max joint over (C, T)).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, c, t = w.shape
    W = WINDOWS_PER_BLOCK
    n_pad = -(-n // W) * W
    flat = w.reshape(n, c * t)
    if n_pad != n:
        flat = jnp.pad(flat, ((0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        _norm_kernel,
        grid=(n_pad // W,),
        in_specs=[
            pl.BlockSpec((W, c * t), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (W, c * t), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, c * t), jnp.float32),
        interpret=interpret,
    )(flat.astype(jnp.float32))
    return out[:n].reshape(n, c, t)


def segment_record_on_device(
    scg_signal, rhc_signal, segment_samples: int, min_rhc: float, **kw
):
    """Frame a whole interval and run the fused kernel.

    scg_signal (L, C), rhc_signal (L,) → same returns as
    :func:`gate_and_normalize` plus the (N,) window start indices.
    Framing is a free reshape (non-overlapping windows, tail truncated —
    reference: recordutil.py:136-148).
    """
    L = scg_signal.shape[0]
    num = L // segment_samples
    if num == 0:
        z = np.zeros(0)
        return z.astype(bool), z, z, z, z, z.astype(np.int64)
    total = num * segment_samples
    scg_w = jnp.asarray(scg_signal[:total]).reshape(num, segment_samples, -1)
    scg_w = scg_w.transpose(0, 2, 1)  # (N, C, T)
    rhc_w = jnp.asarray(rhc_signal[:total]).reshape(num, segment_samples)
    keep, scg_n, rhc_n, mm_s, mm_r = gate_and_normalize(
        scg_w, rhc_w, min_rhc, **kw
    )
    starts = np.arange(num, dtype=np.int64) * segment_samples
    return keep, scg_n, rhc_n, mm_s, mm_r, starts
