"""Noise/artifact gate for RHC pressure segments.

Reproduces the reference gate's decisions exactly (reference:
waveform_noise.py:6-49) but as branchless vectorized math instead of
pandas-rolling + sklearn-fit per segment, so it can run batched on device:

1. **Flat lines** — the reference computes a 50-sample (0.1 s at 500 Hz)
   rolling max−min and collects indices where it is < 1e-3
   (waveform_noise.py:10-13).  Its segment-building loop has a quirk: with
   exactly ONE flat window it returns no segments (`range(len-1)` is empty,
   waveform_noise.py:17-24), so the gate fires iff **two or more** windows
   are flat.  We reproduce that: ``flat_count >= 2``.
2. **Straight line** — OLS R² of the segment against sample index > 0.8
   (waveform_noise.py:29-34).  For simple linear regression R² equals the
   squared Pearson correlation with the index, giving a closed form with no
   solver.  A zero-variance segment is treated as a straight line (it is
   also always caught by rule 1).
3. **Range** — any sample below ``params.min_RHC`` (waveform_noise.py:37-41).

Both a NumPy host path (dataset build) and a JAX path (batched, jittable,
used by the on-device segmentation pipeline) are provided; they share
decision semantics bit-for-bit on float64 inputs.
"""

from __future__ import annotations

import numpy as np

FLAT_THRESHOLD = 1e-3
FLAT_WINDOW_S = 0.1
R2_THRESHOLD = 0.8


def _flat_window_count_np(waveform: np.ndarray, min_samples: int) -> int:
    if waveform.shape[-1] < min_samples:
        return 0
    w = np.lib.stride_tricks.sliding_window_view(waveform, min_samples, axis=-1)
    rng = w.max(axis=-1) - w.min(axis=-1)
    return int(np.count_nonzero(rng < FLAT_THRESHOLD))


def _r_squared_np(waveform: np.ndarray) -> float:
    n = waveform.shape[-1]
    x = np.arange(n, dtype=np.float64)
    y = np.asarray(waveform, dtype=np.float64)
    xc = x - x.mean()
    yc = y - y.mean()
    denom = np.dot(xc, xc) * np.dot(yc, yc)
    if denom == 0.0:
        return 1.0  # constant segment: degenerate fit, treat as straight
    r = np.dot(xc, yc) / np.sqrt(denom)
    return float(r * r)


def get_flat_lines(
    waveform: np.ndarray,
    threshold: float = FLAT_THRESHOLD,
    min_duration: float = FLAT_WINDOW_S,
    sampling_rate: int = 500,
) -> list[tuple[int, int]]:
    """API-parity port of the reference's flat-segment lister
    (reference: waveform_noise.py:6-26), without pandas.

    Windows are indexed by their right edge like pandas ``rolling`` (the
    NaN head never compares < threshold).  The segment-building loop —
    including its quirks: the in-loop duplicate ``(start, last)`` appends
    and the empty result for exactly one flat window — is reproduced
    verbatim so outputs match element for element.
    """
    min_samples = int(min_duration * sampling_rate)
    n = np.asarray(waveform).shape[-1]
    if n < min_samples:
        return []
    w = np.lib.stride_tricks.sliding_window_view(waveform, min_samples, axis=-1)
    rng_v = w.max(axis=-1) - w.min(axis=-1)
    flat_indices = (np.nonzero(rng_v < threshold)[0] + min_samples - 1).tolist()

    flat_segments: list[tuple[int, int]] = []
    start = None
    for i in range(len(flat_indices) - 1):
        if start is None:
            start = flat_indices[i]
        if flat_indices[i + 1] != flat_indices[i] + 1:
            flat_segments.append((start, flat_indices[i]))
            start = None
        if start is not None:
            flat_segments.append((start, flat_indices[-1]))
    return flat_segments


def has_flat_lines(waveform: np.ndarray, sampling_rate: int = 500) -> bool:
    min_samples = int(FLAT_WINDOW_S * sampling_rate)
    return _flat_window_count_np(waveform, min_samples) >= 2


def is_straight_line(waveform: np.ndarray) -> bool:
    return _r_squared_np(waveform) > R2_THRESHOLD


def in_rhc_range(min_rhc: float, waveform: np.ndarray) -> bool:
    return not bool(np.any(np.asarray(waveform) < min_rhc))


def has_noise(params, waveform: np.ndarray) -> bool:
    """Reference-compatible gate (waveform_noise.py:44-49)."""
    return (
        has_flat_lines(waveform)
        or is_straight_line(waveform)
        or not in_rhc_range(params.min_RHC, waveform)
    )


# --------------------------------------------------------------------------
# Batched JAX path: gate many segments at once on device.
# --------------------------------------------------------------------------


def has_noise_batch_jax(waveforms, min_rhc: float, sampling_rate: int = 500):
    """Vector gate over (N, T) segments → (N,) bool, jit/vmap-friendly.

    Same decisions as :func:`has_noise`; rolling max/min via
    ``lax.reduce_window`` (the XLA-fusable analog of the reference's pandas
    rolling, waveform_noise.py:10-11).
    """
    import jax.numpy as jnp
    from jax import lax

    x = jnp.asarray(waveforms)
    n, t = x.shape
    win = int(FLAT_WINDOW_S * sampling_rate)

    roll_max = lax.reduce_window(
        x, -jnp.inf, lax.max, (1, win), (1, 1), "VALID"
    )
    roll_min = lax.reduce_window(
        x, jnp.inf, lax.min, (1, win), (1, 1), "VALID"
    )
    flat_count = jnp.sum((roll_max - roll_min) < FLAT_THRESHOLD, axis=-1)
    flat = flat_count >= 2

    idx = jnp.arange(t, dtype=x.dtype)
    xc = idx - idx.mean()
    yc = x - x.mean(axis=-1, keepdims=True)
    num = yc @ xc
    denom = jnp.sum(xc * xc) * jnp.sum(yc * yc, axis=-1)
    r2 = jnp.where(denom > 0, (num * num) / jnp.where(denom > 0, denom, 1.0), 1.0)
    straight = r2 > R2_THRESHOLD

    below = jnp.any(x < min_rhc, axis=-1)
    return flat | straight | below
