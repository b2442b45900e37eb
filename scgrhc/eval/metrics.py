"""On-device evaluation metrics (reference: waveform_test.py:28-50).

The reference computes, per segment, scipy ``pearsonr`` (+ its default
Fisher-z 95% CI) and ``sqrt(mean_squared_error)`` with a t-distribution CI
on ``se = sqrt(rmse / 2n)``.  Here the same formulas run batched on device:
one fused XLA computation scores every segment of a split at once instead
of a per-segment Python loop.

CI critical values depend only on the (static) segment length, so they are
computed once on host with scipy and closed over as constants.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def t_crit_975(df: int) -> float:
    """t.ppf(0.975, df) (reference: waveform_test.py:45-46)."""
    from scipy.stats import t

    return float(t.ppf(0.975, df=df))


# norm.ppf(0.975): scipy pearsonr confidence_interval's z_crit.
Z_CRIT_975 = 1.959963984540054


def pearson_r(x, y, axis=-1):
    """Row-wise Pearson correlation (reference: waveform_test.py:28-36).

    Centered accumulation in float32 matches scipy's float64 result to
    ~1e-6 relative for 750-sample segments.
    """
    x = x - jnp.mean(x, axis=axis, keepdims=True)
    y = y - jnp.mean(y, axis=axis, keepdims=True)
    num = jnp.sum(x * y, axis=axis)
    den = jnp.sqrt(jnp.sum(x * x, axis=axis) * jnp.sum(y * y, axis=axis))
    return num / den


def pearson_ci95(r, n: int):
    """Fisher-z 95% CI — scipy ``pearsonr(...).confidence_interval(0.95)``'s
    default method (reference: waveform_test.py:34-35)."""
    r = jnp.clip(r, -1.0 + 1e-12, 1.0 - 1e-12)
    zr = jnp.arctanh(r)
    se = 1.0 / np.sqrt(n - 3)
    return jnp.tanh(zr - Z_CRIT_975 * se), jnp.tanh(zr + Z_CRIT_975 * se)


def rmse(x, y, axis=-1):
    """Root mean squared error (reference: waveform_test.py:43)."""
    return jnp.sqrt(jnp.mean(jnp.square(x - y), axis=axis))


def rmse_ci95(rmse_val, n: int):
    """t-distribution CI on se = sqrt(rmse / 2n)
    (reference: waveform_test.py:44-49)."""
    se = jnp.sqrt(rmse_val / (2 * n))
    tc = t_crit_975(n - 1)
    return rmse_val - tc * se, rmse_val + tc * se


def segment_scores(x, y):
    """All six reference metric columns for a batch of paired waveforms.

    x, y: (B, T) real / predicted (denormalized).  Returns a dict of (B,)
    arrays with the reference CSV column names (waveform_test.py:72-85).
    """
    n = x.shape[-1]
    r = pearson_r(x, y)
    r_lo, r_hi = pearson_ci95(r, n)
    e = rmse(x, y)
    e_lo, e_hi = rmse_ci95(e, n)
    return {
        "pcc_r": r,
        "pcc_ci95_lower": r_lo,
        "pcc_ci95_upper": r_hi,
        "rmse": e,
        "rmse_ci95_lower": e_lo,
        "rmse_ci95_upper": e_hi,
    }


def global_scores(x, y):
    """One global PCC/RMSE over concatenated segments
    (reference: waveform_checkpoint.py:32-39).  x, y: flat 1-D arrays.

    Host-side in float64 — this is the checkpoint-selection path, where the
    argmax over checkpoints must reproduce the reference's (scipy float64)
    choice exactly; the arrays come off a CSV round-trip anyway.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = x.shape[-1]
    xc = x - x.mean()
    yc = y - y.mean()
    r = float((xc @ yc) / np.sqrt((xc @ xc) * (yc @ yc)))
    se_z = 1.0 / np.sqrt(n - 3)
    zr = np.arctanh(max(min(r, 1.0 - 1e-15), -1.0 + 1e-15))
    e = float(np.sqrt(np.mean(np.square(x - y))))
    se = np.sqrt(e / (2 * n))
    tc = t_crit_975(n - 1)
    return {
        "pcc_r": r,
        "pcc_ci95_lower": float(np.tanh(zr - Z_CRIT_975 * se_z)),
        "pcc_ci95_upper": float(np.tanh(zr + Z_CRIT_975 * se_z)),
        "rmse": e,
        "rmse_ci95_lower": float(e - tc * se),
        "rmse_ci95_upper": float(e + tc * se),
    }
