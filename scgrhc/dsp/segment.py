"""Sliding-window segmentation of records into paired SCG/RHC segments.

Reference semantics (recordutil.py:122-149): for every chamber interval of
every record, slice the configured SCG channels plus ``RHC_pressure``, chop
into non-overlapping windows of ``segment_size * 500`` samples, and drop
windows whose RHC channel fails the noise gate.  ``start_idx``/``stop_idx``
are *interval-relative* window offsets, exactly as in the reference
(recordutil.py:143-144).

The heavy per-window work (rolling flat-line scan, R², range check) is done
for all windows of an interval at once via the vectorized gate in
:mod:`scgrhc.dsp.noise` instead of a Python loop per window.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from scgrhc.dsp.noise import (
    FLAT_THRESHOLD,
    FLAT_WINDOW_S,
    R2_THRESHOLD,
)
from scgrhc.io.catalog import (
    SAMPLE_FREQ,
    get_channels,
    get_record_names,
    read_record,
)
from scgrhc.io.sidecar import get_chamber_intervals


@dataclass
class Segment:
    """One paired SCG/RHC window (pre-normalization, time-major)."""

    scg: np.ndarray  # (T, C) float64
    rhc: np.ndarray  # (T, 1) float64
    record_name: str
    start_idx: int  # window start, relative to its chamber interval
    stop_idx: int

    def as_tuple(self):
        return (self.scg, self.rhc, self.record_name, self.start_idx, self.stop_idx)


def gate_windows(rhc_windows: np.ndarray, min_rhc: float) -> np.ndarray:
    """(N, T) RHC windows → (N,) keep-mask (True = clean), vectorized.

    Decision-identical to the reference's per-window ``has_noise``
    (waveform_noise.py:44-49, incl. the >=2-flat-window quirk).
    """
    n, t = rhc_windows.shape
    win = int(FLAT_WINDOW_S * SAMPLE_FREQ)
    keep = np.ones(n, dtype=bool)

    if t >= win:
        w = np.lib.stride_tricks.sliding_window_view(rhc_windows, win, axis=-1)
        rng = w.max(axis=-1) - w.min(axis=-1)
        flat = np.count_nonzero(rng < FLAT_THRESHOLD, axis=-1) >= 2
        keep &= ~flat

    x = np.arange(t, dtype=np.float64)
    xc = x - x.mean()
    yc = rhc_windows - rhc_windows.mean(axis=-1, keepdims=True)
    num = yc @ xc
    denom = np.dot(xc, xc) * np.einsum("nt,nt->n", yc, yc)
    r2 = np.where(denom > 0, np.square(num) / np.where(denom > 0, denom, 1.0), 1.0)
    keep &= ~(r2 > R2_THRESHOLD)

    keep &= ~np.any(rhc_windows < min_rhc, axis=-1)
    return keep


def segment_interval(
    scg_signal: np.ndarray,
    rhc_signal: np.ndarray,
    segment_samples: int,
    min_rhc: float,
    record_name: str,
) -> list[Segment]:
    """Chop one chamber interval's signals into clean windows."""
    num = scg_signal.shape[0] // segment_samples
    if num == 0:
        return []
    total = num * segment_samples
    rhc_windows = rhc_signal[:total, 0].reshape(num, segment_samples)
    keep = gate_windows(rhc_windows, min_rhc)
    # Invalid-sample handling (scgrhc extension): the WFDB reader maps
    # flagged-missing samples to NaN like wfdb.rdrecord; windows touching
    # one are dropped.  (The reference would crash here instead — sklearn's
    # LinearRegression inside has_noise rejects NaN, waveform_noise.py:31-33
    # — so dropping is the only useful semantics.)
    keep &= ~np.isnan(rhc_windows).any(axis=-1)
    scg_windows = scg_signal[:total].reshape(num, segment_samples, -1)
    keep &= ~np.isnan(scg_windows).any(axis=(1, 2))
    out = []
    for i in np.nonzero(keep)[0]:
        s = int(i) * segment_samples
        e = s + segment_samples
        out.append(Segment(scg_signal[s:e], rhc_signal[s:e], record_name, s, e))
    return out


def segment_interval_device(
    scg_signal: np.ndarray,
    rhc_signal: np.ndarray,
    segment_samples: int,
    min_rhc: float,
    record_name: str,
) -> list[Segment]:
    """Device-gated variant of :func:`segment_interval`.

    The noise gate (the expensive per-window work) runs as the fused
    Pallas kernel (scgrhc.ops.pallas.dsp); kept windows are then built
    from the raw host float64 arrays, so the emitted Segments — and every
    downstream artifact — are byte-identical to the host path's except
    for windows sitting exactly on a gate threshold (f32 gate).
    Select with ``"data_backend": "device"`` in params.json.
    """
    from scgrhc.ops.pallas.dsp import segment_record_on_device

    num = scg_signal.shape[0] // segment_samples
    if num == 0:
        return []
    keep, *_rest, starts = segment_record_on_device(
        scg_signal, rhc_signal[:, 0], segment_samples, min_rhc
    )
    keep = np.asarray(keep).copy()
    # same NaN (invalid-sample) drop as the host gate — see segment_interval
    total = num * segment_samples
    keep &= ~np.isnan(
        rhc_signal[:total, 0].reshape(num, segment_samples)
    ).any(axis=-1)
    keep &= ~np.isnan(
        scg_signal[:total].reshape(num, segment_samples, -1)
    ).any(axis=(1, 2))
    out = []
    for i in np.nonzero(np.asarray(keep))[0]:
        s = int(starts[i])
        e = s + segment_samples
        out.append(Segment(scg_signal[s:e], rhc_signal[s:e], record_name, s, e))
    return out


def get_segments(params, record_name: str | None = None) -> list[Segment]:
    """All clean segments for an experiment (reference: recordutil.py:122-149)."""
    if record_name is None:
        segments: list[Segment] = []
        for name in get_record_names():
            segments.extend(get_segments(params, record_name=name))
        return segments

    segment_samples = int(params.segment_size * SAMPLE_FREQ)
    record = read_record(record_name)
    chop = (
        segment_interval_device
        if getattr(params, "data_backend", "host") == "device"
        else segment_interval
    )
    segments = []
    for start, stop in get_chamber_intervals(record_name, params.chamber):
        scg_signal = get_channels(record, params.in_channels, start, stop)
        rhc_signal = get_channels(record, ["RHC_pressure"], start, stop)
        segments.extend(
            chop(scg_signal, rhc_signal, segment_samples, params.min_RHC, record_name)
        )
    return segments
