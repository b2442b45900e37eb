"""Noise-gate parity tests.

The oracle below re-derives the reference's gate semantics with the same
libraries the reference uses (pandas rolling + sklearn LinearRegression,
reference: waveform_noise.py:6-49) and fuzz-compares our vectorized gate
against it, including the reference's >=2-flat-window quirk.
"""

import numpy as np
import pandas as pd
import pytest
from sklearn.linear_model import LinearRegression

from scgrhc.dsp.noise import (
    has_flat_lines,
    has_noise,
    has_noise_batch_jax,
    is_straight_line,
)
from scgrhc.dsp.segment import gate_windows


class P:  # minimal params stand-in
    min_RHC = -50


def oracle_flat_count(waveform, threshold=1e-3, min_samples=50):
    s = pd.Series(waveform)
    diff = s.rolling(window=min_samples).max() - s.rolling(window=min_samples).min()
    return int((diff < threshold).sum())


def oracle_has_noise(waveform, min_rhc=-50):
    flat = oracle_flat_count(waveform) >= 2  # reference loop quirk (see SURVEY C6)
    x = np.arange(len(waveform)).reshape(-1, 1)
    model = LinearRegression().fit(x, waveform)
    straight = model.score(x, waveform) > 0.8
    below = bool(np.any(np.asarray(waveform) < min_rhc))
    return flat or straight or below


def make_cases(rng):
    t = 750
    cases = {
        "clean_pulse": 20 + 10 * np.sin(2 * np.pi * 1.2 * np.arange(t) / 500)
        + rng.standard_normal(t),
        "flatline": np.concatenate([rng.uniform(10, 30, 300), np.full(100, 15.0),
                                    rng.uniform(10, 30, 350)]),
        "ramp": np.linspace(0, 30, t) + 0.1 * rng.standard_normal(t),
        "below_range": np.concatenate([rng.uniform(0, 30, 700), [-60.0] * 50]),
        "constant": np.full(t, 12.0),
        "one_flat_window_only": np.concatenate(
            [rng.uniform(10, 30, 350), np.full(50, 15.0), rng.uniform(10, 30, 350)]
        ),
        "noisy": rng.standard_normal(t) * 5 + 20,
    }
    for i in range(10):
        cases[f"fuzz_{i}"] = rng.uniform(-60, 60, t)
    return cases


def test_gate_matches_reference_oracle():
    rng = np.random.default_rng(42)
    for name, w in make_cases(rng).items():
        assert has_noise(P, w) == oracle_has_noise(w), name


def test_flat_count_quirk():
    """Exactly one flat rolling window must NOT trigger the gate (the
    reference's segment-building loop returns [] for a single index)."""
    rng = np.random.default_rng(0)
    w = np.concatenate([rng.uniform(10, 30, 350), np.full(50, 15.0),
                        rng.uniform(10, 30, 350)])
    assert oracle_flat_count(w) == 1
    assert not has_flat_lines(w)
    w2 = np.concatenate([rng.uniform(10, 30, 349), np.full(51, 15.0),
                         rng.uniform(10, 30, 350)])
    assert oracle_flat_count(w2) == 2
    assert has_flat_lines(w2)


def test_straight_line_r2():
    t = np.arange(750, dtype=float)
    assert is_straight_line(0.1 * t + 3)
    rng = np.random.default_rng(1)
    assert not is_straight_line(rng.standard_normal(750))


def test_batch_jax_matches_numpy():
    rng = np.random.default_rng(7)
    ws = np.stack(list(make_cases(rng).values()))
    got = np.asarray(has_noise_batch_jax(ws, min_rhc=-50))
    want = np.array([oracle_has_noise(w) for w in ws])
    np.testing.assert_array_equal(got, want)


def test_gate_windows_matches_per_window():
    rng = np.random.default_rng(3)
    ws = np.stack(list(make_cases(rng).values()))
    keep = gate_windows(ws, min_rhc=-50)
    want = np.array([not oracle_has_noise(w) for w in ws])
    np.testing.assert_array_equal(keep, want)


def test_get_flat_lines_matches_reference_pandas():
    """Element-for-element parity with the reference's pandas
    implementation, incl. its quirky duplicate appends
    (waveform_noise.py:6-26)."""
    import numpy as np
    import pandas as pd

    from scgrhc.dsp.noise import get_flat_lines

    def reference(waveform, threshold=1e-3, min_duration=0.1, sampling_rate=500):
        min_samples = int(min_duration * sampling_rate)
        s = pd.Series(waveform)
        rolling_diff = s.rolling(window=min_samples).max() - \
            s.rolling(window=min_samples).min()
        flat_indices = rolling_diff[rolling_diff < threshold].index
        flat_segments = []
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

    rng = np.random.default_rng(0)
    cases = []
    w = rng.standard_normal(750)
    cases.append(w.copy())                       # no flats
    w2 = w.copy(); w2[100:180] = 3.0; cases.append(w2)          # one flat run
    w3 = w.copy(); w3[100:180] = 3.0; w3[400:490] = -1.0
    cases.append(w3)                                            # two flat runs
    w4 = np.zeros(750); cases.append(w4)                        # all flat
    cases.append(rng.standard_normal(30))                       # shorter than window
    for wv in cases:
        assert get_flat_lines(wv) == reference(wv)
