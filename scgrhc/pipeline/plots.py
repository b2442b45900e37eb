"""Prediction comparison plots.

Every reference config names ``pred_top_dir_path`` and
``pred_rand_dir_path`` (e.g. waveform_06/params.json) and paramutil
resolves them (reference: paramutil.py:19-20), but no committed reference
script ever writes there — the plotting stage evidently lived outside the
repo.  This module supplies it: from a checkpoint's comparison CSV, plot
the top-N segments by Pearson r into ``pred_top`` and N random segments
into ``pred_rand`` (real vs predicted denormalized RHC traces).
"""

from __future__ import annotations

import os
from time import time

import numpy as np

from scgrhc.core.timelog import timelog
from scgrhc.io.catalog import SAMPLE_FREQ


def _plot_rows(df, out_dir: str, tag: str) -> list[str]:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from scgrhc.select.run import get_float_array

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for _, row in df.iterrows():
        real = get_float_array(row["real_rhc"])
        pred = get_float_array(row["pred_rhc"])
        t = np.arange(real.size) / SAMPLE_FREQ
        fig, ax = plt.subplots(figsize=(8, 3))
        ax.plot(t, real, label="Real RHC", linewidth=1.0)
        ax.plot(t, pred, label="Predicted RHC", linewidth=1.0)
        ax.set_xlabel("Time (s)")
        ax.set_ylabel("Pressure (mmHg)")
        ax.set_title(
            f"{row['filename']} [{row['start_idx']}:{row['stop_idx']}] "
            f"r={row['pcc_r']:.3f} rmse={row['rmse']:.2f}"
        )
        ax.legend(loc="upper right", fontsize=8)
        fig.tight_layout()
        name = f"{tag}_{row['filename']}_{row['start_idx']}.png"
        path = os.path.join(out_dir, name)
        fig.savefig(path, dpi=100)
        plt.close(fig)
        paths.append(path)
    return paths


def run(params, loader_type: str, checkpoint: str, n: int = 5, seed: int = 0):
    """Write top-N and random-N comparison plots for one checkpoint's CSV."""
    import pandas as pd

    start_time = time()
    checkpoint_str = checkpoint.split(".")[0]
    csv_path = os.path.join(
        params.comparison_dir_path, loader_type, f"{checkpoint_str}.csv"
    )
    print(
        timelog(
            f"Run waveform_plots for {params.dir_path} | {loader_type} | "
            f"{checkpoint_str}",
            start_time,
        )
    )
    df = pd.read_csv(csv_path)
    if df.empty:
        print("No comparisons to plot")
        return []

    # CSV rows are already sorted by pcc_r descending (waveform_test.py:148)
    top = df.head(n)
    rand = df.sample(min(n, len(df)), random_state=seed)
    out = _plot_rows(top, params.pred_top_dir_path, f"{loader_type}_{checkpoint_str}")
    out += _plot_rows(
        rand, params.pred_rand_dir_path, f"{loader_type}_{checkpoint_str}"
    )
    print(timelog(f"waveform_plots | wrote {len(out)} figures", start_time))
    return out
