"""Sweep report — aggregate every experiment's selection results.

The reference tracks sweep outcomes by hand in project_log.txt
(project_log.txt:1-95: per-config design intents and eyeballed results).
This stage replaces that with a generated table: for each experiment dir
with a ``checkpoint_scores.csv``, pull the best-by-pcc_r row (the same
argmax waveform_checkpoint.py:61-63 writes to checkpoint_best.txt) plus
the config's chamber/channels, and emit one ranked ``sweep_report.csv``
and a printed table.
"""

from __future__ import annotations

import json
import os
from time import time

from scgrhc.core.timelog import timelog


def collect(root: str = ".") -> list[dict]:
    rows = []
    for name in sorted(os.listdir(root)):
        d = os.path.join(root, name)
        scores_path = os.path.join(d, "checkpoint_scores.csv")
        params_path = os.path.join(d, "params.json")
        if not (os.path.isfile(scores_path) and os.path.isfile(params_path)):
            continue
        import pandas as pd

        scores = pd.read_csv(scores_path)
        if scores.empty:
            continue
        best = scores.loc[scores["pcc_r"].idxmax()]
        with open(params_path) as f:
            cfg = json.load(f)
        rows.append(
            {
                "experiment": name,
                "chamber": cfg.get("chamber"),
                "in_channels": "+".join(
                    c.replace("patch_ACC_", "").replace("patch_", "")
                    for c in cfg.get("in_channels", [])
                ),
                "checkpoint": best["checkpoint"],
                "pcc_r": float(best["pcc_r"]),
                "pcc_ci95_lower": float(best["pcc_ci95_lower"]),
                "pcc_ci95_upper": float(best["pcc_ci95_upper"]),
                "rmse": float(best["rmse"]),
                "n_checkpoints_scored": len(scores),
            }
        )
    rows.sort(key=lambda r: r["pcc_r"], reverse=True)
    return rows


def run(root: str = ".") -> str | None:
    import pandas as pd

    start_time = time()
    print(timelog(f"Run waveform_report for {root}", start_time))
    rows = collect(root)
    if not rows:
        print("No experiments with checkpoint_scores.csv found")
        return None
    df = pd.DataFrame(rows)
    out = os.path.join(root, "sweep_report.csv")
    df.to_csv(out, index=False)
    print(df.to_string(index=False))
    return out
