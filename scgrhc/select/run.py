"""Checkpoint selection stage (reference parity: waveform_checkpoint.py).

Reads every ``comparisons/valid/*.csv``, concatenates all segments'
denormalized real/pred waveforms, computes one global PCC (+ Fisher-z CI)
and RMSE (+ t-CI) per checkpoint, writes ``checkpoint_scores.csv`` and
``checkpoint_best.txt`` (pandas ``to_string`` of the argmax-pcc_r row —
the exact handshake waveform_pipeline.py:26-27 parses).

Redesign vs reference: the string→float parse uses ``np.fromstring`` on
the whole column at once instead of a per-sample Python float() loop
(reference: waveform_checkpoint.py:12-16,32-36), and the global metrics
are computed as single vectorized reductions.
"""

from __future__ import annotations

import os
from time import time

import numpy as np

from scgrhc.core.timelog import timelog
from scgrhc.eval import metrics


def get_float_array(s: str) -> np.ndarray:
    """Parse the reference's stringified list format
    (reference: waveform_checkpoint.py:12-16)."""
    return np.asarray(s.strip("[").strip("]").split(","), dtype=np.float64)


def get_checkpoint_scores(params, start_time: float) -> list[dict]:
    import pandas as pd

    corrs = []
    comparison_dir_path = os.path.join(params.comparison_dir_path, "valid")
    comparison_paths = sorted(os.listdir(comparison_dir_path))

    for i, comparison_path in enumerate(comparison_paths):
        df = pd.read_csv(os.path.join(comparison_dir_path, comparison_path))
        if df.empty:  # empty split: nothing to score for this checkpoint
            print(
                timelog(
                    f"waveform_checkpoint | {params.dir_path} | "
                    f"{i}/{len(comparison_paths)} | empty comparison "
                    f"{comparison_path}, skipped",
                    start_time,
                )
            )
            continue
        all_pred = np.concatenate([get_float_array(s) for s in df["pred_rhc"]])
        all_real = np.concatenate([get_float_array(s) for s in df["real_rhc"]])

        score = metrics.global_scores(
            all_real.astype(np.float64), all_pred.astype(np.float64)
        )
        checkpoint = f"{comparison_path.split('.')[0]}.checkpoint"
        corrs.append({"checkpoint": checkpoint, **score})
        print(
            timelog(
                f"waveform_checkpoint | {params.dir_path} | "
                f"{i}/{len(comparison_paths)} | "
                f"{score['pcc_r']:.3f} [{score['pcc_ci95_lower']:.3f}, "
                f"{score['pcc_ci95_upper']:.3f}] | {score['rmse']:.3f} | "
                f"[{score['rmse_ci95_lower']:.3f}, {score['rmse_ci95_upper']:.3f}]",
                start_time,
            )
        )
    return corrs


def run(params) -> None:
    import pandas as pd

    start_time = time()
    print(timelog(f"Run waveform_checkpoint for {params.dir_path}", start_time))
    scores = get_checkpoint_scores(params, start_time)
    from scgrhc.parallel import comm

    try:
        if comm.is_primary():  # single-writer discipline on pods
            scores_df = pd.DataFrame.from_dict(scores)
            scores_df.to_csv(
                os.path.join(params.dir_path, "checkpoint_scores.csv"), index=False
            )
            best_score = scores_df.loc[scores_df["pcc_r"].idxmax()]
            with open(os.path.join(params.dir_path, "checkpoint_best.txt"), "w") as f:
                f.write(best_score.to_string())
    finally:
        # in the finally: a primary-side failure (e.g. empty scores →
        # idxmax raising) must still release non-primaries parked here
        comm.barrier("select_end")  # pipeline reads checkpoint_best.txt next
