"""Head-to-head free-running parity — comparison/report stage.

Reads the four completed pipelines produced by h2h_setup.py +
h2h_run_torch.py + the chip chain (torch = the reference's own
waveform_pipeline on CPU; jax_s0/1/2 = scgrhc reference-semantics runs
differing only in RNG seed) and reports:

  * the per-epoch valid global PCC / RMSE trajectories
    (each side's own checkpoint_scores.csv — identical metric
    definitions, reference waveform_checkpoint.py:19-39),
  * the selected checkpoint per side (checkpoint_best.txt),
  * the final-test global scores (re-scored from each side's
    comparisons/test/<best>.csv with the same concat-then-score
    contract),
  * the parity verdict: at every epoch, is the torch trajectory inside
    the scgrhc seed ENVELOPE (min/max over seeds, widened by the
    seed-spread itself)?  Free-running runs differ by RNG draws alone,
    so the reference should look statistically like "a fourth seed" —
    the envelope test formalizes that without pinning RNG.

Usage:  python scripts/h2h_compare.py [ROOT=/tmp/r5/h2h] [--json OUT]
"""

import json
import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r5/h2h"
OUT = None
if "--json" in sys.argv:
    OUT = sys.argv[sys.argv.index("--json") + 1]

import pandas as pd

from scgrhc.select.run import _score_comparison_csv

SIDES = ["torch", "jax_s0", "jax_s1", "jax_s2"]


def exp_dir(side):
    return os.path.join(ROOT, side, "waveform_06")


def load_scores(side):
    df = pd.read_csv(os.path.join(exp_dir(side), "checkpoint_scores.csv"))
    df = df.sort_values("checkpoint").reset_index(drop=True)
    return df


def best_ckpt(side):
    with open(os.path.join(exp_dir(side), "checkpoint_best.txt")) as f:
        return f.read().splitlines()[0].split()[1]


def test_scores(side):
    best = best_ckpt(side)
    path = os.path.join(
        exp_dir(side), "comparisons", "test", best.split(".")[0] + ".csv"
    )
    return _score_comparison_csv(path)


scores = {s: load_scores(s) for s in SIDES}
n = min(len(df) for df in scores.values())
epochs = range(n)

jx = np.stack([scores[f"jax_s{i}"]["pcc_r"].values[:n] for i in range(3)])
tx = scores["torch"]["pcc_r"].values[:n]
jr = np.stack([scores[f"jax_s{i}"]["rmse"].values[:n] for i in range(3)])
tr = scores["torch"]["rmse"].values[:n]

# Envelope: seed min/max widened by one seed-spread on each side.  With
# only 3 seeds the sample envelope underestimates the true run-to-run
# range; the widening makes the test "within ~2× the observed spread",
# which a semantic error (different objective/optimizer) would exceed
# immediately while a fourth RNG draw would not.
lo = jx.min(0) - (jx.max(0) - jx.min(0)) - 1e-3
hi = jx.max(0) + (jx.max(0) - jx.min(0)) + 1e-3
inside = (tx >= lo) & (tx <= hi)
lo_r = jr.min(0) - (jr.max(0) - jr.min(0)) - 1e-3
hi_r = jr.max(0) + (jr.max(0) - jr.min(0)) + 1e-3
inside_r = (tr >= lo_r) & (tr <= hi_r)

print(f"{'ep':>3} {'torch_pcc':>10} {'jax_pcc(min..max)':>20} {'in':>3}"
      f" {'torch_rmse':>11} {'jax_rmse(min..max)':>20} {'in':>3}")
for e in epochs:
    print(f"{e:>3} {tx[e]:>10.4f} {jx[:, e].min():>9.4f}..{jx[:, e].max():<9.4f}"
          f" {'y' if inside[e] else 'N':>3}"
          f" {tr[e]:>11.4f} {jr[:, e].min():>9.4f}..{jr[:, e].max():<9.4f}"
          f" {'y' if inside_r[e] else 'N':>3}")

# Selection at the COMMON horizon (the sides may have trained different
# epoch counts if the torch run was truncated): argmax pcc_r over the
# first n scored checkpoints, same rule as the reference's selection
# (waveform_checkpoint.py:61-63).
sel_at_n = {
    s: str(scores[s]["checkpoint"].values[
        int(np.argmax(scores[s]["pcc_r"].values[:n]))
    ])
    for s in SIDES
}

report = {
    "epochs": int(n),
    "pcc_inside_envelope": int(inside.sum()),
    "rmse_inside_envelope": int(inside_r.sum()),
    "selected_full_run": {s: best_ckpt(s) for s in SIDES},
    "selected_at_common_horizon": sel_at_n,
    "valid_best_pcc_at_horizon": {
        s: float(scores[s]["pcc_r"].values[:n].max()) for s in SIDES
    },
    "final_test": {s: test_scores(s) for s in SIDES},
    "torch_final_pcc": float(tx[-1]),
    "jax_final_pcc": [float(v) for v in jx[:, -1]],
}
print(json.dumps(report, indent=1, default=float))
if OUT:
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1, default=float)
