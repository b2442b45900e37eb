"""Head-to-head — run the reference's OWN torch pipeline, free-running.

Imports the genuine reference modules from /root/reference (wfdb stubbed —
never reached: the pre-built loader pickles trip the overwrite guard at
recordutil.py:176-181 before any record I/O, and the pipeline swallows
that exception by design, waveform_pipeline.py:12-15) and runs
``waveform_pipeline.run`` end-to-end: resume-from-init train → eval all
checkpoints on valid → select → final test.

Usage:  python scripts/h2h_run_torch.py [DIR=/tmp/r5/h2h/torch/waveform_06]
"""

import os
import sys
import types

os.environ.setdefault("MPLBACKEND", "Agg")
os.environ.setdefault("OMP_NUM_THREADS", "1")

DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r5/h2h/torch/waveform_06"

if "wfdb" not in sys.modules:
    sys.modules["wfdb"] = types.ModuleType("wfdb")  # never called (see above)
sys.path.insert(0, "/root/reference")

import torch

torch.set_num_threads(1)  # single-core host; avoid intra-op oversubscription

from paramutil import Params  # noqa: E402  (reference modules)
import waveform_pipeline  # noqa: E402

waveform_pipeline.run(Params(os.path.join(DIR, "params.json")))
print("H2H TORCH DONE", flush=True)
