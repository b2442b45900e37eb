"""Head-to-head free-running parity experiment — setup stage.

Builds ONE shared dataset and ONE shared weight init, then materializes
four experiment dirs that all start from identical state:

  * ``torch/waveform_06``  — consumed by the reference's own pipeline
    (``/root/reference/waveform_pipeline.py:10-28``, run by
    ``h2h_run_torch.py``): identical loader pickles (our ``loader_backend:
    "torch"`` artifacts ARE genuine pickled torch DataLoaders,
    reference recordutil.py:202-224) plus a seeded ``000.checkpoint``
    holding the init weights — the reference resumes from it
    (waveform_train.py:334-346: ``epoch = ckpt['epoch'] + 1``), so it
    trains epochs 1..N-1 from exactly our init.
  * ``jax_s0 / jax_s1 / jax_s2`` — scgrhc reference-semantics (default
    profile, f32) runs from the SAME pickles + SAME ``000.checkpoint``,
    differing only in the free-running RNG seed.  The three seeds
    measure scgrhc's own run-to-run spread; the torch run should land
    inside it (it is statistically "another seed" of the same SGD
    process — the G update is pure Adam-on-MSE both sides, reference
    waveform_train.py:375-381).

Usage:  python scripts/h2h_setup.py [ROOT=/tmp/r5/h2h] [EPOCHS=40]
"""

import json
import os
import shutil
import sys
from time import time

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r5/h2h"
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 40
VDB = os.environ.get("H2H_VDB", "/tmp/r5/vdb")

import jax

jax.config.update("jax_platforms", "cpu")  # setup never needs the chip

os.environ["SCGRHC_DATA"] = VDB
from scgrhc.core.params import Params
from scgrhc.data.run import run as data_run
from scgrhc.train import checkpoint as ckpt_io
from scgrhc.train.wgan import TrainConfig, init_state
from scgrhc.utils.experiments import LAT, HF, DV, make_params_dict
from scgrhc.utils.synth import make_synthetic_database

if not os.path.isdir(os.path.join(VDB, "processed_data")):
    make_synthetic_database(VDB, n_records=4, duration_s=300.0)
    print("synthetic DB ready", flush=True)

SIDES = ["torch", "jax_s0", "jax_s1", "jax_s2"]


def write_cfg(side: str, seed: int | None) -> str:
    root = os.path.join(ROOT, side)
    os.makedirs(os.path.join(root, "waveform_06"), exist_ok=True)
    extra = {"total_epochs": EPOCHS}
    if side != "torch":
        # reference semantics: default profile — the ONLY opt-in keys are
        # the free-running seed and the torch-format loader artifacts
        extra.update({"seed": seed, "loader_backend": "torch"})
    cfg = make_params_dict(6, "PA", [LAT, HF, DV], root=root, **extra)
    cfg["dir_path"] = os.path.join(root, "waveform_06")
    path = os.path.join(cfg["dir_path"], "params.json")
    with open(path, "w") as f:
        json.dump(cfg, f, indent=2)
    return path


paths = {
    side: write_cfg(side, seed)
    for side, seed in zip(SIDES, [None, 0, 1, 2])
}

# 1. Build the dataset ONCE (jax_s0's data stage writes genuine torch
#    DataLoader pickles), then copy the identical artifacts everywhere.
p0 = Params(paths["jax_s0"])
if not os.path.exists(p0.train_path):
    data_run(p0)
for side in SIDES:
    if side == "jax_s0":
        continue
    p = Params(paths[side]) if side != "torch" else None
    dst_dir = os.path.dirname(paths[side])
    for name in ("loader_train.pickle", "loader_valid.pickle",
                 "loader_test.pickle", "record_log.txt"):
        src = os.path.join(p0.dir_path, name)
        dst = os.path.join(dst_dir, name)
        if not os.path.exists(dst):
            shutil.copyfile(src, dst)

# 2. One shared init: seed-0 weights, fresh Adam, saved as an epoch-0
#    reference-layout checkpoint (then re-encoded as a genuine torch.save
#    zip) and placed in EVERY side's checkpoint dir.  Both pipelines
#    resume from it and train epochs 1..N-1 (waveform_train.py:334-346).
cfg0 = TrainConfig.from_params(p0)
native = os.path.join(ROOT, "init_000.native")
torch_ckpt = os.path.join(ROOT, "init_000.torch")
if not os.path.exists(torch_ckpt):
    state = init_state(jax.random.key(0), len(p0.in_channels), cfg0)
    ckpt_io.save(native, start_time=time(), epoch=0, g_losses=[],
                 d_losses=[], state=state, cfg=cfg0)
    ckpt_io.export_torch(native, torch_ckpt)
for side in SIDES:
    cdir = os.path.join(os.path.dirname(paths[side]), "checkpoints")
    os.makedirs(cdir, exist_ok=True)
    dst = os.path.join(cdir, "000.checkpoint")
    if not os.path.exists(dst):
        shutil.copyfile(torch_ckpt, dst)

with open(os.path.join(p0.dir_path, "record_log.txt")) as f:
    print(f.read())
print("H2H SETUP DONE", flush=True)
