"""Round-5 on-chip evidence chain (run under scripts/watchdog.sh).

Stage A — head-to-head scgrhc sides: the three seeded reference-semantics
          (default-profile, f32) 40-epoch pipelines prepared by
          h2h_setup.py, end-to-end on the real chip.
Stage B — one 250-epoch PURE-DEFAULT-semantics waveform_06 depth run
          (no fast profile, no epoch-scan override) against the round-4
          synthetic DB, per-epoch checkpoints kept, eval-all-250 →
          select → final test: the reference's own unit of work
          (waveform_train.py:401-411) on the configuration that claims
          reference semantics.
Stage C — orbax-backend soak: 100-epoch run with ``checkpoint_backend:
          "orbax"``, genuinely KILLED (SIGKILL, explicit pid) mid-run
          once ≥40 epoch checkpoints exist, then resumed to completion +
          eval + select + final test (resume contract:
          waveform_train.py:334-346).

Every stage is idempotent-resumable; the watchdog may kill and relaunch
this script at any point.
"""

import json
import os
import signal
import subprocess
import sys
import time

os.environ["SCGRHC_DATA"] = "/tmp/scale_r4/vdb"  # stages B/C (read at import)
R5 = "/tmp/r5"
H2H = os.path.join(R5, "h2h")

import scgrhc

scgrhc.configure_compilation_cache()
from scgrhc.pipeline.sweep import run_experiment_inproc
from scgrhc.utils.experiments import LAT, HF, DV, make_params_dict

summary_path = os.path.join(R5, "chip_summary.json")
summary = []
if os.path.exists(summary_path):
    summary = json.load(open(summary_path))


def record(row):
    summary.append(row)
    print("CHIP " + json.dumps(row), flush=True)
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=1)


def done(tag):
    return any(r.get("tag") == tag and r.get("exit") == 0 for r in summary)


# ---------------------------------------------------------------- stage A
for side in ("jax_s0", "jax_s1", "jax_s2"):
    tag = f"h2h_{side}"
    if done(tag):
        continue
    d = os.path.join(H2H, side, "waveform_06")
    t0 = time.time()
    code = run_experiment_inproc(d)
    record({"tag": tag, "dir": d, "exit": code,
            "wall_s": round(time.time() - t0, 1)})

# ---------------------------------------------------------------- stage B
DEEP = os.path.join(R5, "deep_ref")


def write_cfg(root, **extra):
    cfg = make_params_dict(6, "PA", [LAT, HF, DV], root=root, **extra)
    os.makedirs(cfg["dir_path"], exist_ok=True)
    with open(os.path.join(cfg["dir_path"], "params.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    return cfg["dir_path"]


if not done("deep_ref_06"):
    d = write_cfg(DEEP, total_epochs=250, seed=0)  # PURE default semantics
    t0 = time.time()
    code = run_experiment_inproc(d)
    record({"tag": "deep_ref_06", "dir": d, "exit": code,
            "wall_s": round(time.time() - t0, 1)})

# ---------------------------------------------------------------- stage C
ORB = os.path.join(R5, "orbax_soak")
orb_dir = write_cfg(ORB, total_epochs=100, seed=0,
                    checkpoint_backend="orbax", train_profile="fast")
kill_marker = os.path.join(R5, "orbax_killed_once")
child_pid_file = os.path.join(R5, "orbax_child.pid")


def n_ckpts():
    cdir = os.path.join(orb_dir, "checkpoints")
    if not os.path.isdir(cdir):
        return 0
    return len([n for n in os.listdir(cdir) if ".checkpoint" in n
                and not n.endswith(".tmp")])


if not done("orbax_soak"):
    # clean up any orphaned child from a previous watchdog kill
    if os.path.exists(child_pid_file):
        try:
            pid = int(open(child_pid_file).read().strip())
            os.kill(pid, signal.SIGKILL)
            print(f"killed orphaned orbax child {pid}", flush=True)
        except (ValueError, ProcessLookupError, PermissionError):
            pass
        os.remove(child_pid_file)

    if not os.path.exists(kill_marker):
        # phase 1: train in a subprocess, SIGKILL it mid-run (≥40 epochs)
        env = dict(os.environ)
        log = open(os.path.join(R5, "orbax_phase1.log"), "ab")
        proc = subprocess.Popen(
            [sys.executable, "-m", "scgrhc", orb_dir], env=env,
            stdout=log, stderr=subprocess.STDOUT,
        )
        with open(child_pid_file, "w") as f:
            f.write(str(proc.pid))
        while proc.poll() is None and n_ckpts() < 40:
            time.sleep(5)
        if proc.poll() is None:
            at = n_ckpts()
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            print(f"SIGKILLED orbax run at {at} checkpoints", flush=True)
            with open(kill_marker, "w") as f:
                f.write(f"killed at {at} checkpoints\n")
        else:
            # finished before 40 ckpts?? record and fall through
            print(f"orbax child exited early rc={proc.returncode}", flush=True)
        os.remove(child_pid_file)

    # phase 2: resume to completion in-process
    t0 = time.time()
    code = run_experiment_inproc(orb_dir)
    row = {"tag": "orbax_soak", "dir": orb_dir, "exit": code,
           "wall_s": round(time.time() - t0, 1), "ckpts": n_ckpts()}
    if os.path.exists(kill_marker):
        row["killed_once"] = open(kill_marker).read().strip()
    record(row)

print("CHIP CHAIN DONE", flush=True)
