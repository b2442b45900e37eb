"""Experiment-parallel sweep runner.

The reference runs its 37-config sweep strictly serially in one process
(reference: waveform_pipeline.py:33-37).  The sweep is embarrassingly
parallel — configs never communicate (SURVEY §2.3 EP row) — so here each
experiment runs as its own OS process (its own JAX runtime), fanned out
``jobs`` at a time across the host.  On a multi-chip host, set
``jobs = n_chips`` and each process claims one chip via
``JAX_DEFAULT_DEVICE``/``TPU_VISIBLE_DEVICES``; single-chip hosts keep
``jobs=1`` for the TPU-bound train stage.
"""

from __future__ import annotations

import os
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor
from time import time

from scgrhc.core.timelog import timelog


def run_experiment_process(dir_path: str, env_extra: dict | None = None) -> int:
    """Run one experiment's full pipeline in a subprocess."""
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    proc = subprocess.run(
        [sys.executable, "-m", "scgrhc", dir_path], env=env, check=False
    )
    return proc.returncode


def run_sweep(
    dir_paths: list[str], jobs: int = 1, device_ids: list[int] | None = None
) -> dict[str, int]:
    """Fan the experiment list out ``jobs`` processes at a time.

    ``device_ids``, when given, pins experiment i to device
    ``device_ids[i % len(device_ids)]`` (one config per chip — the
    experiment-parallel mapping of SURVEY §2.3).
    Returns dir_path → exit code.
    """
    start = time()
    results: dict[str, int] = {}

    def launch(i_dir):
        i, dir_path = i_dir
        env_extra = {}
        if device_ids:
            dev = device_ids[i % len(device_ids)]
            env_extra["TPU_VISIBLE_DEVICES"] = str(dev)
        print(timelog(f"sweep | start {dir_path}", start))
        code = run_experiment_process(dir_path, env_extra)
        print(timelog(f"sweep | done {dir_path} (exit {code})", start))
        return dir_path, code

    if jobs <= 1:
        for item in enumerate(dir_paths):
            d, c = launch(item)
            results[d] = c
    else:
        with ThreadPoolExecutor(max_workers=jobs) as pool:
            for d, c in pool.map(launch, enumerate(dir_paths)):
                results[d] = c
    failed = [d for d, c in results.items() if c != 0]
    if failed:
        print(timelog(f"sweep | {len(failed)} failed: {failed}", start))
    return results
