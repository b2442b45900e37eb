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


def run_experiment_inproc(dir_path: str) -> int:
    """Run one experiment's full pipeline in THIS process.

    The payoff is the in-memory jit cache: with ``shape_bucket`` +
    ``channel_bucket`` every config in a batch-size class traces to the
    SAME jaxpr, so configs 2..N skip compile AND the per-process
    executable reload entirely (measured: a fresh process pays minutes
    re-loading the cached program through the remote-TPU tunnel even on
    a persistent-cache hit; in-process the hit is free).  Config
    failures are contained like the reference pipeline contains stage
    failures (waveform_pipeline.py:12-22): print and move on — every
    stage is idempotent-resumable, so a rerun finishes stragglers.
    """
    import os as _os

    from scgrhc.core.params import Params
    from scgrhc.pipeline import run as pipeline_run

    try:
        pipeline_run.run(Params(_os.path.join(dir_path, "params.json")))
        return 0
    except Exception as e:
        print(f"sweep | {dir_path} failed in-process: {e!r}")
        return 1


def prune_checkpoints(dir_path: str) -> int:
    """Keep first/best/last checkpoints, delete the rest; returns count.

    A completed config's eval + select artifacts (comparison CSVs,
    checkpoint_scores.csv, checkpoint_best.txt) fully record every
    epoch's scores; the per-epoch checkpoint files themselves are only
    needed again for resume (last), the final test (best), or a restart
    audit (first).  At the reference's 250-epoch cadence each config
    retains ~10.4 GB of checkpoints (250 × ~41.5 MB) — a full 32-config
    matrix would exceed this host's disk — so ``sweep --prune`` reclaims
    them as soon as each config's pipeline exits 0.  Never removes the
    selected best (read from checkpoint_best.txt before deleting)."""
    cdir = os.path.join(dir_path, "checkpoints")
    if not os.path.isdir(cdir):
        return 0
    # orbax-backend checkpoints are ``NNN.checkpoint.orbax`` DIRECTORIES
    names = sorted(
        n for n in os.listdir(cdir)
        if n.endswith(".checkpoint") or n.endswith(".checkpoint.orbax")
    )
    if not names:
        return 0
    keep = {names[0], names[-1]}
    best_txt = os.path.join(dir_path, "checkpoint_best.txt")
    if os.path.exists(best_txt):
        with open(best_txt) as f:
            for tok in f.read().split():
                if tok.endswith(".checkpoint"):
                    keep.add(tok)
                    keep.add(tok + ".orbax")
    removed = 0
    for n in names:
        if n not in keep:
            p = os.path.join(cdir, n)
            if os.path.isdir(p):
                import shutil

                shutil.rmtree(p)
            else:
                os.remove(p)
            removed += 1
    return removed


def run_sweep(
    dir_paths: list[str],
    jobs: int = 1,
    device_ids: list[int] | None = None,
    inproc: bool = False,
    prune: bool = False,
) -> dict[str, int]:
    """Fan the experiment list out ``jobs`` processes at a time.

    ``device_ids``, when given, pins experiment i to device
    ``device_ids[i % len(device_ids)]`` (one config per chip — the
    experiment-parallel mapping of SURVEY §2.3).  ``inproc`` runs the
    configs serially inside this process instead (requires jobs<=1);
    see :func:`run_experiment_inproc` for why that is the fast path on
    one chip.  ``prune`` reclaims each successful config's non-essential
    checkpoints as it finishes (:func:`prune_checkpoints`).  Returns
    dir_path → exit code.
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
        if inproc:
            code = run_experiment_inproc(dir_path)
        else:
            code = run_experiment_process(dir_path, env_extra)
        if prune and code == 0:
            n = prune_checkpoints(dir_path)
            if n:
                print(timelog(f"sweep | pruned {n} checkpoints in {dir_path}",
                              start))
        print(timelog(f"sweep | done {dir_path} (exit {code})", start))
        return dir_path, code

    if inproc and jobs > 1:
        raise ValueError("inproc sweep requires jobs=1 (one process, one chip)")

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
