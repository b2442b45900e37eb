"""Multi-controller (2-process) discipline tests over CPU+Gloo.

Spawns two real processes joined via ``jax.distributed`` (the same
multi-controller runtime a TPU pod uses, with Gloo standing in for DCN),
runs the production DP epoch path on a global mesh spanning both, and
checks (a) the losses agree across processes, (b) only process 0 writes
artifacts.  SURVEY.md §2.4; VERDICT round-1 weak #6.
"""

import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); outdir = sys.argv[2]
    jax.distributed.initialize("localhost:29901", 2, pid)
    import numpy as np
    import jax.numpy as jnp
    from scgrhc.data.store import SegmentStore
    from scgrhc.parallel import comm
    from scgrhc.train import checkpoint as ckpt_io
    from scgrhc.train.run import _dp_gather_place
    from scgrhc.train.wgan import TrainConfig, init_state, train_epoch_gather

    assert jax.process_count() == 2 and jax.device_count() == 4

    # "seed": null must agree across controllers (process-0 broadcast)
    from jax.experimental import multihost_utils
    from scgrhc.core.params import Params
    p = Params(os.path.join(outdir, "params.json"))
    assert p.unseeded
    seeds = np.asarray(multihost_utils.process_allgather(jnp.int64(p.seed)))
    assert (seeds == seeds[0]).all(), seeds

    T = 96
    cfg = TrainConfig(n_critic=1)
    state = init_state(jax.random.key(0), 1, cfg)
    rng = np.random.default_rng(0)  # same data on both processes
    N = 16
    store = SegmentStore(
        rng.random((N, 1, T)).astype(np.float32),
        rng.random((N, 1, T)).astype(np.float32),
        [f"r{i}" for i in range(N)], np.zeros(N, np.int64),
        np.zeros(N, np.int64), np.zeros((N, 2)), np.zeros((N, 2)),
        segment_samples=T,
    )
    # batch 3 does NOT divide the 4-device mesh -> pad+mask engages
    idx = rng.permutation(N)[:6].reshape(2, 3).astype(np.int32)
    p_state, scg_all, rhc_all, p_idx, mask = _dp_gather_place(state, store, idx)
    assert mask is not None and p_idx.shape == (2, 4)
    new_state, d_hist, g_hist = train_epoch_gather(
        p_state, scg_all, rhc_all, p_idx, jax.random.key(2), cfg, mask
    )
    g = np.asarray(g_hist)
    assert np.isfinite(g).all()

    # single-writer discipline: only the primary writes the checkpoint
    if comm.is_primary():
        ckpt_io.save(os.path.join(outdir, "000.checkpoint"), start_time=0.0,
                     epoch=0, g_losses=[], d_losses=[], state=new_state, cfg=cfg)
    comm.barrier("test_end")
    print(f"LOSSES {pid} " + ",".join(f"{x:.6f}" for x in g), flush=True)
    """
)


PIPELINE_WORKER = textwrap.dedent(
    """
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    mode = sys.argv[1]      # mp0 / mp1 / sp
    outdir = sys.argv[2]
    if mode.startswith("mp"):
        jax.distributed.initialize("localhost:29902", 2, int(mode[2:]))
        assert jax.process_count() == 2 and jax.device_count() == 4
    else:
        assert jax.device_count() == 4
    import matplotlib
    matplotlib.use("Agg")
    from scgrhc.core.params import Params
    from scgrhc.pipeline import run as pipeline_run
    pipeline_run.run(Params(os.path.join(outdir, "params.json")))
    print("PIPELINE DONE", flush=True)
    """
)


def _communicate_or_kill(p, timeout):
    """communicate() that never orphans the worker: on timeout the child
    is killed by its explicit pid before the exception propagates (an
    orphaned jax worker spins on this 1-core host for hours)."""
    try:
        return p.communicate(timeout=timeout)[0]
    except subprocess.TimeoutExpired:
        p.kill()
        out = p.communicate()[0]
        raise AssertionError(
            f"worker timed out after {timeout}s; killed. tail:\n{out[-3000:]}"
        )


def _artifact_map(root):
    out = {}
    for base, _, files in os.walk(root):
        for f in files:
            p = os.path.join(base, f)
            out[os.path.relpath(p, root)] = p
    return out


@pytest.mark.slow
def test_two_process_full_pipeline_artifact_parity(tmp_path, synth_db):
    """The WHOLE stage pipeline (data → 2-epoch train → eval-all → select
    → final test) under 2 controllers × 2 devices vs the same pipeline on
    a single controller with the SAME 4-device global mesh — exercising
    every ``comm.is_primary()`` writer and stage barrier as a composition
    (VERDICT r4 weak #6; this test found the non-addressable-fetch bug
    fixed by ``parallel/mesh.fetch_global``).

    Parity contract (measured, not aspirational): everything RNG/data-
    derived is BYTE-identical (loader pickles, record_log counts,
    params) — but trained artifacts CANNOT be bitwise equal across
    controller topologies: the cross-process gradient all-reduce (Gloo)
    reduces in a different order than the single-process XLA collective,
    so step 0's loss is bit-identical and step 1 diverges at f32
    rounding, which the WGAN critic dynamics amplify ~7x/step (measured
    after 2 epochs: g_loss rel ≤5.4e-3, d_loss rel ≤3.0e-2, weight
    max-abs ≤1.9e-3, valid pcc abs ≤5.1e-3; bounds below are ~3x).  The assertions below pin
    byte-identity where determinism is promised, measured-bounded
    closeness for trained artifacts, and INTERNAL consistency of the
    selection (best.txt = argmax of that run's own scores — with 2
    near-random checkpoints the tiny collective noise can flip which
    one wins between runs, which the reference selection contract
    allows: both runs honor their own scores)."""
    import json
    import pickle

    script = tmp_path / "pipeline_worker.py"
    script.write_text(PIPELINE_WORKER)
    cfg = json.load(open("/root/reference/waveform_06/params.json"))
    cfg.update(
        {
            "in_channels": ["patch_ACC_lat", "patch_ACC_hf"],
            "batch_size": 8,
            "total_epochs": 2,
            "seed": 0,
        }
    )
    dirs = {}
    for mode in ("mp", "sp"):
        d = tmp_path / mode
        d.mkdir()
        cfg["dir_path"] = str(d)
        (d / "params.json").write_text(json.dumps(cfg))
        dirs[mode] = d

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["SCGRHC_DATA"] = os.path.dirname(synth_db)
    env.pop("JAX_NUM_CPU_DEVICES", None)

    def launch(mode, outdir, ndev):
        e = dict(env)
        e["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
        return subprocess.Popen(
            [sys.executable, str(script), mode, str(outdir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=e, cwd="/root/repo",
        )

    procs = [launch(f"mp{pid}", dirs["mp"], 2) for pid in (0, 1)]
    outs = [_communicate_or_kill(p, 1200) for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0 and "PIPELINE DONE" in out, out[-3000:]

    sp = launch("sp", dirs["sp"], 4)
    out = _communicate_or_kill(sp, 1200)
    assert sp.returncode == 0 and "PIPELINE DONE" in out, out[-3000:]

    import numpy as np
    import pandas as pd

    mp_map, sp_map = _artifact_map(dirs["mp"]), _artifact_map(dirs["sp"])
    # the selected-checkpoint name may differ (see docstring) — normalize
    # comparisons/test/<selected>.csv before comparing the SETS
    norm = lambda m: sorted(
        "comparisons/test/SELECTED.csv"
        if rel.startswith(os.path.join("comparisons", "test")) else rel
        for rel in m
    )
    assert norm(mp_map) == norm(sp_map), sorted(set(mp_map) ^ set(sp_map))

    # byte-identity where determinism is promised: the seeded dataset
    # artifacts both sides derive from the same files + seed
    for rel in ("loader_train.pickle", "loader_valid.pickle",
                "loader_test.pickle"):
        assert (open(mp_map[rel], "rb").read()
                == open(sp_map[rel], "rb").read()), rel
    la = [l for l in open(mp_map["record_log.txt"])
          if not l.startswith("Dataset created")]
    lb = [l for l in open(sp_map["record_log.txt"])
          if not l.startswith("Dataset created")]
    assert la == lb
    ja, jb = json.load(open(mp_map["params.json"])), json.load(
        open(sp_map["params.json"]))
    ja.pop("dir_path"), jb.pop("dir_path")
    assert ja == jb

    # trained artifacts: measured-bounded closeness (collective rounding)
    for rel in sorted(r for r in mp_map if r.endswith(".checkpoint")):
        ca = pickle.load(open(mp_map[rel], "rb"))
        cb = pickle.load(open(sp_map[rel], "rb"))
        assert sorted(ca) == sorted(cb), rel
        assert ca["epoch"] == cb["epoch"]
        np.testing.assert_allclose(ca["g_losses"], cb["g_losses"],
                                   rtol=2e-2, err_msg=rel)
        np.testing.assert_allclose(ca["d_losses"], cb["d_losses"],
                                   rtol=1e-1, err_msg=rel)
        for k in ("g_state_dict", "d_state_dict"):
            fa = dict(_flatten(ca[k]))
            fb = dict(_flatten(cb[k]))
            assert sorted(fa) == sorted(fb), (rel, k)
            for kk in fa:
                np.testing.assert_allclose(
                    np.asarray(fa[kk]), np.asarray(fb[kk]), atol=1e-2,
                    err_msg=f"{rel}:{k}:{kk}",
                )

    sa = pd.read_csv(mp_map["checkpoint_scores.csv"]).sort_values(
        "checkpoint").reset_index(drop=True)
    sb = pd.read_csv(sp_map["checkpoint_scores.csv"]).sort_values(
        "checkpoint").reset_index(drop=True)
    assert list(sa.checkpoint) == list(sb.checkpoint)
    np.testing.assert_allclose(sa.pcc_r, sb.pcc_r, atol=2e-2)
    np.testing.assert_allclose(sa.rmse, sb.rmse, rtol=1e-2)

    # selection: INTERNALLY consistent with each run's own scores
    for mode, m in (("mp", mp_map), ("sp", sp_map)):
        df = pd.read_csv(m["checkpoint_scores.csv"])
        want = df.loc[df.pcc_r.idxmax(), "checkpoint"]
        got = open(m["checkpoint_best.txt"]).read().splitlines()[0].split()[1]
        assert got == want, (mode, got, want)
        # ...and the final test ran on exactly that checkpoint
        stem = got.split(".")[0]
        assert os.path.join("comparisons", "test", f"{stem}.csv") in m, mode


def _flatten(tree, prefix=""):
    for k, v in tree.items():
        key = f"{prefix}/{k}"
        if isinstance(v, dict):
            yield from _flatten(v, key)
        else:
            yield key, v


SELECT_WORKER = textwrap.dedent(
    """
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    mode = sys.argv[1]; outdir = sys.argv[2]
    if mode.startswith("mp"):
        jax.distributed.initialize("localhost:29903", 2, int(mode[2:]))
    from scgrhc.core.params import Params
    from scgrhc.select import run as select_run
    select_run.run(Params(os.path.join(outdir, "params.json")))
    print("SELECT DONE", flush=True)
    """
)


def _near_tie_exp(d):
    """Experiment dir whose comparisons/valid CSVs force the near-tie
    guard: two checkpoints with IDENTICAL stacked CSVs (score diff 0 <
    the 1e-4 jitter threshold), so select must serially re-verify both
    (select/run.py:86-190) before choosing."""
    import json
    import shutil

    import jax

    from scgrhc.core.params import Params
    from scgrhc.data.loaders import SegmentLoader
    from scgrhc.data.store import SegmentStore
    from scgrhc.eval import run as eval_run
    from scgrhc.train import checkpoint as ckpt_io
    from scgrhc.train.wgan import TrainConfig, init_state

    import numpy as np

    T = 256
    os.makedirs(os.path.join(d, "checkpoints"))
    cfg = {
        "dir_path": str(d),
        "in_channels": ["a", "b"],
        "chamber": "PA", "segment_size": 1.5, "batch_size": 4,
        "train_path": "loader_train.pickle",
        "valid_path": "loader_valid.pickle",
        "test_path": "loader_test.pickle",
        "checkpoint_dir_path": "checkpoints",
        "comparison_dir_path": "comparisons",
        "pred_top_dir_path": "pred_top", "pred_rand_dir_path": "pred_rand",
        "alpha": 1e-4, "beta1": 0.5, "beta2": 0.999, "n_critic": 2,
        "lambda_gp": 10, "lambda_aux": 100, "total_epochs": 2,
        "min_RHC": -50, "use_global_min_max": False, "eval_batch": 4,
    }
    with open(os.path.join(d, "params.json"), "w") as f:
        json.dump(cfg, f)
    rng = np.random.default_rng(0)
    n = 6
    mm = np.stack([np.full(n, -10.0), np.full(n, 40.0)], axis=1)
    store = SegmentStore(
        rng.random((n, 2, T)).astype(np.float32),
        rng.random((n, 1, T)).astype(np.float32),
        [f"rec{i}" for i in range(n)],
        np.arange(n, dtype=np.int64), np.arange(n, dtype=np.int64) + T,
        mm.copy(), mm.copy(), segment_samples=T,
    )
    SegmentLoader(store, 1, shuffle=False).save(
        os.path.join(d, "loader_valid.pickle")
    )
    for ep in range(2):
        st = init_state(jax.random.key(ep), 2, TrainConfig())
        ckpt_io.save(
            os.path.join(d, "checkpoints", f"{ep:03d}.checkpoint"),
            start_time=0.0, epoch=ep, g_losses=[], d_losses=[], state=st,
        )
    p = Params(os.path.join(d, "params.json"))
    eval_run.run(p, "valid", "all")
    comp = os.path.join(d, "comparisons", "valid")
    # identical CSVs → identical global scores → guaranteed near-tie
    shutil.copyfile(os.path.join(comp, "000.csv"),
                    os.path.join(comp, "001.csv"))
    return comp


@pytest.mark.slow
def test_two_process_select_near_tie_guard(tmp_path):
    """The near-tie guard's serial re-verify — backup/rename, barrier,
    serial re-eval, CSV rewrite, backup-dir cleanup — under 2 real
    controllers, asserting the artifacts are byte-identical to the same
    forced-tie select on a single controller with the same 4-device
    global mesh (VERDICT r4 weak #6: the guard's barrier path had never
    run multi-process)."""
    script = tmp_path / "select_worker.py"
    script.write_text(SELECT_WORKER)
    dirs = {}
    for mode in ("mp", "sp"):
        d = tmp_path / mode
        d.mkdir()
        _near_tie_exp(str(d))
        dirs[mode] = d

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_NUM_CPU_DEVICES", None)

    def launch(mode, outdir, ndev):
        e = dict(env)
        e["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
        return subprocess.Popen(
            [sys.executable, str(script), mode, str(outdir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=e, cwd="/root/repo",
        )

    procs = [launch(f"mp{pid}", dirs["mp"], 2) for pid in (0, 1)]
    outs = [_communicate_or_kill(p, 1200) for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0 and "SELECT DONE" in out, out[-3000:]
    sp = launch("sp", dirs["sp"], 4)
    out = _communicate_or_kill(sp, 1200)
    assert sp.returncode == 0 and "SELECT DONE" in out, out[-3000:]

    for mode, d in dirs.items():
        comp = os.path.join(d, "comparisons", "valid")
        # serial rewrite really happened: the copied CSVs diverged again
        a = open(os.path.join(comp, "000.csv"), "rb").read()
        b = open(os.path.join(comp, "001.csv"), "rb").read()
        assert a != b, mode
        assert not os.path.isdir(comp + ".reverify_bak"), mode  # cleaned
        assert os.path.exists(os.path.join(d, "checkpoint_best.txt")), mode

    for name in ("checkpoint_best.txt", "checkpoint_scores.csv",
                 os.path.join("comparisons", "valid", "000.csv"),
                 os.path.join("comparisons", "valid", "001.csv")):
        am = open(os.path.join(dirs["mp"], name), "rb").read()
        asp = open(os.path.join(dirs["sp"], name), "rb").read()
        assert am == asp, name


@pytest.mark.slow
def test_two_process_dp_and_single_writer(tmp_path):
    import json

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    outdir = tmp_path / "out"
    outdir.mkdir()
    cfg = json.load(open("/root/reference/waveform_06/params.json"))
    cfg["dir_path"] = str(outdir)
    cfg["seed"] = None
    (outdir / "params.json").write_text(json.dumps(cfg))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # 2 virtual CPU devices per process -> 4-device global mesh
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_NUM_CPU_DEVICES", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(outdir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd="/root/repo",
        )
        for pid in (0, 1)
    ]
    outs = [_communicate_or_kill(p, 1200) for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSSES"):
                _, pid, vals = line.split(" ", 2)
                losses[pid] = vals
    assert set(losses) == {"0", "1"}
    # both controllers computed the same (replicated) loss history
    assert losses["0"] == losses["1"]
    # exactly one process wrote the artifact
    assert sorted(os.listdir(outdir)) == ["000.checkpoint", "params.json"]
