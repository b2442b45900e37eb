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
    outs = [p.communicate(timeout=540)[0] for p in procs]
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
