"""Sweep config generation, fan-out runner, and tracing hooks."""

import json
import os

import pytest

from scgrhc.core.params import Params
from scgrhc.utils.experiments import SWEEP, make_params_dict, write_experiments


def test_sweep_matrix_matches_reference_configs():
    """Generated configs reproduce waveform_06..37 byte-for-byte in content
    (reference: waveform_NN/params.json)."""
    ref_root = "/root/reference"
    if not os.path.isdir(os.path.join(ref_root, "waveform_06")):
        pytest.skip("reference not mounted")
    for number, chamber, in_channels in SWEEP:
        with open(os.path.join(ref_root, f"waveform_{number:02d}", "params.json")) as f:
            want = json.load(f)
        got = make_params_dict(number, chamber, in_channels)
        assert got == want, f"waveform_{number:02d} mismatch"


def test_write_experiments_loadable(tmp_path):
    dirs = write_experiments(str(tmp_path), total_epochs=2, seed=0)
    assert len(dirs) == 32
    p = Params(os.path.join(dirs[0], "params.json"))
    assert p.total_epochs == 2 and p.seed == 0 and p.chamber == "PA"


def test_run_sweep_exit_codes(tmp_path, monkeypatch):
    import scgrhc.pipeline.sweep as sweep

    calls = []

    def fake_proc(dir_path, env_extra=None):
        calls.append((dir_path, (env_extra or {}).get("TPU_VISIBLE_DEVICES")))
        return 0 if "bad" not in dir_path else 7

    monkeypatch.setattr(sweep, "run_experiment_process", fake_proc)
    res = sweep.run_sweep(["a", "bad", "c"], jobs=2, device_ids=[0, 1])
    assert res == {"a": 0, "bad": 7, "c": 0}
    devs = dict(calls)
    assert devs["a"] == "0" and devs["bad"] == "1" and devs["c"] == "0"


def test_run_sweep_inproc_contains_failures(tmp_path, monkeypatch):
    """In-process mode: configs run via pipeline.run in THIS process, a
    failing config is contained (exit 1) and the rest still run — the
    reference pipeline's stage-failure containment applied per config
    (waveform_pipeline.py:12-22)."""
    import scgrhc.pipeline.run as pipeline_run
    import scgrhc.pipeline.sweep as sweep

    ran = []

    def fake_run(params):
        ran.append(params.dir_path)
        if "bad" in params.dir_path:
            raise RuntimeError("boom")

    class FakeParams:
        def __init__(self, path):
            self.dir_path = os.path.dirname(path)

    monkeypatch.setattr(pipeline_run, "run", fake_run)
    monkeypatch.setattr(sweep, "run_experiment_process", None)  # must not be used
    import scgrhc.core.params as params_mod

    monkeypatch.setattr(params_mod, "Params", FakeParams)
    res = sweep.run_sweep(["a", "bad", "c"], jobs=1, inproc=True)
    assert res == {"a": 0, "bad": 1, "c": 0}
    assert ran == ["a", "bad", "c"]
    with pytest.raises(ValueError):
        sweep.run_sweep(["a"], jobs=2, inproc=True)


def test_trace_noop_without_env(monkeypatch):
    from scgrhc.core import trace as tr

    monkeypatch.delenv(tr.ENV_VAR, raising=False)
    with tr.trace("x"):
        pass
    with tr.annotate("y"):
        pass


def test_trace_writes_profile(tmp_path, monkeypatch):
    from scgrhc.core import trace as tr

    monkeypatch.setenv(tr.ENV_VAR, str(tmp_path))
    import jax.numpy as jnp

    with tr.trace("unit"):
        with tr.annotate("op"):
            (jnp.ones(8) * 2).block_until_ready()
    # a trace directory with at least one event file appears
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(tmp_path / "unit")
        for f in fs
    ]
    assert files, "no profiler output written"


def test_prune_checkpoints_keeps_first_best_last(tmp_path):
    """``sweep --prune`` reclaims a finished config's checkpoints but must
    never remove the first, the selected best (checkpoint_best.txt), or
    the last (resume point)."""
    from scgrhc.pipeline.sweep import prune_checkpoints

    d = tmp_path / "waveform_06"
    cdir = d / "checkpoints"
    os.makedirs(cdir)
    for ep in range(6):
        (cdir / f"{ep:03d}.checkpoint").write_bytes(b"x")
    (d / "checkpoint_best.txt").write_text(
        "checkpoint         003.checkpoint\npcc_r  0.5\n"
    )
    assert prune_checkpoints(str(d)) == 3
    assert sorted(os.listdir(cdir)) == [
        "000.checkpoint", "003.checkpoint", "005.checkpoint"
    ]
    # idempotent; and a dir with no checkpoints is a no-op
    assert prune_checkpoints(str(d)) == 0
    assert prune_checkpoints(str(tmp_path / "missing")) == 0


def test_run_sweep_prune_only_on_success(tmp_path, monkeypatch):
    from scgrhc.pipeline import sweep as sweep_mod

    dirs = []
    for name, code in (("ok", 0), ("bad", 1)):
        d = tmp_path / name
        os.makedirs(d / "checkpoints")
        for ep in range(3):
            (d / "checkpoints" / f"{ep:03d}.checkpoint").write_bytes(b"x")
        dirs.append(str(d))

    monkeypatch.setattr(
        sweep_mod, "run_experiment_process",
        lambda d, env_extra=None: 1 if d.endswith("bad") else 0,
    )
    results = sweep_mod.run_sweep(dirs, jobs=1, prune=True)
    assert results[dirs[0]] == 0 and results[dirs[1]] == 1
    assert len(os.listdir(tmp_path / "ok" / "checkpoints")) == 2  # first+last
    assert len(os.listdir(tmp_path / "bad" / "checkpoints")) == 3  # untouched


def test_prune_checkpoints_handles_orbax_dirs(tmp_path):
    from scgrhc.pipeline.sweep import prune_checkpoints

    d = tmp_path / "waveform_06"
    cdir = d / "checkpoints"
    os.makedirs(cdir)
    for ep in range(5):
        os.makedirs(cdir / f"{ep:03d}.checkpoint.orbax")
        (cdir / f"{ep:03d}.checkpoint.orbax" / "meta.json").write_text("{}")
    (d / "checkpoint_best.txt").write_text(
        "checkpoint         002.checkpoint\n"
    )
    assert prune_checkpoints(str(d)) == 2
    assert sorted(os.listdir(cdir)) == [
        "000.checkpoint.orbax", "002.checkpoint.orbax", "004.checkpoint.orbax"
    ]
