"""Driver-contract smoke tests: __graft_entry__ and bench.py stay importable
and functional (the driver compile-checks/executes them every round)."""

import json
import subprocess
import sys

import numpy as np

import jax


def test_entry_jittable():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 1, ge.T)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    ge.dryrun_multichip(8)


def test_bench_json_line(monkeypatch):
    """bench.py main() prints exactly one valid JSON line with the
    required keys (tiny shapes via monkeypatch: CPU-friendly)."""
    import bench

    monkeypatch.setattr(bench, "BATCH", 4)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main([])
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0


def _run_mode(argv, monkeypatch=None):
    import io
    from contextlib import redirect_stdout

    import bench

    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main(argv)
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0
    return rec


def test_bench_eval_mode():
    rec = _run_mode(["--mode", "eval", "--ckpts", "3", "--segments", "8",
                     "--stack", "2"])
    assert rec["metric"] == "eval_all_throughput"


def test_bench_data_mode():
    rec = _run_mode(["--mode", "data"])
    assert rec["metric"] == "data_stage_throughput"
    assert rec["segments"] > 0


import pytest


@pytest.mark.slow
def test_bench_train_mode():
    rec = _run_mode(["--mode", "train", "--batch", "4", "--nb", "2"])
    assert rec["metric"] == "wgan_train_throughput"


@pytest.mark.slow
def test_bench_stream_mode():
    rec = _run_mode(["--mode", "stream", "--minutes", "0.5"])
    assert rec["metric"] == "stream_infer_xrealtime"
