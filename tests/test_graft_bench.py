"""Driver-contract smoke tests: __graft_entry__ and bench.py stay importable
and functional (the driver compile-checks/executes them every round)."""

import json
import subprocess
import sys

import pytest

import numpy as np

import jax


def test_entry_jittable():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 1, ge.T)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    ge.dryrun_multichip(8)


@pytest.mark.slow
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
    assert rec["eval_batch"] == 256  # knob default


@pytest.mark.slow
def test_bench_eval_mode_eval_batch():
    """--eval-batch shapes the chunking (BENCH.md stack×batch matrix)."""
    rec = _run_mode(["--mode", "eval", "--ckpts", "3", "--segments", "8",
                     "--stack", "2", "--eval-batch", "4"])
    assert rec["metric"] == "eval_all_throughput"
    assert rec["eval_batch"] == 4


def test_bench_data_mode():
    rec = _run_mode(["--mode", "data"])
    assert rec["metric"] == "data_stage_throughput"
    assert rec["segments"] > 0


def test_compile_budget_timeout_detaches_child(monkeypatch, tmp_path):
    """A run that exceeds --compile-budget emits ONE budget-exceeded JSON
    line and leaves the child alive (killing a client mid-remote-compile
    wedges the chip — bench.py deliberately detaches instead)."""
    import os
    import signal
    import time

    import bench

    monkeypatch.setenv("SCGRHC_BENCH_TEST_SLEEP", "30")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = bench.main(["--mode", "data", "--compile-budget", "1.5"])
    assert rc == 0
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["error"] == "compile-budget-exceeded"
    assert rec["metric"] == "bench_compile_budget"
    pid = rec["detached_pid"]
    os.kill(pid, 0)  # child still alive (not killed by the guard)
    os.kill(pid, signal.SIGKILL)  # clean up (safe: it is only sleeping)
    try:
        os.unlink(rec["detached_output"])
    except OSError:
        pass


def test_compile_budget_passthrough(monkeypatch):
    """A run that finishes within --compile-budget passes the child's JSON
    line through unchanged."""
    import bench
    import io
    from contextlib import redirect_stdout

    monkeypatch.delenv("SCGRHC_BENCH_TEST_SLEEP", raising=False)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = bench.main(["--mode", "data", "--compile-budget", "300"])
    assert rc == 0
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["metric"] == "data_stage_throughput"
    assert rec["value"] > 0


@pytest.mark.slow
def test_bench_train_mode():
    rec = _run_mode(["--mode", "train", "--batch", "4", "--nb", "2"])
    assert rec["metric"] == "wgan_train_throughput"


@pytest.mark.slow
def test_bench_stream_mode():
    rec = _run_mode(["--mode", "stream", "--minutes", "0.5"])
    assert rec["metric"] == "stream_infer_xrealtime"
