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
        bench.main()
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0
