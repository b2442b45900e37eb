"""CLI dispatch surface (scgrhc.__main__ / pipeline.run.dispatch)."""

import pytest


def test_help(capsys):
    from scgrhc.__main__ import main

    assert main(["--help"]) == 0
    out = capsys.readouterr().out
    for cmd in ("data", "train", "test", "select", "summary", "predict",
                "sweep", "report", "plots", "demo", "export"):
        assert cmd in out


def test_all_runs_reference_range(monkeypatch):
    """'all' sweeps waveform_06..33, like waveform_pipeline.py:33-37."""
    import scgrhc.pipeline.run as pr

    seen = []
    monkeypatch.setattr(pr, "run", lambda params: seen.append(params.path))
    monkeypatch.setattr(
        pr, "Params", lambda path: type("P", (), {"path": path})()
    )
    assert pr.dispatch(["all"]) == 0
    assert len(seen) == 28
    assert seen[0].startswith("waveform_06") and seen[-1].startswith("waveform_33")


def test_stage_dispatch_calls(monkeypatch, tmp_path):
    import json

    import scgrhc.pipeline.run as pr

    d = tmp_path / "exp"
    d.mkdir()
    (d / "params.json").write_text(json.dumps({
        "dir_path": str(d), "in_channels": ["a"], "chamber": "PA",
        "segment_size": 1.5, "batch_size": 4, "train_path": "t",
        "valid_path": "v", "test_path": "s", "checkpoint_dir_path": "c",
        "comparison_dir_path": "co", "pred_top_dir_path": "p1",
        "pred_rand_dir_path": "p2", "alpha": 1e-4, "beta1": 0.5,
        "beta2": 0.999, "n_critic": 2, "lambda_gp": 10, "lambda_aux": 100,
        "total_epochs": 1, "min_RHC": -50, "use_global_min_max": False,
    }))

    calls = []
    import scgrhc.data.run as data_run
    import scgrhc.eval.run as eval_run
    import scgrhc.select.run as select_run
    import scgrhc.train.run as train_run

    monkeypatch.setattr(data_run, "run", lambda p: calls.append("data"))
    monkeypatch.setattr(train_run, "run", lambda p: calls.append("train"))
    monkeypatch.setattr(eval_run, "run", lambda p, s, c: calls.append(("test", s, c)))
    monkeypatch.setattr(select_run, "run", lambda p: calls.append("select"))

    assert pr.dispatch(["data", str(d)]) == 0
    assert pr.dispatch(["train", str(d)]) == 0
    assert pr.dispatch(["test", str(d), "valid", "all"]) == 0
    assert pr.dispatch(["select", str(d)]) == 0
    assert calls == ["data", "train", ("test", "valid", "all"), "select"]


def test_unknown_sweep_flag():
    import scgrhc.pipeline.run as pr

    with pytest.raises(SystemExit):
        pr.dispatch(["sweep", ".", "--bogus"])


def test_main_skips_cache_config_for_sweep(monkeypatch):
    """The sweep parent may fan out child processes; __main__ must not
    resolve a jax backend first (instantiating the device client starves
    children on exclusive-access TPU hosts).  Every other command keeps
    the before-dispatch cache setup."""
    import scgrhc
    import scgrhc.pipeline.run as pr
    from scgrhc.__main__ import main

    configured = []
    monkeypatch.setattr(
        scgrhc, "configure_compilation_cache", lambda: configured.append(True)
    )
    monkeypatch.setattr(pr, "dispatch", lambda argv: 0)
    assert main(["sweep", "x", "--jobs", "2"]) == 0
    assert configured == []
    assert main(["report", "x"]) == 0
    assert configured == [True]


def test_sweep_configures_cache_only_inproc(monkeypatch, tmp_path):
    """Inside the sweep branch, only the in-process runner (the process
    that actually compiles) configures the persistent cache; the subproc
    fan-out leaves backend resolution to the children."""
    import scgrhc
    import scgrhc.pipeline.run as pr
    import scgrhc.pipeline.sweep as sweep_mod
    import scgrhc.utils.experiments as exp_mod

    configured = []
    monkeypatch.setattr(
        scgrhc, "configure_compilation_cache", lambda: configured.append(True)
    )
    monkeypatch.setattr(
        exp_mod, "write_experiments", lambda root, **kw: ["d1"]
    )
    monkeypatch.setattr(
        sweep_mod, "run_sweep",
        lambda dirs, jobs, inproc, prune=False: {d: 0 for d in dirs},
    )

    assert pr.dispatch(["sweep", str(tmp_path), "--jobs", "2"]) == 0
    assert configured == []  # subproc fan-out: parent stays backend-free
    assert pr.dispatch(["sweep", str(tmp_path), "--fast"]) == 0
    assert configured == [True]  # jobs=1 --fast -> in-process runner
