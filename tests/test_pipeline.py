"""Full orchestrator test (reference: waveform_pipeline.py:10-40)."""

import json
import os

import pytest


@pytest.fixture()
def tiny_experiment(tmp_path, monkeypatch):
    from scgrhc.core import paths
    from scgrhc.utils.synth import make_synthetic_database

    db = make_synthetic_database(str(tmp_path / "db"), n_records=2, duration_s=60.0)
    monkeypatch.setattr(paths, "DATA_PATH", os.path.dirname(db))
    monkeypatch.setattr(paths, "PROCESSED_DATA_PATH", db)
    d = tmp_path / "exp"
    os.makedirs(d)
    cfg = {
        "dir_path": str(d),
        "in_channels": ["patch_ACC_lat"],
        "chamber": "RA", "segment_size": 1.5, "batch_size": 64,
        "train_path": "loader_train.pickle",
        "valid_path": "loader_valid.pickle",
        "test_path": "loader_test.pickle",
        "checkpoint_dir_path": "checkpoints",
        "comparison_dir_path": "comparisons",
        "pred_top_dir_path": "pred_top", "pred_rand_dir_path": "pred_rand",
        "alpha": 1e-4, "beta1": 0.5, "beta2": 0.999,
        "n_critic": 2, "lambda_gp": 10, "lambda_aux": 100,
        "total_epochs": 2, "min_RHC": -50, "use_global_min_max": False,
        "seed": 0,
    }
    (d / "params.json").write_text(json.dumps(cfg))
    return d


@pytest.mark.slow
def test_pipeline_run_end_to_end(tiny_experiment, monkeypatch):
    """data → train → eval-valid(all) → select → eval-test(best), with the
    checkpoint_best.txt handshake (waveform_pipeline.py:26-28)."""
    from scgrhc.core.params import Params
    from scgrhc.pipeline.run import run

    params = Params(str(tiny_experiment / "params.json"))
    monkeypatch.setattr(params.__class__, "eval_batch", 64, raising=False)
    run(params)

    d = str(tiny_experiment)
    assert sorted(os.listdir(os.path.join(d, "checkpoints"))) == [
        "000.checkpoint", "001.checkpoint",
    ]
    assert sorted(os.listdir(os.path.join(d, "comparisons", "valid"))) == [
        "000.csv", "001.csv",
    ]
    assert os.path.exists(os.path.join(d, "checkpoint_scores.csv"))
    with open(os.path.join(d, "checkpoint_best.txt")) as f:
        best = f.read().splitlines()[0].split()[1]
    # the best checkpoint got the final test eval
    assert os.listdir(os.path.join(d, "comparisons", "test")) == [
        f"{best.split('.')[0]}.csv"
    ]

    # a re-run is fully idempotent (data guard swallowed, train resumes
    # and skips, eval skips processed CSVs — waveform_pipeline.py:12-22)
    run(Params(str(tiny_experiment / "params.json")))
