"""Sweep report aggregation (scgrhc.pipeline.report)."""

import json
import os

import pandas as pd


def _fake_experiment(root, name, chamber, channels, pcc):
    d = os.path.join(root, name)
    os.makedirs(d)
    cfg = {"chamber": chamber, "in_channels": channels}
    with open(os.path.join(d, "params.json"), "w") as f:
        json.dump(cfg, f)
    pd.DataFrame(
        [
            {"checkpoint": "000.checkpoint", "pcc_r": pcc - 0.1,
             "pcc_ci95_lower": 0, "pcc_ci95_upper": 0, "rmse": 5.0,
             "rmse_ci95_lower": 0, "rmse_ci95_upper": 0},
            {"checkpoint": "001.checkpoint", "pcc_r": pcc,
             "pcc_ci95_lower": 0, "pcc_ci95_upper": 0, "rmse": 4.0,
             "rmse_ci95_lower": 0, "rmse_ci95_upper": 0},
        ]
    ).to_csv(os.path.join(d, "checkpoint_scores.csv"), index=False)


def test_report_ranks_and_labels(tmp_path, capsys):
    from scgrhc.pipeline.report import run

    _fake_experiment(tmp_path, "waveform_06", "PA",
                     ["patch_ACC_lat", "patch_ACC_hf"], 0.6)
    _fake_experiment(tmp_path, "waveform_11", "RV", ["patch_ECG"], 0.8)
    os.makedirs(tmp_path / "not_an_experiment")

    out = run(str(tmp_path))
    df = pd.read_csv(out)
    assert list(df["experiment"]) == ["waveform_11", "waveform_06"]  # ranked
    assert df.iloc[0]["checkpoint"] == "001.checkpoint"  # best row picked
    assert df.iloc[1]["in_channels"] == "lat+hf"
    assert "waveform_11" in capsys.readouterr().out


def test_report_empty_root(tmp_path, capsys):
    from scgrhc.pipeline.report import run

    assert run(str(tmp_path)) is None
