"""Cohort summary tool tests (reference: summary.py)."""

import numpy as np


def test_modified_maclab_meas():
    from scgrhc.summary import get_modified_maclab_meas

    out = get_modified_maclab_meas({" PAS": 33.0, "RVS ": "n/a", "PAM": 21})
    assert out["PAS"] == 33.0
    assert np.isnan(out["RVS"])
    assert out["PAM"] == 21


def test_summary_pipeline(use_synth_db, capsys):
    import pandas as pd

    from scgrhc.summary import (
        add_chamber_durations,
        add_signal_presence,
        get_df,
        main,
        summarize,
    )

    df = get_df()
    assert len(df) == 2
    row = next(iter(df.values()))
    # maclab keys merged with whitespace stripped (reference: summary.py:11-18)
    assert "PAS" in row and "PAD" in row
    # sbp == -1 → NaN (reference: summary.py:28-29)
    assert any(np.isnan(v.get("sbp", 0.0)) for v in df.values())

    add_signal_presence(df)
    assert row["RHC_pressure"] is True
    assert row["patch_ACC_lat"] is True

    add_chamber_durations(df)
    for v in df.values():
        # four chambers, each an equal slice of the 120 s record
        for ch in ("RA", "RV", "PA", "PCW"):
            assert 20.0 < v[ch] <= 40.0

    # the full report runs and prints all sections
    main()
    out = capsys.readouterr().out
    assert "----- All -----" in out and "----- Male -----" in out
    assert "NYHAC" in out and "Missing vals:" in out
    assert "bmi" in out


def test_cli_summary_dispatch(use_synth_db, capsys, monkeypatch):
    from scgrhc.pipeline.run import dispatch

    assert dispatch(["summary"]) == 0
    assert "----- All -----" in capsys.readouterr().out
