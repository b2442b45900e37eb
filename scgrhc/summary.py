"""Cohort statistics report (reference parity: summary.py).

Standalone descriptive-stats tool over all records: merges per-record
sidecar JSON demographics + maclab measurements (reference: summary.py:
11-33), flags channel presence per record (summary.py:36-49), sums
per-chamber catheter dwell time (summary.py:52-65), and prints min/max/
mean±sd/sum with male-vs-female significance tests (t-test for continuous
vars, rank-sum for NYHA class), boolean counts, missing values, and BMI,
for the full cohort and per-gender strata (summary.py:68-189).

Differences from the reference: record I/O goes through scgrhc's own WFDB
reader instead of the wfdb package, and variables absent from every
sidecar are skipped with a note instead of raising KeyError, so the tool
also runs on partial/synthetic databases.
"""

from __future__ import annotations

import json
import os

import numpy as np

from scgrhc.core import paths
from scgrhc.io.catalog import SAMPLE_FREQ, get_record_names, read_record
from scgrhc.io.sidecar import get_chamber_intervals

CHAMBERS = ("RA", "RV", "PA", "PCW")

CONTINUOUS_VARS = [
    "age", "bmi", "sbp", "dbp", "RA", "RV", "PA", "PCW",
    "RAA Wave", "RAV Wave", "RAM", "RAHR",
    "RVS", "RVD", "RVEDP", "RVHR",
    "PAS", "PAD", "PAM", "PAHR",
    "PCWA Wave", "PCWV Wave", "PCWM", "PCWHR",
    "Fick COL/min", "TDCOL/min", "TDCIL/min/m^2", "Avg. COmL/min",
    "SVmL/beat",
]

BOOLEAN_VARS = [
    "Missing_MaclabRHC", "fine_alignment", "outpatient",
    "patch_ECG", "patch_ACC_lat", "patch_ACC_hf", "patch_ACC_dv",
    "patch_Hum", "patch_Pre", "patch_Temp",
    "RHC_pressure", "ART",
    "ECG_lead_I", "ECG_lead_II", "ECG_lead_III", "aVR", "aVL", "aVF",
    "ECG_lead_V1", "ECG_lead_V2", "ECG_lead_V3", "ECG_lead_V4",
    "ECG_lead_V5", "ECG_lead_V6", "PLETH", "RESP",
]


def get_modified_maclab_meas(original: dict) -> dict:
    """Strip key whitespace; string values (unparseable measurements)
    become NaN (reference: summary.py:11-18)."""
    modified = {}
    for key, val in original.items():
        key = key.strip()
        modified[key] = np.nan if isinstance(val, str) else val
    return modified


def get_df() -> dict:
    """record_name → merged sidecar row (reference: summary.py:22-33)."""
    df = {}
    for record_name in get_record_names():
        path = os.path.join(paths.PROCESSED_DATA_PATH, f"{record_name}.json")
        with open(path, "r") as f:
            data = json.load(f)
        data["record_name"] = record_name
        if "sbp" in data:
            data["sbp"] = np.nan if data["sbp"] == -1 else data["sbp"]
        if "dbp" in data:
            data["dbp"] = np.nan if data["dbp"] == -1 else data["dbp"]
        data.update(get_modified_maclab_meas(data.get("maclabMeas", {})))
        df[record_name] = data
    return df


def get_signal_names(records) -> set:
    names: set[str] = set()
    for record in records:
        names.update(record.sig_name)
    return names


def add_signal_presence(df: dict) -> None:
    """Boolean column per channel name seen anywhere in the cohort
    (reference: summary.py:36-49)."""
    record_names = list(df.keys())
    records = [read_record(name) for name in record_names]
    signal_names = get_signal_names(records)
    for record_name, record in zip(record_names, records):
        for signal_name in signal_names:
            df[record_name][signal_name] = signal_name in record.sig_name


def add_chamber_durations(df: dict) -> None:
    """Per-chamber catheter dwell time in seconds
    (reference: summary.py:52-65)."""
    for record_name in df.keys():
        for chamber in CHAMBERS:
            total = 0.0
            for start, end in get_chamber_intervals(record_name, chamber):
                total += (end - start) / SAMPLE_FREQ
            df[record_name][chamber] = total


# NOTE: every printed line below is a byte-level parity contract with the
# reference report (reference: summary.py:68-92) — the *strings* are pinned,
# the code around them is not.


def _by_gender(df, var: str):
    male = df.loc[df["gender"] == "Male", var]
    female = df.loc[df["gender"] == "Female", var]
    return male, female


def summarize_continuous(df, var: str, gender_stratified: bool) -> None:
    from scipy.stats import ttest_ind

    if var not in df.columns:
        print(f"{var}\n  (absent)")
        return
    col = df[var]
    lines = [
        var,
        f"  Min {col.min():.2f}",
        f"  Max {col.max():.2f}",
        f"  Avg {col.mean():.2f} ± {col.std():.2f}",
        f"  Sum {col.sum():.2f}",
    ]
    if not gender_stratified and "gender" in df.columns:
        stat = ttest_ind(*_by_gender(df, var), nan_policy="omit")
        lines.append(f"  Sig {stat.pvalue:.2f}")
    print("\n".join(lines))


def summarize_boolean(df, var: str) -> None:
    if var not in df.columns:
        print(f"{var}\n  (absent)")
        return
    counts = df[var].value_counts()
    print("\n".join([var, f"  Y {counts.get(True)}", f"  N {counts.get(False)}"]))


def show_missing_vals(df) -> None:
    na_counts = df.isna().sum()
    print("Missing vals:")
    print(na_counts[na_counts > 0])


def summarize(df, gender_stratified: bool) -> None:
    from scipy.stats import ranksums

    for var in CONTINUOUS_VARS:
        summarize_continuous(df, var, gender_stratified)
    for var in BOOLEAN_VARS:
        summarize_boolean(df, var)

    if "NYHAC" in df.columns:
        print("NYHAC")
        for c in (1, 2, 3, 4):
            print(f"  {c} {df['NYHAC'].value_counts().get(c)}")
        if not gender_stratified and "gender" in df.columns:
            group1 = df[df["gender"] == "Male"]["NYHAC"]
            group2 = df[df["gender"] == "Female"]["NYHAC"]
            _, p_value = ranksums(group1, group2, nan_policy="omit")
            print(f"  Sig {p_value}")

    show_missing_vals(df)


def main() -> None:
    import pandas as pd

    df = get_df()
    add_signal_presence(df)
    add_chamber_durations(df)
    df = pd.DataFrame.from_dict(list(df.values()))
    if {"weight", "height"} <= set(df.columns):
        df["bmi"] = df["weight"] / ((df["height"] / 100) ** 2)

    print("\n----- All -----")
    summarize(df, gender_stratified=False)

    if "gender" in df.columns:
        print("\n----- Male -----")
        summarize(df[df["gender"] == "Male"], gender_stratified=True)
        print("\n----- Female -----")
        summarize(df[df["gender"] == "Female"], gender_stratified=True)


if __name__ == "__main__":
    main()
