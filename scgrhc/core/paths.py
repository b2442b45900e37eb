"""Dataset location.

The reference hard-codes ``/home/jesse/scg-rhc-database`` (reference:
pathutil.py:4-6).  We keep that as the default for drop-in compatibility but
allow overriding via the ``SCGRHC_DATA`` environment variable or
:func:`set_data_path`, which is what the tests' fake in-memory/on-disk record
stores use (SURVEY.md §4 "a fake record store standing in for the hard-coded
path").
"""

from __future__ import annotations

import os
import shutil

_DEFAULT_DATA_PATH = os.path.join("/", "home", "jesse", "scg-rhc-database")

DATA_PATH = os.environ.get("SCGRHC_DATA", _DEFAULT_DATA_PATH)
PROCESSED_DATA_PATH = os.path.join(DATA_PATH, "processed_data")


def set_data_path(path: str) -> None:
    """Point the framework at a different dataset root (e.g. a test fixture)."""
    global DATA_PATH, PROCESSED_DATA_PATH
    DATA_PATH = path
    PROCESSED_DATA_PATH = os.path.join(path, "processed_data")


def get_processed_data_path() -> str:
    """Current processed-data directory (respects :func:`set_data_path`)."""
    return PROCESSED_DATA_PATH


def clear(paths: list[str]) -> None:
    """Remove-and-recreate each existing directory (reference: pathutil.py:9-14)."""
    for path in paths:
        if os.path.exists(path):
            shutil.rmtree(path)
            os.makedirs(path)
            print(f"Cleared {path}")


def clear_comparisons_valid() -> None:
    """Wipe every experiment's ``comparisons/valid`` (reference: pathutil.py:17-19)."""
    paths = [
        os.path.join(p, "comparisons", "valid") for p in sorted(os.listdir(os.getcwd()))
    ]
    clear(paths)
