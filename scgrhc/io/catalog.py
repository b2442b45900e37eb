"""Record catalog: enumerate records and slice named channels.

Mirrors the reference's record access layer (reference: recordutil.py:19,
82-90, 113-119) on top of our own WFDB reader.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from scgrhc.core import paths
from scgrhc.io.wfdb import Record, rdrecord

SAMPLE_FREQ = 500  # Hz (reference: recordutil.py:19)


def get_record_names(processed_dir: str | None = None) -> list[str]:
    """Record stems present in the processed-data directory (any file with a
    ``.dat`` or ``.hea`` extension; reference: recordutil.py:82-90)."""
    base = processed_dir if processed_dir is not None else paths.PROCESSED_DATA_PATH
    names = set()
    for filename in os.listdir(base):
        if filename.endswith(".dat") or filename.endswith(".hea"):
            names.add(Path(filename).stem)
    return sorted(names)


def read_record(record_name: str, processed_dir: str | None = None) -> Record:
    base = processed_dir if processed_dir is not None else paths.PROCESSED_DATA_PATH
    return rdrecord(os.path.join(base, record_name))


def get_channels(
    record: Record, channel_names: list[str], start_idx: int, stop_idx: int
) -> np.ndarray:
    """Slice named channels from a record (reference: recordutil.py:113-119).

    Returns (stop_idx - start_idx, len(channel_names)) float64.
    """
    indexes = [record.sig_name.index(name) for name in channel_names]
    return record.p_signal[start_idx:stop_idx, indexes]
