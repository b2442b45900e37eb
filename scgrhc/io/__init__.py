from scgrhc.io.wfdb import Record, rdrecord, wrrecord
from scgrhc.io.sidecar import get_chamber_intervals, read_sidecar
from scgrhc.io.catalog import SAMPLE_FREQ, get_channels, get_record_names, read_record

__all__ = [
    "Record",
    "rdrecord",
    "wrrecord",
    "get_chamber_intervals",
    "read_sidecar",
    "SAMPLE_FREQ",
    "get_channels",
    "get_record_names",
    "read_record",
]
