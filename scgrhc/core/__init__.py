from scgrhc.core.params import Params
from scgrhc.core.paths import DATA_PATH, PROCESSED_DATA_PATH, get_processed_data_path
from scgrhc.core.timelog import timelog

__all__ = [
    "Params",
    "DATA_PATH",
    "PROCESSED_DATA_PATH",
    "get_processed_data_path",
    "timelog",
]
