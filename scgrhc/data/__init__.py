from scgrhc.data.loaders import SegmentLoader, load_dataloader
from scgrhc.data.split import split_indices, split_segments
from scgrhc.data.store import (
    NORM_EPS,
    SegmentStore,
    get_global_minmax_vals,
    minmax_norm,
    reverse_minmax,
)

__all__ = [
    "SegmentLoader",
    "load_dataloader",
    "split_indices",
    "split_segments",
    "SegmentStore",
    "get_global_minmax_vals",
    "minmax_norm",
    "reverse_minmax",
    "NORM_EPS",
]
