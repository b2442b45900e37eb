from scgrhc.dsp.noise import (
    has_flat_lines,
    has_noise,
    has_noise_batch_jax,
    in_rhc_range,
    is_straight_line,
)
from scgrhc.dsp.segment import Segment, gate_windows, get_segments, segment_interval

__all__ = [
    "has_flat_lines",
    "has_noise",
    "has_noise_batch_jax",
    "in_rhc_range",
    "is_straight_line",
    "Segment",
    "gate_windows",
    "get_segments",
    "segment_interval",
]
