"""Checkpoint scoring/selection (reference parity: waveform_checkpoint.py).
Stage entry: ``scgrhc.select.run.run``."""

from scgrhc.select.run import get_checkpoint_scores, get_float_array

__all__ = ["get_checkpoint_scores", "get_float_array"]
