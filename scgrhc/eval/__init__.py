"""Evaluation: batched inference + on-device metrics (reference parity:
waveform_test.py).  Stage entry: ``scgrhc.eval.run.run``."""

from scgrhc.eval.infer import predict_split
from scgrhc.eval.metrics import global_scores, pearson_r, rmse, segment_scores

__all__ = ["predict_split", "pearson_r", "rmse", "segment_scores", "global_scores"]
