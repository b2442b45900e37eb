from scgrhc.train import checkpoint, run, wgan
from scgrhc.train.wgan import TrainConfig, TrainState, init_state, train_step

__all__ = [
    "checkpoint",
    "run",
    "wgan",
    "TrainConfig",
    "TrainState",
    "init_state",
    "train_step",
]
