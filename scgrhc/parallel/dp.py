"""Data-parallel WGAN-GP training over a device mesh.

TPU-native replacement for the distributed training the reference never
had (reference: waveform_train.py:329-332 is its entire device story).
The already-jitted :func:`scgrhc.train.wgan.train_step` is compiled with
explicit shardings: train state replicated, batch sharded on the ``data``
axis.  XLA GSPMD then partitions every forward/backward (including the
second-order gradient-penalty pass) across chips and inserts the gradient
all-reduce collectives over ICI — no hand-written NCCL/MPI analog exists
or is needed.
"""

from __future__ import annotations

import jax

from scgrhc.parallel.mesh import make_mesh, replicate, shard_batch
from scgrhc.train.wgan import TrainConfig, train_step


class DataParallelTrainer:
    """Wraps train_step with mesh placement for state and batches.

    Batches whose leading dim is not divisible by the mesh size are
    handled by the loader (`drop_last` or pad); this class asserts
    divisibility so a silent uneven shard never ships.
    """

    def __init__(self, mesh=None, n_devices: int | None = None):
        self.mesh = mesh if mesh is not None else make_mesh(n_devices)
        self.n = self.mesh.devices.size

    def place_state(self, state):
        return replicate(self.mesh, state)

    def step(self, state, scg, rhc, rng, cfg: TrainConfig):
        assert scg.shape[0] % self.n == 0, (
            f"batch {scg.shape[0]} not divisible by mesh size {self.n}"
        )
        scg, rhc = shard_batch(self.mesh, scg, rhc)
        return train_step(state, scg, rhc, rng, cfg)


@jax.jit
def eval_forward(g_params, scg):
    """Batched generator forward; shard ``scg`` dim 0 on the ``data`` axis
    (via :func:`scgrhc.parallel.mesh.shard_batch`) to split eval across
    chips — GSPMD propagates the sharding through the whole U-Net."""
    from scgrhc.models import generator

    return generator.apply(g_params, scg, train=False)
