"""Device-mesh parallelism: named axes (data/time/model/stage), DP
training, sequence-parallel streaming, TP hooks, 2-stage pipeline
inference, and the comm layer (SURVEY §2.3-2.4)."""

from scgrhc.parallel.mesh import (
    DATA_AXIS,
    TIME_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from scgrhc.parallel.pp import STAGE_AXIS

__all__ = [
    "DATA_AXIS", "TIME_AXIS", "STAGE_AXIS", "make_mesh", "batch_sharding",
    "replicate", "shard_batch",
]
