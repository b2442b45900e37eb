"""Named-axis communication layer (SURVEY §2.4).

The reference has no distributed backend at all — inter-stage transport
is the local filesystem (reference: recordutil.py:202-209,
waveform_train.py:411).  This module is the thin comm tier the TPU
rebuild routes every collective through: callers speak mesh-axis NAMES
(``data``, ``time``), never backends, so single-chip, one-host-N-chip
(ICI), and multi-host pods (DCN between hosts, ICI within) are the same
code.  Inside ``shard_map`` these lower to XLA collectives riding the
interconnect; there is no NCCL/MPI analog to manage.
"""

from __future__ import annotations

import jax
from jax import lax

from scgrhc.parallel.mesh import DATA_AXIS


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-controller runtime (multi-host pods).

    No-op when unconfigured: single-process runs (one host, any number of
    local chips) need no initialization.  On TPU pods the three arguments
    are usually auto-detected from the environment, so ``init_distributed()``
    with no arguments is correct there too.
    """
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            return  # single-process: nothing to join
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the artifact-writing process.

    Multi-controller discipline: every process runs the same compute
    (collectives need all participants), but exactly ONE process may write
    shared-filesystem artifacts — checkpoints, CSVs, record_log, loss
    plots, checkpoint_best.txt — or N processes race on the same paths.
    Single-process runs are always primary, so single-host code pays
    nothing for the guard.
    """
    return jax.process_index() == 0


def barrier(name: str = "scgrhc") -> None:
    """Cross-process sync point (e.g. non-primary processes must not read
    a checkpoint the primary is still writing).  No-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


# -- collective helpers (for use inside shard_map over a named mesh) ----------


def all_reduce_mean(x, axis: str = DATA_AXIS):
    """Mean over the named axis (gradient averaging in hand-rolled DP;
    pjit-traced DP inserts this automatically)."""
    return lax.pmean(x, axis_name=axis)


def all_reduce_sum(x, axis: str = DATA_AXIS):
    return lax.psum(x, axis_name=axis)


def all_gather(x, axis: str = DATA_AXIS, *, tiled: bool = True):
    """Gather shards along the named axis (e.g. collecting per-chip eval
    metrics)."""
    return lax.all_gather(x, axis_name=axis, tiled=tiled)


def shard_index(axis: str = DATA_AXIS):
    return lax.axis_index(axis_name=axis)
