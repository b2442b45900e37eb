"""Device mesh + named-axis sharding helpers.

The reference has no distributed execution at all — its only device logic
is a cuda-or-cpu pick (reference: waveform_train.py:329-332).  Here every
layer above this module speaks in named mesh axes:

  * ``data``  — batch/segment dimension (data parallelism; gradient
    all-reduce rides ICI implicitly through XLA GSPMD);
  * ``time``  — segment-window dimension of one long record (sequence
    parallelism for whole-record streaming inference; windows are
    independent because normalization is per-window, so this sharding is
    numerically exact).

Multi-host: callers run ``jax.distributed.initialize`` first; the mesh is
built over ``jax.devices()`` either way, so single-chip, one-host-N-chip,
and multi-host pods all go through the same code path.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TIME_AXIS = "time"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str | None = None) -> NamedSharding:
    """Shard dim 0 (batch/segments) across the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis or mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place arrays with dim 0 sharded across the mesh."""
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out[0] if len(out) == 1 else out


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: place_global(x, s), tree)


def place_global(arr, sharding: NamedSharding):
    """Place host data under a sharding that may span multiple processes.

    Single-controller this is ``device_put``.  Multi-controller,
    ``device_put`` cannot address other hosts' devices, so the global
    array is assembled from each process's local portion
    (``jax.make_array_from_process_local_data``) — for replicated specs
    every process contributes the full array (all read the same loader
    files off the shared filesystem), for sharded specs its local slice.
    """
    import numpy as np

    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_process_local_data(sharding, arr, arr.shape)


def fetch_global(arr):
    """``np.asarray`` for a jax.Array that may span non-addressable
    devices — the download-side twin of :func:`place_global`.

    Single-controller (or a fully-addressable array) this is a plain
    ``np.asarray``.  Multi-controller, a batch-sharded eval output lives
    partly on other hosts' devices, which ``__array__`` refuses to fetch
    (found by the 2-process near-tie select test): ``process_allgather``
    reassembles the global value on every process — a collective, so all
    processes must reach it in the same order (eval's chunk loop is
    symmetric across controllers by construction)."""
    import numpy as np

    if jax.process_count() == 1 or getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
