"""Tensor-parallel sharding hooks for model parameters.

The model is small (~10 M params), so TP is not load-bearing (SURVEY
§2.3: "provide sharding-rule hooks only") — but the hooks are real: every
conv weight's output-channel dim is annotated onto a ``model`` mesh axis
whenever it divides the axis size (1-output heads like the attention
``psi`` or the final projection stay replicated), and XLA GSPMD
propagates the layout through the network, inserting the activation
collectives over ICI.  Combine with the ``data`` axis for 2-D
(DP × TP) meshes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"


def make_dp_tp_mesh(dp: int, tp: int) -> Mesh:
    """2-D (data, model) mesh over the first dp*tp local devices."""
    devs = jax.devices()
    if len(devs) < dp * tp:
        raise ValueError(f"need {dp * tp} devices, have {len(devs)}")
    return Mesh(
        np.asarray(devs[: dp * tp]).reshape(dp, tp), ("data", MODEL_AXIS)
    )


def param_pspecs(params, tp_size: int, axis: str = MODEL_AXIS):
    """PartitionSpec pytree: shard each weight's dim 0 (conv out-channels)
    on ``axis`` when divisible by ``tp_size``; replicate otherwise."""

    def spec(leaf):
        shape = np.shape(leaf)
        if len(shape) >= 1 and shape[0] % tp_size == 0 and shape[0] >= tp_size > 1:
            return P(axis, *([None] * (len(shape) - 1)))
        return P(*([None] * len(shape)))

    return jax.tree.map(spec, params)


def shard_params(params, mesh: Mesh, axis: str = MODEL_AXIS):
    """Place a param pytree with TP sharding over ``mesh``'s model axis."""
    tp_size = mesh.shape[axis]
    specs = param_pspecs(params, tp_size, axis)
    return jax.tree.map(
        lambda leaf, sp: jax.device_put(leaf, NamedSharding(mesh, sp)),
        params,
        specs,
    )
