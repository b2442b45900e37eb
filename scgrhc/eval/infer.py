"""Batched whole-split inference.

The reference evaluates segment-by-segment at batch size 1 in a Python
loop on CPU (reference: waveform_test.py:58-67).  TPU-first, the whole
split lives in HBM as one dense (N, C, T) array and a single jitted
program runs the generator over fixed-size chunks (pad-to-static so one
compile serves every chunk), denormalizes with the per-segment RHC
min/max, and scores everything on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from scgrhc.eval import metrics
from scgrhc.models import generator
from scgrhc.parallel.mesh import fetch_global, place_global


def _chunk_scores_impl(g_params, scg, rhc, mm_rhc, dtype: str):
    pred = generator.apply(g_params, scg, train=False, dtype=jnp.dtype(dtype))
    lo = mm_rhc[:, :1].astype(jnp.float32)
    span = (mm_rhc[:, 1:] - mm_rhc[:, :1]).astype(jnp.float32)
    x = rhc[:, 0, :] * span + lo  # real, denormalized — metrics input only
    y = pred[:, 0, :].astype(jnp.float32) * span + lo  # predicted, denormalized
    return y, metrics.segment_scores(x, y)


@partial(jax.jit, static_argnames=("dtype",))
def _chunk_scores(g_params, scg, rhc, mm_rhc, dtype: str = "float32"):
    """One chunk: forward → denorm → metrics.  scg (B, C, T), rhc (B, 1, T),
    mm_rhc (B, 2).  Denormalization matches waveform_test.py:21-25,64-67.
    Denorm + metrics always run in f32, whatever the model compute dtype.
    The real waveform is NOT returned: it is checkpoint-independent and
    the host reconstructs it from store arrays (:func:`host_real`), so the
    device→host transfer — the eval-all bottleneck on remote-TPU links —
    carries only predictions and (B,)-sized scores."""
    return _chunk_scores_impl(g_params, scg, rhc, mm_rhc, dtype)


@partial(jax.jit, static_argnames=("dtype",))
def _chunk_scores_stacked(stacked_params, scg, rhc, mm_rhc, dtype: str):
    """K checkpoints' generators over ONE segment chunk in a single program:
    every weight leaf carries a leading (K,) axis and the forward is vmapped
    over it (the reference reloads and loops checkpoints serially,
    waveform_test.py:119-154).  Returns (ys (K, B, T), scores pytree with
    (K, B) leaves); the real waveform stays host-side (:func:`host_real`)."""

    def one(p):
        return _chunk_scores_impl(p, scg, rhc, mm_rhc, dtype)

    return jax.vmap(one)(stacked_params)


def host_real(store):
    """The denormalized real RHC, computed host-side from the store's own
    arrays: ``rhc * (max - min) + min`` with f32 elementwise ops — the same
    arithmetic the device denorm performs (waveform_test.py:21-25), on the
    same f32 inputs, so values agree to the last ulp (modulo fused
    multiply-add in the XLA kernel) while costing zero device→host bytes."""
    mm32 = np.asarray(store.minmax_rhc, np.float32)
    lo = mm32[:, :1]
    span = mm32[:, 1:] - mm32[:, :1]
    return store.rhc[:, 0, :] * span + lo


def predict_split(
    g_params, store, batch: int = 256, sharding=None, dtype: str = "float32",
    pad_channels_to: int | None = None, bucket_batch: bool = False,
):
    """Run the generator over every segment of a store.

    Returns (real (N, T), pred (N, T) — both denormalized float32 numpy —
    and a dict of (N,) metric arrays).  ``sharding``, when given, places
    each chunk across a device mesh (batch-dim data parallelism) so eval
    scales over chips.  ``pad_channels_to`` zero-pads the SCG channel
    axis of weights AND data to the bucket (``channel_bucket``) — exact,
    see scgrhc.models.channel_pad — so eval programs stop depending on
    the per-config channel subset.  ``bucket_batch`` (``shape_bucket``)
    keeps the static chunk at ``batch`` even when the split is smaller,
    so eval programs stop depending on the dataset size (pad rows are
    computed and discarded — cheap next to a fresh XLA compile)."""
    if pad_channels_to is not None:
        from scgrhc.models.channel_pad import pad_generator

        c = store.scg.shape[1]
        if c < pad_channels_to:
            g_params = pad_generator(g_params, c, pad_channels_to)
    scg_d, rhc_d = store.device_arrays(pad_channels_to=pad_channels_to)
    n = len(store)
    mm = jnp.asarray(store.minmax_rhc)
    batch = max(1, batch if bucket_batch else min(batch, n))
    if sharding is not None:
        # round the static chunk up to the mesh size — the pad-to-static
        # rows below make any batch shard cleanly (mirrors train's
        # pad+mask DP), so eval never silently drops to one chip
        ndev = sharding.mesh.devices.size
        batch = -(-batch // ndev) * ndev
    if jnp.dtype(dtype) != jnp.float32:
        g_params = generator.cast_params(g_params, jnp.dtype(dtype))

    ys, scores = [], []
    for s in range(0, n, batch):
        e = min(s + batch, n)
        pad = batch - (e - s)
        scg = scg_d[s:e]
        rhc = rhc_d[s:e]
        mm_c = mm[s:e]
        if pad:  # pad-to-static: one compiled program for every chunk
            scg = jnp.pad(scg, ((0, pad), (0, 0), (0, 0)))
            rhc = jnp.pad(rhc, ((0, pad), (0, 0), (0, 0)))
            mm_c = jnp.pad(mm_c, ((0, pad), (0, 0)), constant_values=(0.0, 1.0))
        if sharding is not None:
            # place_global, not device_put: on a multi-controller pod the
            # sharding spans non-addressable devices (train does the same)
            scg = place_global(scg, sharding)
            rhc = place_global(rhc, sharding)
            mm_c = place_global(mm_c, sharding)
        y, sc = _chunk_scores(g_params, scg, rhc, mm_c, dtype)
        keep = e - s
        ys.append(fetch_global(y[:keep]))
        scores.append({k: fetch_global(v[:keep]) for k, v in sc.items()})

    real = (host_real(store) if n
            else np.zeros((0, store.segment_samples), np.float32))
    pred = np.concatenate(ys) if ys else np.zeros((0, store.segment_samples), np.float32)
    merged = {
        k: np.concatenate([s[k] for s in scores]) if scores else np.zeros(0)
        for k in (scores[0] if scores else {})
    }
    return real, pred, merged


def stack_params(params_list):
    """K same-shaped weight pytrees → one pytree with (K, ...) leaves."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                        *params_list)


def predict_split_multi(
    params_list, store, batch: int = 256, stack: int = 8,
    sharding=None, dtype: str = "float32", pad_channels_to: int | None = None,
    bucket_batch: bool = False,
):
    """Score K checkpoints over a whole split, amortizing the segment
    batches: checkpoints are stacked ``stack`` at a time on a leading
    weight axis and vmapped over, so each segment chunk is loaded once per
    group instead of once per checkpoint (the reference's eval reloads the
    split per checkpoint in a serial CPU loop, waveform_test.py:119-154).

    Returns a list of K (real, pred, scores) tuples ordered like
    ``params_list`` — the same contract as calling :func:`predict_split`
    per checkpoint (``real`` is shared across checkpoints).
    """
    n = len(store)
    k = len(params_list)
    if k == 0:
        return []
    if pad_channels_to is not None:
        from scgrhc.models.channel_pad import pad_generator

        c = store.scg.shape[1]
        if c < pad_channels_to:
            params_list = [
                pad_generator(p, c, pad_channels_to) for p in params_list
            ]
    scg_d, rhc_d = store.device_arrays(pad_channels_to=pad_channels_to)
    mm = jnp.asarray(store.minmax_rhc)
    batch = max(1, batch if bucket_batch else min(batch, n))
    if sharding is not None:
        # round up to the mesh size; pad-to-static rows shard cleanly
        ndev = sharding.mesh.devices.size
        batch = -(-batch // ndev) * ndev
    if jnp.dtype(dtype) != jnp.float32:
        params_list = [
            generator.cast_params(p, jnp.dtype(dtype)) for p in params_list
        ]

    results = []
    real = host_real(store)  # ONE shared (N, T) array across all groups
    for g0 in range(0, k, stack):
        group = params_list[g0 : g0 + stack]
        if len(group) < stack:  # pad-to-static: one compile for all groups
            group = group + [group[-1]] * (stack - len(group))
        stacked = stack_params(group)
        yss, scs = [], []
        for s in range(0, n, batch):
            e = min(s + batch, n)
            pad = batch - (e - s)
            scg, rhc, mm_c = scg_d[s:e], rhc_d[s:e], mm[s:e]
            if pad:
                scg = jnp.pad(scg, ((0, pad), (0, 0), (0, 0)))
                rhc = jnp.pad(rhc, ((0, pad), (0, 0), (0, 0)))
                mm_c = jnp.pad(mm_c, ((0, pad), (0, 0)), constant_values=(0.0, 1.0))
            if sharding is not None:
                scg = place_global(scg, sharding)
                rhc = place_global(rhc, sharding)
                mm_c = place_global(mm_c, sharding)
            ys, sc = _chunk_scores_stacked(stacked, scg, rhc, mm_c, dtype)
            keep = e - s
            yss.append(fetch_global(ys[:, :keep]))
            scs.append({kk: fetch_global(v[:, :keep]) for kk, v in sc.items()})

        preds = np.concatenate(yss, axis=1)  # (stack, N, T)
        merged = {
            kk: np.concatenate([s[kk] for s in scs], axis=1) for kk in scs[0]
        }
        for j in range(len(params_list[g0 : g0 + stack])):
            results.append(
                (real, preds[j], {kk: v[j] for kk, v in merged.items()})
            )
    return results
