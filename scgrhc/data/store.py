"""HBM-friendly segment store.

The reference keeps segments as a Python list of per-segment torch tensors
inside a pickled ``DataLoader`` (reference: recordutil.py:22-79,202-209).
TPU-first, we instead materialize the whole split as a few padded, dense
arrays — ``scg (N, C, T)`` / ``rhc (N, 1, T)`` float32 plus small metadata
arrays — so an entire split moves host→HBM once and evaluation can vmap over
all N segments without Python loops.

Normalization parity (reference: recordutil.py:41-66):
  * min/max are taken jointly over the whole (T, C) array of a segment's
    signal group (``np.min(segment[0])``), or globally when
    ``use_global_min_max``;
  * normalized as ``(x - min) / (max - min + 1e-4)`` in float64, then
    transposed to (C, T) and cast to float32;
  * padded with zeros / truncated on the time axis to ``segment_samples``.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field

import numpy as np

from scgrhc.dsp.segment import Segment

NORM_EPS = 1e-4  # reference: recordutil.py:46
FORMAT_TAG = "scgrhc-store.v1"


def minmax_norm(x: np.ndarray, minmax: tuple[float, float]) -> np.ndarray:
    lo, hi = minmax
    return (x - lo) / (hi - lo + NORM_EPS)


def reverse_minmax(x, orig_min, orig_max):
    """Denormalize (reference: waveform_test.py:21-25 — note: no +1e-4, the
    reference's denorm is intentionally not the exact inverse)."""
    return x * (orig_max - orig_min) + orig_min


def _pad_or_truncate(x: np.ndarray, t: int) -> np.ndarray:
    """(C, L) → (C, t), zero-padded or truncated on the time axis
    (reference: recordutil.py:30-39)."""
    L = x.shape[-1]
    if L < t:
        return np.pad(x, ((0, 0), (0, t - L)))
    return x[:, :t]


def get_global_minmax_vals(segments: list[Segment]):
    """Joint min/max across all segments per signal group
    (reference: recordutil.py:152-169)."""
    scg_min = min(float(np.min(s.scg)) for s in segments)
    scg_max = max(float(np.max(s.scg)) for s in segments)
    rhc_min = min(float(np.min(s.rhc)) for s in segments)
    rhc_max = max(float(np.max(s.rhc)) for s in segments)
    return (scg_min, scg_max), (rhc_min, rhc_max)


@dataclass
class SegmentStore:
    """Dense, padded view of one split."""

    scg: np.ndarray  # (N, C, T) float32, normalized
    rhc: np.ndarray  # (N, 1, T) float32, normalized
    record_names: list[str]
    start_idx: np.ndarray  # (N,) int64, interval-relative
    stop_idx: np.ndarray  # (N,) int64
    minmax_scg: np.ndarray  # (N, 2) float64 — (min, max) used per segment
    minmax_rhc: np.ndarray  # (N, 2) float64
    segment_samples: int = 750
    _device_cache: dict = field(default_factory=dict, repr=False, compare=False)

    # -- construction ------------------------------------------------------

    @classmethod
    def from_segments(
        cls,
        segments: list[Segment],
        segment_size: float,
        minmax_scg: tuple[float, float] | None,
        minmax_rhc: tuple[float, float] | None,
        sample_freq: int = 500,
    ) -> "SegmentStore":
        t = int(segment_size * sample_freq)
        n = len(segments)
        c = segments[0].scg.shape[1] if n else 0
        scg = np.zeros((n, c, t), dtype=np.float32)
        rhc = np.zeros((n, 1, t), dtype=np.float32)
        mm_scg = np.zeros((n, 2), dtype=np.float64)
        mm_rhc = np.zeros((n, 2), dtype=np.float64)
        names: list[str] = []
        start = np.zeros(n, dtype=np.int64)
        stop = np.zeros(n, dtype=np.int64)
        for i, seg in enumerate(segments):
            local_scg = (
                (float(np.min(seg.scg)), float(np.max(seg.scg)))
                if minmax_scg is None
                else minmax_scg
            )
            local_rhc = (
                (float(np.min(seg.rhc)), float(np.max(seg.rhc)))
                if minmax_rhc is None
                else minmax_rhc
            )
            scg[i] = _pad_or_truncate(
                minmax_norm(seg.scg, local_scg).T.astype(np.float32), t
            )
            rhc[i] = _pad_or_truncate(
                minmax_norm(seg.rhc, local_rhc).T.astype(np.float32), t
            )
            mm_scg[i] = local_scg
            mm_rhc[i] = local_rhc
            names.append(seg.record_name)
            start[i] = seg.start_idx
            stop[i] = seg.stop_idx
        return cls(scg, rhc, names, start, stop, mm_scg, mm_rhc, segment_samples=t)

    @classmethod
    def from_normalized(
        cls,
        scg: np.ndarray,
        rhc: np.ndarray,
        record_names: list[str],
        start_idx: np.ndarray,
        stop_idx: np.ndarray,
        minmax_scg: np.ndarray,
        minmax_rhc: np.ndarray,
    ) -> "SegmentStore":
        """Build from already-normalized (C, T) data — used by the
        reference-pickle read shim."""
        return cls(
            np.asarray(scg, dtype=np.float32),
            np.asarray(rhc, dtype=np.float32),
            list(record_names),
            np.asarray(start_idx, dtype=np.int64),
            np.asarray(stop_idx, dtype=np.int64),
            np.asarray(minmax_scg, dtype=np.float64),
            np.asarray(minmax_rhc, dtype=np.float64),
            segment_samples=int(np.asarray(scg).shape[-1]),
        )

    # -- reference-style item access ----------------------------------------

    def __len__(self) -> int:
        return self.scg.shape[0]

    def __getitem__(self, i: int):
        """7-tuple mirroring the reference dataset item
        (recordutil.py:55-66): (scg, rhc, record_name, start, stop,
        (scg_min, scg_max), (rhc_min, rhc_max))."""
        return (
            self.scg[i],
            self.rhc[i],
            self.record_names[i],
            int(self.start_idx[i]),
            int(self.stop_idx[i]),
            tuple(self.minmax_scg[i]),
            tuple(self.minmax_rhc[i]),
        )

    # -- device residency ----------------------------------------------------

    def device_arrays(
        self,
        sharding=None,
        pad_to: int | None = None,
        pad_channels_to: int | None = None,
    ):
        """(scg, rhc) as jax arrays, cached so the host→HBM copy happens once.

        With ``sharding`` (e.g. replicated over a DP mesh) the arrays are
        placed once under that sharding and reused every epoch — the
        multi-chip training path gathers batches from this resident copy
        instead of re-staging the shuffled epoch host→device.

        ``pad_to`` zero-pads the segment axis up to that row count
        (``shape_bucket``): gather indices only ever touch real rows, so
        results are unchanged, but the XLA program signature stops
        depending on the exact dataset size.  ``pad_channels_to``
        zero-pads the SCG channel axis (``channel_bucket``,
        scgrhc.models.channel_pad): padded channels meet zero weight
        columns, so results are exactly unchanged."""
        if pad_to is not None and pad_to < len(self.scg):
            raise ValueError(f"pad_to={pad_to} < {len(self.scg)} segments")
        key = ("scg", None if sharding is None else sharding, pad_to,
               pad_channels_to)
        if key not in self._device_cache:
            import jax
            import jax.numpy as jnp

            scg_np, rhc_np = self.scg, self.rhc
            if (
                pad_channels_to is not None
                and pad_channels_to > scg_np.shape[1]
            ):
                from scgrhc.models.channel_pad import pad_batch

                scg_np = pad_batch(scg_np, pad_channels_to)
            if pad_to is not None and pad_to > len(scg_np):
                pad = pad_to - len(scg_np)
                scg_np = np.concatenate(
                    [scg_np, np.zeros((pad, *scg_np.shape[1:]), scg_np.dtype)]
                )
                rhc_np = np.concatenate(
                    [rhc_np, np.zeros((pad, *rhc_np.shape[1:]), rhc_np.dtype)]
                )
            if sharding is None:
                scg, rhc = jnp.asarray(scg_np), jnp.asarray(rhc_np)
            else:
                from scgrhc.parallel.mesh import place_global

                scg = place_global(scg_np, sharding)
                rhc = place_global(rhc_np, sharding)
            self._device_cache[key] = (scg, rhc)
        return self._device_cache[key]

    # -- persistence ----------------------------------------------------------

    def state_dict(self) -> dict:
        return {
            "format": FORMAT_TAG,
            "scg": self.scg,
            "rhc": self.rhc,
            "record_names": self.record_names,
            "start_idx": self.start_idx,
            "stop_idx": self.stop_idx,
            "minmax_scg": self.minmax_scg,
            "minmax_rhc": self.minmax_rhc,
            "segment_samples": self.segment_samples,
        }

    @classmethod
    def from_state_dict(cls, d: dict) -> "SegmentStore":
        assert d.get("format") == FORMAT_TAG, f"not a segment store: {d.get('format')}"
        return cls(
            d["scg"],
            d["rhc"],
            d["record_names"],
            d["start_idx"],
            d["stop_idx"],
            d["minmax_scg"],
            d["minmax_rhc"],
            segment_samples=d["segment_samples"],
        )

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self.state_dict(), f)

    @classmethod
    def load(cls, path: str) -> "SegmentStore":
        with open(path, "rb") as f:
            return cls.from_state_dict(pickle.load(f))
