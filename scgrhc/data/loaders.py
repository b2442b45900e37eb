"""Batching loaders over a :class:`SegmentStore`, plus a read shim for the
reference's pickled torch ``DataLoader`` artifacts.

The reference pickles whole ``DataLoader`` objects (reference:
recordutil.py:198-209) and loads them back with ``pickle.load``
(recordutil.py:219-224).  Our native loader file is a plain dict (store
state + batch config) — no live objects — but :func:`load_dataloader`
transparently reads *either* format, converting reference pickles into a
:class:`SegmentStore` so existing experiment artifacts keep working.
"""

from __future__ import annotations

import pickle

import numpy as np

from scgrhc.data.store import FORMAT_TAG, SegmentStore

LOADER_TAG = "scgrhc-loader.v1"


class SegmentLoader:
    """Epoch iterator yielding dense (scg, rhc) minibatches.

    Mirrors the reference DataLoader's role (batching + per-epoch shuffle,
    recordutil.py:198-200) but yields NumPy views over the dense store; the
    jitted train step converts to device arrays, so batches stream host→HBM
    with no per-segment Python work.
    """

    def __init__(
        self,
        store: SegmentStore,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.store = store
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    @property
    def dataset(self) -> SegmentStore:
        return self.store

    def __len__(self) -> int:
        n = len(self.store)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def epoch_order(self, epoch: int) -> np.ndarray:
        """The (deterministic) segment permutation used for a given epoch —
        the epoch-scan train path batches with it directly."""
        n = len(self.store)
        if self.shuffle:
            return np.random.default_rng((self.seed, epoch)).permutation(n)
        return np.arange(n)

    def __iter__(self):
        n = len(self.store)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self._epoch))
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        self._epoch += 1
        bs = self.batch_size
        stop = (n // bs) * bs if self.drop_last else n
        for s in range(0, stop, bs):
            idx = order[s : s + bs]
            yield self.store.scg[idx], self.store.rhc[idx]

    # -- persistence ---------------------------------------------------------

    def state_dict(self) -> dict:
        return {
            "format": LOADER_TAG,
            "batch_size": self.batch_size,
            "shuffle": self.shuffle,
            "seed": self.seed,
            "store": self.store.state_dict(),
        }

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self.state_dict(), f)


def _store_from_torch_loader(loader) -> tuple[SegmentStore, int, bool]:
    """Convert a reference pickled torch DataLoader into a SegmentStore.

    The reference dataset item is the 7-tuple of recordutil.py:55-66 with
    already-normalized (C, T) float32 tensors.
    """
    ds = loader.dataset
    scg, rhc, names, starts, stops, mm_scg, mm_rhc = [], [], [], [], [], [], []
    for item in ds:
        scg.append(np.asarray(item[0]))
        rhc.append(np.asarray(item[1]))
        names.append(item[2])
        starts.append(int(item[3]))
        stops.append(int(item[4]))
        mm_scg.append([float(item[5][0]), float(item[5][1])])
        mm_rhc.append([float(item[6][0]), float(item[6][1])])
    store = SegmentStore.from_normalized(
        np.stack(scg), np.stack(rhc), names, starts, stops, mm_scg, mm_rhc
    )
    batch_size = getattr(loader, "batch_size", 1) or 1
    return store, batch_size, True


def load_dataloader(path: str, seed: int = 0) -> SegmentLoader:
    """Load a loader file — native scgrhc format or a reference torch
    DataLoader pickle (reference: recordutil.py:219-224)."""
    with open(path, "rb") as f:
        obj = pickle.load(f)
    if isinstance(obj, dict) and obj.get("format") == LOADER_TAG:
        store = SegmentStore.from_state_dict(obj["store"])
        return SegmentLoader(
            store, obj["batch_size"], shuffle=obj["shuffle"], seed=obj.get("seed", seed)
        )
    if isinstance(obj, dict) and obj.get("format") == FORMAT_TAG:
        return SegmentLoader(SegmentStore.from_state_dict(obj), 1, shuffle=False)
    # Fall back: a pickled torch DataLoader from the reference pipeline.
    store, batch_size, shuffle = _store_from_torch_loader(obj)
    return SegmentLoader(store, batch_size, shuffle=shuffle, seed=seed)
