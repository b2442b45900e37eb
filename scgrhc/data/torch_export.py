"""Write genuine pickled torch ``DataLoader`` artifacts.

The reference pickles live ``DataLoader`` objects and reloads them with a
bare ``pickle.load`` (reference: recordutil.py:202-209, 219-224); its eval
then walks ``loader.dataset`` item by item (waveform_test.py:58) and its
training iterates the loader with default collation (waveform_train.py:357).
This module re-encodes an scgrhc :class:`~scgrhc.data.store.SegmentStore`
into exactly that artifact so the reference scripts consume an
scgrhc-built dataset unchanged — the other direction of the read shim in
:mod:`scgrhc.data.loaders`.

Design note: the exported ``DataLoader`` wraps a plain ``list`` of
7-tuples (a list satisfies the ``Dataset`` protocol), NOT a custom class —
so the pickle references only ``torch`` internals and loads in any
environment with torch installed, without scgrhc on the path.

Item layout parity (reference: recordutil.py:55-66):
``(scg (C, T) float32 tensor, rhc (1, T) float32 tensor, record_name,
start_idx, stop_idx, (scg_min, scg_max), (rhc_min, rhc_max))``.
"""

from __future__ import annotations

import os
import pickle


def store_to_torch_dataset(store) -> list:
    """SegmentStore → list of reference-layout 7-tuples (torch tensors)."""
    import numpy as np
    import torch

    items = []
    for i in range(len(store)):
        items.append(
            (
                torch.from_numpy(np.ascontiguousarray(store.scg[i])),
                torch.from_numpy(np.ascontiguousarray(store.rhc[i])),
                store.record_names[i],
                int(store.start_idx[i]),
                int(store.stop_idx[i]),
                (float(store.minmax_scg[i][0]), float(store.minmax_scg[i][1])),
                (float(store.minmax_rhc[i][0]), float(store.minmax_rhc[i][1])),
            )
        )
    return items


def export_torch_loader(store, batch_size: int, shuffle: bool, out_path: str):
    """Pickle a genuine torch DataLoader over the store's segments
    (reference loader construction: recordutil.py:198-209)."""
    from torch.utils.data import DataLoader

    loader = DataLoader(
        store_to_torch_dataset(store), batch_size=batch_size, shuffle=shuffle
    )
    with open(out_path, "wb") as f:
        pickle.dump(loader, f)
    return out_path


def export_torch_loaders(params, out_dir: str | None = None) -> list[str]:
    """Re-encode an experiment's three loader files as reference torch
    pickles.  ``out_dir`` defaults to ``<dir_path>/torch_loaders`` (the
    loader filenames are preserved, so pointing a reference experiment's
    ``dir_path`` there makes its scripts run on this dataset).

    The train loader keeps ``params.batch_size`` + shuffle; valid/test get
    batch 1 + shuffle, like the reference (recordutil.py:198-200).
    """
    from scgrhc.data.loaders import load_dataloader

    out_dir = out_dir or os.path.join(params.dir_path, "torch_loaders")
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for split_path, batch_size in (
        (params.train_path, params.batch_size),
        (params.valid_path, 1),
        (params.test_path, 1),
    ):
        loader = load_dataloader(split_path)
        out = os.path.join(out_dir, os.path.basename(split_path))
        written.append(
            export_torch_loader(loader.dataset, batch_size, True, out)
        )
    return written
