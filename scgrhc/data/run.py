"""Dataset-build stage (reference parity: recordutil.py:172-230).

Builds segments for an experiment, splits 90/5/5 (seeded — the reference's
split is unseeded, recordutil.py:191-192), materializes each split as a
dense :class:`SegmentStore`, and persists loader files at the paths named in
``params.json``.  Overwrite guards and ``record_log.txt`` match the
reference (recordutil.py:176-181, 211-216).
"""

from __future__ import annotations

import os
from datetime import datetime
from time import time

from scgrhc.core.timelog import timelog
from scgrhc.data.loaders import SegmentLoader
from scgrhc.data.split import split_segments
from scgrhc.data.store import SegmentStore, get_global_minmax_vals
from scgrhc.dsp.segment import get_segments


def save_dataloaders(params) -> None:
    if os.path.exists(params.train_path):
        raise Exception("Train file already exists!")
    elif os.path.exists(params.valid_path):
        raise Exception("Valid file already exists!")
    elif os.path.exists(params.test_path):
        raise Exception("Test file already exists!")

    all_segments = get_segments(params)
    if not all_segments:
        raise Exception("No clean segments found")

    if params.use_global_min_max:
        minmax_scg, minmax_rhc = get_global_minmax_vals(all_segments)
    else:
        minmax_scg = None
        minmax_rhc = None

    train_segments, valid_segments, test_segments = split_segments(
        all_segments, params.seed
    )

    make = lambda segs: SegmentStore.from_segments(
        segs, params.segment_size, minmax_scg, minmax_rhc
    )
    train_loader = SegmentLoader(
        make(train_segments), params.batch_size, shuffle=True, seed=params.seed
    )
    valid_loader = SegmentLoader(make(valid_segments), 1, shuffle=True, seed=params.seed)
    test_loader = SegmentLoader(make(test_segments), 1, shuffle=True, seed=params.seed)

    if getattr(params, "loader_backend", "native") == "torch":
        # write the reference's artifact format directly: genuine pickled
        # torch DataLoaders (recordutil.py:202-209) — the reference
        # pipeline can consume this dataset unchanged, and scgrhc reads
        # the same files back through its torch-pickle shim
        from scgrhc.data.torch_export import export_torch_loader

        export_torch_loader(
            train_loader.dataset, params.batch_size, True, params.train_path
        )
        export_torch_loader(valid_loader.dataset, 1, True, params.valid_path)
        export_torch_loader(test_loader.dataset, 1, True, params.test_path)
    else:
        train_loader.save(params.train_path)
        valid_loader.save(params.valid_path)
        test_loader.save(params.test_path)

    with open(os.path.join(params.dir_path, "record_log.txt"), "w") as f:
        f.write(f"Dataset created: {datetime.now()}\n")
        f.write(f"All segments: {len(all_segments)}\n")
        f.write(f"Valid segments: {len(valid_segments)}\n")
        f.write(f"Train segments: {len(train_segments)}\n")
        f.write(f"Test segments: {len(test_segments)}\n")


def run(params) -> None:
    start_time = time()
    # log-line parity with the reference stage banner (recordutil.py:229)
    print(timelog(f"Run recordutil for {params.dir_path}", start_time))
    from scgrhc.parallel import comm

    if comm.is_primary():  # one writer on pods; all read the shared files
        try:
            save_dataloaders(params)
        finally:
            comm.barrier("data_end")
    else:
        # non-primary: wait for the primary's write, then read the shared
        # files like any rerun (overwrite-guard semantics stay the
        # primary's job — recordutil.py:176-181)
        comm.barrier("data_end")
