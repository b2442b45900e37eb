"""Segmentation / store / split / loader tests (reference parity:
recordutil.py:22-79,122-230)."""

import json
import os
import pickle

import numpy as np
import pytest

from scgrhc.core.params import Params
from scgrhc.data.loaders import SegmentLoader, load_dataloader
from scgrhc.data.split import split_indices
from scgrhc.data.store import (
    NORM_EPS,
    SegmentStore,
    minmax_norm,
    reverse_minmax,
)
from scgrhc.dsp.segment import Segment, get_segments


@pytest.fixture()
def params(use_synth_db, tmp_path):
    cfg = {
        "dir_path": str(tmp_path / "exp"),
        "in_channels": ["patch_ACC_lat", "patch_ACC_hf", "patch_ACC_dv"],
        "chamber": "PA",
        "segment_size": 1.5,
        "batch_size": 4,
        "train_path": "loader_train.pickle",
        "valid_path": "loader_valid.pickle",
        "test_path": "loader_test.pickle",
        "checkpoint_dir_path": "checkpoints",
        "comparison_dir_path": "comparisons",
        "pred_top_dir_path": "pred_top",
        "pred_rand_dir_path": "pred_rand",
        "alpha": 1e-4,
        "beta1": 0.5,
        "beta2": 0.999,
        "n_critic": 2,
        "lambda_gp": 10,
        "lambda_aux": 100,
        "total_epochs": 2,
        "min_RHC": -50,
        "use_global_min_max": False,
        "seed": 0,
    }
    os.makedirs(cfg["dir_path"])
    p = tmp_path / "exp" / "params.json"
    p.write_text(json.dumps(cfg))
    return Params(str(p))


def test_get_segments(params):
    segs = get_segments(params)
    assert len(segs) > 10
    s = segs[0]
    assert s.scg.shape == (750, 3) and s.rhc.shape == (750, 1)
    # interval-relative non-overlapping window offsets
    assert s.start_idx % 750 == 0 and s.stop_idx == s.start_idx + 750
    # the injected flat-line window (record SYN000, seconds 3-4, PA interval)
    # must have been gated out: no segment covering samples 1500-2250 of SYN000
    bad = [
        x for x in segs
        if x.record_name == "SYN000" and x.start_idx <= 1500 < x.stop_idx
    ]
    assert bad == []


def test_minmax_norm_formula():
    x = np.array([[0.0, 10.0], [5.0, 20.0]])
    got = minmax_norm(x, (0.0, 20.0))
    np.testing.assert_allclose(got, x / (20.0 + NORM_EPS))
    # denorm deliberately omits the +1e-4 (reference: waveform_test.py:21-25)
    back = reverse_minmax(got, 0.0, 20.0)
    assert abs(back[1, 1] - x[1, 1]) < 1e-3 and back[1, 1] != x[1, 1]


def test_store_from_segments_normalization():
    t = 750
    rng = np.random.default_rng(0)
    scg = rng.uniform(-2, 2, (t, 3))
    rhc = rng.uniform(5, 35, (t, 1))
    seg = Segment(scg, rhc, "R", 0, t)
    store = SegmentStore.from_segments([seg], 1.5, None, None)
    assert store.scg.shape == (1, 3, t) and store.rhc.shape == (1, 1, t)
    # joint min/max over ALL channels of the group (reference: recordutil.py:58)
    lo, hi = scg.min(), scg.max()
    want = ((scg - lo) / (hi - lo + NORM_EPS)).T.astype(np.float32)
    np.testing.assert_array_equal(store.scg[0], want)
    assert store.minmax_rhc[0].tolist() == [rhc.min(), rhc.max()]


def test_store_pad_truncate():
    short = Segment(np.ones((700, 2)), np.ones((700, 1)), "R", 0, 700)
    store = SegmentStore.from_segments([short], 1.5, (0, 1), (0, 1))
    assert store.scg.shape[-1] == 750
    assert np.all(store.scg[0, :, 700:] == 0)  # zero-padded tail


def test_split_sizes_and_determinism():
    tr, va, te = split_indices(100, seed=0)
    assert len(tr) == 90 and len(va) == 5 and len(te) == 5
    assert sorted(np.concatenate([tr, va, te]).tolist()) == list(range(100))
    tr2, _, _ = split_indices(100, seed=0)
    np.testing.assert_array_equal(tr, tr2)
    tr3, _, _ = split_indices(100, seed=1)
    assert not np.array_equal(tr, tr3)


def _tiny_store(n=10, c=3, t=750, seed=0):
    rng = np.random.default_rng(seed)
    return SegmentStore.from_normalized(
        rng.random((n, c, t)).astype(np.float32),
        rng.random((n, 1, t)).astype(np.float32),
        [f"R{i}" for i in range(n)],
        np.arange(n) * t,
        (np.arange(n) + 1) * t,
        rng.random((n, 2)),
        rng.random((n, 2)),
    )


def test_global_minmax_normalization():
    """use_global_min_max=True: every segment normalized with the cohort
    min/max (reference: recordutil.py:152-169,186)."""
    import numpy as np

    from scgrhc.data.store import SegmentStore, get_global_minmax_vals
    from scgrhc.dsp.segment import Segment

    rng = np.random.default_rng(0)
    segs = [
        Segment(rng.uniform(-i - 1, i + 1, (750, 2)),
                rng.uniform(-10 * (i + 1), 10 * (i + 1), (750, 1)), f"r{i}", 0, 750)
        for i in range(3)
    ]
    mm_scg, mm_rhc = get_global_minmax_vals(segs)
    assert mm_rhc[0] == min(float(s.rhc.min()) for s in segs)
    assert mm_rhc[1] == max(float(s.rhc.max()) for s in segs)

    store = SegmentStore.from_segments(segs, 1.5, mm_scg, mm_rhc)
    # all segments share the same stored minmax...
    assert (store.minmax_rhc == store.minmax_rhc[0]).all()
    # ...and denormalizing with it recovers the raw signal
    rec = store.rhc[2, 0] * (mm_rhc[1] - mm_rhc[0] + 1e-4) + mm_rhc[0]
    np.testing.assert_allclose(rec, segs[2].rhc[:, 0], atol=1e-4)


def test_loader_batching_and_roundtrip(tmp_path):
    store = _tiny_store(n=10)
    loader = SegmentLoader(store, batch_size=4, shuffle=True, seed=0)
    batches = list(loader)
    assert [b[0].shape[0] for b in batches] == [4, 4, 2]
    assert len(loader) == 3
    # per-epoch reshuffle is deterministic in (seed, epoch)
    loader.set_epoch(0)
    again = list(loader)
    np.testing.assert_array_equal(batches[0][0], again[0][0])

    path = str(tmp_path / "loader.pickle")
    loader.save(path)
    loaded = load_dataloader(path)
    assert loaded.batch_size == 4 and len(loaded.dataset) == 10
    np.testing.assert_array_equal(loaded.dataset.scg, store.scg)
    # reference-style item tuple
    item = loaded.dataset[0]
    assert item[2] == "R0" and len(item) == 7


class RefStyleDataset:
    """Module-level (picklable) stand-in for the reference's SCGDataset item
    layout (recordutil.py:55-66)."""

    def __init__(self):
        import torch

        rng = np.random.default_rng(0)
        self.items = [
            (
                torch.tensor(rng.random((3, 750)), dtype=torch.float32),
                torch.tensor(rng.random((1, 750)), dtype=torch.float32),
                f"R{i}",
                0,
                750,
                (0.0, 1.0),
                (5.0, 30.0),
            )
            for i in range(4)
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_reference_torch_pickle_shim(tmp_path):
    """A pickled torch DataLoader whose dataset yields the reference 7-tuple
    must load as a SegmentStore (reference artifact compat,
    recordutil.py:202-224)."""
    pytest.importorskip("torch")
    from torch.utils.data import DataLoader

    path = str(tmp_path / "ref_loader.pickle")
    with open(path, "wb") as f:
        pickle.dump(DataLoader(RefStyleDataset(), batch_size=2, shuffle=True), f)
    loader = load_dataloader(path)
    assert len(loader.dataset) == 4 and loader.batch_size == 2
    assert loader.dataset.minmax_rhc[0].tolist() == [5.0, 30.0]
    assert loader.dataset.scg.dtype == np.float32


def test_data_stage(params):
    from scgrhc.data.run import run

    run(params)
    assert os.path.exists(params.train_path)
    assert os.path.exists(params.valid_path)
    assert os.path.exists(params.test_path)
    log = open(os.path.join(params.dir_path, "record_log.txt")).read()
    assert "All segments:" in log
    tr = load_dataloader(params.train_path)
    va = load_dataloader(params.valid_path)
    te = load_dataloader(params.test_path)
    n = len(tr.dataset) + len(va.dataset) + len(te.dataset)
    assert len(tr.dataset) == int(np.floor(0.9 * n))
    assert tr.batch_size == 4 and va.batch_size == 1
    # overwrite guard (reference: recordutil.py:176-181)
    with pytest.raises(Exception, match="already exists"):
        run(params)
