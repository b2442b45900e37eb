"""Bidirectional loader-artifact parity (reference: recordutil.py:202-224).

Round 1 could *read* the reference's pickled torch DataLoaders; these tests
prove the write direction: scgrhc exports loader files that the reference
scripts — including the reference's own ``waveform_test.run`` — consume
unchanged, with no scgrhc import required at unpickle time.
"""

import json
import os
import pickle
import pickletools
import sys
import types

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from scgrhc.data.loaders import SegmentLoader, load_dataloader
from scgrhc.data.store import SegmentStore
from scgrhc.data.torch_export import export_torch_loader, export_torch_loaders
from scgrhc.train import checkpoint as ckpt_io
from scgrhc.train.wgan import TrainConfig, init_state

T = 750
REF = "/root/reference"


def _store(n=6, c=2, seed=0):
    rng = np.random.default_rng(seed)
    mm = np.stack([np.full(n, -10.0), np.full(n, 40.0)], axis=1)
    return SegmentStore(
        rng.random((n, c, T)).astype(np.float32),
        rng.random((n, 1, T)).astype(np.float32),
        [f"rec{i}" for i in range(n)],
        np.arange(n, dtype=np.int64), np.arange(n, dtype=np.int64) + T,
        mm.copy(), mm.copy(), segment_samples=T,
    )


def test_export_pickle_is_scgrhc_free(tmp_path):
    """The exported pickle must load in an environment WITHOUT scgrhc:
    it may reference torch internals only."""
    out = str(tmp_path / "loader_valid.pickle")
    export_torch_loader(_store(), 1, True, out)
    with open(out, "rb") as f:
        data = f.read()
    import io

    ops = io.StringIO()
    pickletools.dis(data, out=ops)
    listing = ops.getvalue()
    assert "scgrhc" not in listing
    assert "torch" in listing


def test_export_roundtrips_through_plain_pickle(tmp_path):
    """reference-style bare pickle.load (recordutil.py:219-224) returns a
    working DataLoader with reference item layout (recordutil.py:55-66)."""
    store = _store()
    out = str(tmp_path / "loader_train.pickle")
    export_torch_loader(store, 4, True, out)
    with open(out, "rb") as f:
        loader = pickle.load(f)
    assert loader.batch_size == 4
    assert len(loader.dataset) == 6
    item = loader.dataset[2]
    assert isinstance(item[0], torch.Tensor) and item[0].shape == (2, T)
    assert item[0].dtype == torch.float32
    assert item[1].shape == (1, T)
    assert item[2] == "rec2"
    assert (item[3], item[4]) == (2, T + 2)
    assert item[5] == (-10.0, 40.0) and item[6] == (-10.0, 40.0)
    np.testing.assert_array_equal(item[0].numpy(), store.scg[2])
    # and torch's default collate batches it (waveform_train.py:357)
    scg_b, rhc_b, names, starts, stops, mm_scg, mm_rhc = next(iter(loader))
    assert scg_b.shape == (4, 2, T) and rhc_b.shape == (4, 1, T)
    assert len(names) == 4


def test_scgrhc_reads_back_its_own_export(tmp_path):
    """load_dataloader's torch shim consumes the export → same arrays."""
    store = _store()
    out = str(tmp_path / "loader_valid.pickle")
    export_torch_loader(store, 1, True, out)
    back = load_dataloader(out)
    np.testing.assert_array_equal(back.dataset.scg, store.scg)
    np.testing.assert_array_equal(back.dataset.rhc, store.rhc)
    assert back.dataset.record_names == store.record_names
    np.testing.assert_array_equal(back.dataset.minmax_rhc, store.minmax_rhc)


@pytest.fixture()
def ref_test_module():
    """Import the reference's waveform_test with wfdb stubbed."""
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    if "wfdb" not in sys.modules:
        sys.modules["wfdb"] = types.ModuleType("wfdb")
    sys.path.insert(0, REF)
    try:
        import paramutil
        import waveform_test
    finally:
        sys.path.remove(REF)
    return paramutil, waveform_test


@pytest.mark.slow
def test_reference_waveform_test_consumes_scgrhc_dataset(tmp_path, ref_test_module):
    """END-TO-END write-parity: the reference's OWN ``waveform_test.run``
    (loader unpickle → torch Generator load → per-segment CPU loop → CSV)
    runs on an scgrhc-built dataset + exported checkpoint and produces a
    valid comparisons CSV (reference: waveform_test.py:96-154)."""
    import pandas as pd

    paramutil, waveform_test = ref_test_module

    d = tmp_path / "exp"
    os.makedirs(d / "checkpoints")
    (d / "params.json").write_text(json.dumps({
        "in_channels": ["a", "b"], "chamber": "PA", "segment_size": 1.5,
        "batch_size": 4, "dir_path": str(d),
        "train_path": "loader_train.pickle",
        "valid_path": "loader_valid.pickle",
        "test_path": "loader_test.pickle",
        "checkpoint_dir_path": "checkpoints",
        "comparison_dir_path": "comparisons",
        "pred_top_dir_path": "pred_top", "pred_rand_dir_path": "pred_rand",
        "alpha": 1e-4, "beta1": 0.5, "beta2": 0.999, "n_critic": 2,
        "lambda_gp": 10, "lambda_aux": 100, "total_epochs": 1,
        "min_RHC": -50, "use_global_min_max": False,
    }))
    store = _store()
    export_torch_loader(store, 1, True, str(d / "loader_valid.pickle"))

    # an scgrhc checkpoint exported to the reference's torch format
    cfg = TrainConfig()
    state = init_state(jax.random.key(0), 2, cfg)
    native = str(tmp_path / "native.ckpt")
    ckpt_io.save(native, start_time=0.0, epoch=0, g_losses=[], d_losses=[],
                 state=state, cfg=cfg)
    ckpt_io.export_torch(native, str(d / "checkpoints" / "000.checkpoint"))

    ref_params = paramutil.Params(str(d / "params.json"))
    waveform_test.run(ref_params, "valid", "000.checkpoint")

    csv_path = d / "comparisons" / "valid" / "000.csv"
    assert csv_path.exists()
    df = pd.read_csv(csv_path)
    assert len(df) == len(store)
    assert {"filename", "pcc_r", "rmse", "real_rhc", "pred_rhc"} <= set(df.columns)
    assert np.isfinite(df["pcc_r"].to_numpy()).all()
    # the reference's own prediction == scgrhc's prediction on the same
    # checkpoint + segments (cross-framework numerical parity)
    from scgrhc.eval.infer import predict_split

    _, pred, scores = predict_split(state.g_params, store, batch=6)
    row = df[df["filename"] == "rec0"].iloc[0]
    ref_first = np.array(json.loads(row["pred_rhc"]))
    ours_first = pred[0]
    np.testing.assert_allclose(ref_first, ours_first, atol=2e-3)


def test_export_loaders_cli(tmp_path):
    """'scgrhc export-loaders' re-encodes all three native loader files."""
    import scgrhc.pipeline.run as pr

    d = tmp_path / "exp"
    os.makedirs(d)
    (d / "params.json").write_text(json.dumps({
        "in_channels": ["a", "b"], "chamber": "PA", "segment_size": 1.5,
        "batch_size": 4, "dir_path": str(d),
        "train_path": "loader_train.pickle",
        "valid_path": "loader_valid.pickle",
        "test_path": "loader_test.pickle",
        "checkpoint_dir_path": "checkpoints",
        "comparison_dir_path": "comparisons",
        "pred_top_dir_path": "pred_top", "pred_rand_dir_path": "pred_rand",
        "alpha": 1e-4, "beta1": 0.5, "beta2": 0.999, "n_critic": 2,
        "lambda_gp": 10, "lambda_aux": 100, "total_epochs": 1,
        "min_RHC": -50, "use_global_min_max": False,
    }))
    for name in ("loader_train.pickle", "loader_valid.pickle",
                 "loader_test.pickle"):
        SegmentLoader(_store(), 4, shuffle=False).save(str(d / name))
    assert pr.dispatch(["export-loaders", str(d)]) == 0
    out_dir = d / "torch_loaders"
    for name in ("loader_train.pickle", "loader_valid.pickle",
                 "loader_test.pickle"):
        with open(out_dir / name, "rb") as f:
            loader = pickle.load(f)
        assert len(loader.dataset) == 6
    # train keeps the experiment batch size; valid/test are batch 1
    with open(out_dir / "loader_train.pickle", "rb") as f:
        assert pickle.load(f).batch_size == 4
    with open(out_dir / "loader_valid.pickle", "rb") as f:
        assert pickle.load(f).batch_size == 1
