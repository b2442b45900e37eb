"""int8 post-training-quantized inference (models.quant, ``dtype: "int8"``).

The int8 path is an opt-in, inference-only quantization of the generator's
conv body (per-output-channel int8 weights, dynamic per-tensor activation
scales, f32 norms/attention/final) — measured NEGATIVE for throughput on
this chip's conv path (BENCH.md) and kept as a tested, documented knob.
Its parity contract is task-level (prediction correlation vs the f32
forward), not the elementwise gates the f32/bf16 paths meet.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scgrhc.core.params import Params
from scgrhc.models import generator, quant

T = 750


@pytest.fixture(scope="module")
def setup():
    params = generator.init(jax.random.key(0), 2)
    x = jax.random.uniform(jax.random.key(1), (6, 2, T), jnp.float32)
    return params, x


def test_quantized_tree_structure(setup):
    params, _ = setup
    q = generator.cast_params(params, jnp.int8)
    assert quant.is_quantized(q)
    assert not quant.is_quantized(params)
    for name in ("enc1", "enc2", "enc3", "bottleneck", "dec3", "dec2", "dec1"):
        for c in ("conv1", "conv2"):
            assert q[name][c]["wq"].dtype == jnp.int8
            assert q[name][c]["ws"].dtype == jnp.float32
            assert q[name][c]["b"].dtype == jnp.float32
    for name in ("up3", "up2", "up1"):
        # transpose convs are pre-lowered to (O, I, K) ordinary-conv layout
        i, o, k = params[name]["w"].shape
        assert q[name]["wq"].shape == (o, i, k)
    # attention + final stay float
    assert q["final"]["w"].dtype == jnp.float32


def test_weight_quantization_roundtrip(setup):
    """Dequantized int8 weights reconstruct f32 weights to within half an
    int8 step per output channel (symmetric per-channel scaling)."""
    params, _ = setup
    q = generator.cast_params(params, jnp.int8)
    w = np.asarray(params["bottleneck"]["conv1"]["w"], np.float32)
    wq = np.asarray(q["bottleneck"]["conv1"]["wq"], np.float32)
    ws = np.asarray(q["bottleneck"]["conv1"]["ws"])
    err = np.abs(wq * ws[:, None, None] - w)
    assert (err <= 0.5 * ws[:, None, None] + 1e-7).all()


@pytest.mark.slow
def test_int8_forward_close_to_f32(setup):
    """Task-level parity: int8 predictions are strongly correlated with the
    f32 forward.  At random init (worst case — no trained structure, every
    InstanceNorm amplifies rounding noise through 17 quantized convs) the
    per-segment correlation still clears 0.9; trained checkpoints measure
    tighter."""
    params, x = setup
    y32 = np.asarray(generator.apply(params, x, train=False))
    q = generator.cast_params(params, jnp.int8)
    yq = np.asarray(generator.apply(q, x, train=False))
    assert yq.shape == y32.shape
    assert yq.dtype == np.float32
    assert np.isfinite(yq).all()
    for i in range(y32.shape[0]):
        r = np.corrcoef(y32[i, 0], yq[i, 0])[0, 1]
        assert r > 0.9, f"segment {i}: int8-vs-f32 correlation {r}"


def test_int8_train_rejected(setup):
    params, x = setup
    q = generator.cast_params(params, jnp.int8)
    with pytest.raises(ValueError, match="inference-only"):
        generator.apply(q, x, rng=jax.random.key(0), train=True)
    with pytest.raises(ValueError, match="quantized weight tree"):
        generator.apply(params, x, train=False, dtype=jnp.int8)


def test_params_dtype_validation(tmp_path):
    import json
    import os

    base = {
        "in_channels": ["patch_ACC_lat"], "chamber": "PA", "segment_size": 1.5,
        "batch_size": 4, "dir_path": str(tmp_path),
        "train_path": "a", "valid_path": "b", "test_path": "c",
        "checkpoint_dir_path": "d", "comparison_dir_path": "e",
        "pred_top_dir_path": "f", "pred_rand_dir_path": "g",
        "alpha": 1e-4, "beta1": 0.5, "beta2": 0.999, "n_critic": 2,
        "lambda_gp": 10, "lambda_aux": 100, "total_epochs": 1,
        "min_RHC": -50, "use_global_min_max": False,
    }

    def write(extra):
        p = os.path.join(tmp_path, "params.json")
        with open(p, "w") as f:
            json.dump({**base, **extra}, f)
        return p

    assert Params(write({"dtype": "int8"})).dtype == "int8"
    with pytest.raises(ValueError, match="dtype must be"):
        Params(write({"dtype": "int4"}))
    with pytest.raises(ValueError, match="train_dtype must be"):
        Params(write({"train_dtype": "int8"}))


@pytest.mark.slow
def test_predict_split_int8(setup):
    """``dtype: "int8"`` flows through the eval stage unchanged — both the
    serial chunked path and the vmapped stacked multi-checkpoint path."""
    from tests.test_eval_select import _random_store

    from scgrhc.eval.infer import predict_split, predict_split_multi

    params, _ = setup
    store = _random_store(n=6, c=2)
    _, p32, _ = predict_split(params, store, batch=6)
    _, pq, sq = predict_split(params, store, batch=6, dtype="int8")
    assert np.isfinite(pq).all()
    # denormalized waveforms: correlation with the f32 path per segment
    for i in range(p32.shape[0]):
        assert np.corrcoef(p32[i], pq[i])[0, 1] > 0.9

    params2 = generator.init(jax.random.key(7), 2)
    multi = predict_split_multi(
        [params, params2], store, batch=6, stack=2, dtype="int8"
    )
    assert len(multi) == 2
    # the stacked (vmapped) program matches per-checkpoint serial int8 eval
    np.testing.assert_allclose(multi[0][1], pq, rtol=1e-4, atol=1e-3)
    for _, pred, scores in multi:
        assert np.isfinite(pred).all()
        assert np.isfinite(scores["pcc_r"]).all()
