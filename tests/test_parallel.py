"""Multi-chip paths on the 8-virtual-device CPU mesh (SURVEY.md §2.3-2.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scgrhc.models import generator
from scgrhc.parallel.mesh import batch_sharding, make_mesh, replicate, shard_batch
from scgrhc.parallel.stream import frame_record, stream_infer
from scgrhc.train.wgan import TrainConfig, init_state, train_step

T = 96  # short windows: the model is length-polymorphic; CPU tests stay fast


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_mesh_axes(mesh8):
    assert mesh8.axis_names == ("data",)
    assert mesh8.devices.size == 8


@pytest.mark.slow
def test_dp_train_step_matches_single_device(mesh8):
    """One DP step over 8 chips == the same step unsharded (GSPMD inserts
    the gradient all-reduce; numerics match to f32 reassociation)."""
    cfg = TrainConfig(n_critic=1)
    state = init_state(jax.random.key(0), 1, cfg)
    rng = np.random.default_rng(0)
    scg = jnp.asarray(rng.random((8, 1, T)), jnp.float32)
    rhc = jnp.asarray(rng.random((8, 1, T)), jnp.float32)
    key = jax.random.key(1)

    def clone(tree):
        return jax.tree.map(lambda x: jnp.array(x), tree)

    ref_state, ref_d, ref_g = train_step(clone(state), scg, rhc, key, cfg)

    sh_state = replicate(mesh8, clone(state))
    s_scg, s_rhc = shard_batch(mesh8, scg, rhc)
    dp_state, dp_d, dp_g = train_step(sh_state, s_scg, s_rhc, key, cfg)

    assert abs(float(dp_g) - float(ref_g)) / max(abs(float(ref_g)), 1.0) < 1e-3
    np.testing.assert_allclose(np.asarray(dp_d), np.asarray(ref_d), rtol=2e-3)
    # Adam's first step normalizes to ±lr, so f32 reassociation across
    # shards moves params by O(lr) at worst; assert within a few lr.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4
        ),
        dp_state.g_params, ref_state.g_params,
    )


@pytest.mark.slow
def test_dp_gather_place_and_epoch_scan(mesh8):
    """The train stage's multi-chip epoch path: the store is replicated
    into HBM once (NOT re-staged per epoch), only the (nb, B) permutation
    crosses host→device, and DP engages even when the batch size doesn't
    divide the mesh (B=17 on 8 devices → padded to 24 with 7 masked rows)."""
    from scgrhc.data.store import SegmentStore
    from scgrhc.train.run import _dp_gather_place, _pad_idx_mask
    from scgrhc.train.wgan import train_epoch_gather

    cfg = TrainConfig(n_critic=1)
    state = init_state(jax.random.key(0), 1, cfg)
    rng = np.random.default_rng(1)
    N = 40
    store = SegmentStore(
        rng.random((N, 1, T)).astype(np.float32),
        rng.random((N, 1, T)).astype(np.float32),
        [f"r{i}" for i in range(N)], np.zeros(N, np.int64),
        np.zeros(N, np.int64), np.zeros((N, 2)), np.zeros((N, 2)),
        segment_samples=T,
    )

    # non-divisible batch: pad + mask
    idx = rng.permutation(N)[: 2 * 17].reshape(2, 17).astype(np.int32)
    p_state, scg_all, rhc_all, p_idx, mask = _dp_gather_place(state, store, idx)
    assert p_idx.shape == (2, 24)  # padded to the next multiple of 8
    assert mask is not None and float(np.asarray(mask).sum()) == 17.0
    assert len(p_idx.sharding.device_set) == 8
    assert len(scg_all.sharding.device_set) == 8  # resident on every chip

    new_state, d_hist, g_hist = train_epoch_gather(
        p_state, scg_all, rhc_all, p_idx, jax.random.key(2), cfg, mask
    )
    assert np.isfinite(np.asarray(g_hist)).all()
    assert np.isfinite(np.asarray(d_hist)).all()

    # no per-epoch staging: a second epoch's placement reuses the SAME
    # resident arrays (store-level cache hit) — only idx is new
    idx2 = rng.permutation(N)[: 2 * 17].reshape(2, 17).astype(np.int32)
    _, scg_all2, rhc_all2, _, _ = _dp_gather_place(new_state, store, idx2)
    assert scg_all2 is scg_all and rhc_all2 is rhc_all

    # divisible batch: no mask, idx untouched
    idx8, mask8 = _pad_idx_mask(idx[:, :16], 8)
    assert mask8 is None and idx8.shape == (2, 16)


def test_frame_record_matches_reference_chopping():
    """Framing == the reference's non-overlapping window chop
    (recordutil.py:141-148), truncating the tail."""
    x = jnp.arange(2 * 10, dtype=jnp.float32).reshape(2, 10)
    w = frame_record(x, 4)
    assert w.shape == (2, 2, 4)
    np.testing.assert_array_equal(np.asarray(w[0, 0]), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(w[1, 1]), [14, 15, 16, 17])


def test_stream_infer_sharded_equals_local(mesh8):
    """Window-sharded streaming inference == unsharded (exact sequence
    parallelism: windows are independent)."""
    g = init_state(jax.random.key(0), 3, TrainConfig()).g_params
    rec = jnp.asarray(np.random.default_rng(2).random((3, T * 16)), jnp.float32)
    local = stream_infer(g, rec, segment_samples=T, batch=16)
    sharded = stream_infer(g, rec, segment_samples=T, mesh=mesh8, batch=16)
    assert local.shape == (T * 16,)
    np.testing.assert_allclose(local, sharded, atol=2e-5)


def test_stream_infer_fused_equals_chunked():
    """The single-dispatch serving path (_fused_stream: n <= batch, one
    program, one packed scalar upload) == the chunked dispatch chain
    (forced via a small batch), float and int16-ADC inputs alike."""
    g = init_state(jax.random.key(0), 2, TrainConfig()).g_params
    rng = np.random.default_rng(7)
    rec = rng.random((2, T * 6)).astype(np.float32) * 2 - 1
    fused = stream_infer(g, rec, segment_samples=T, batch=16,
                         rhc_minmax=((-3.0), 5.0))
    chunked = stream_infer(g, rec, segment_samples=T, batch=2,
                           rhc_minmax=((-3.0), 5.0))
    np.testing.assert_allclose(fused, chunked, atol=2e-5)

    # ADC path: int16 upload + on-device calibration, fused vs chunked
    gain = np.asarray([1000.0, 500.0], np.float32)
    base = np.asarray([10.0, -5.0], np.float32)
    sentinel = np.asarray([-32768.0, -32768.0], np.float32)
    adc = np.clip(rec * gain[:, None] + base[:, None],
                  -32767, 32767).astype(np.int16)
    cal = (gain, base, sentinel)
    fused_adc = stream_infer(g, adc, segment_samples=T, batch=16,
                             calibration=cal)
    chunked_adc = stream_infer(g, adc, segment_samples=T, batch=2,
                               calibration=cal)
    np.testing.assert_allclose(fused_adc, chunked_adc, atol=2e-5)
    # and the calibrated ADC path tracks the physical-float path
    phys = (adc.astype(np.float32) - base[:, None]) / gain[:, None]
    fused_phys = stream_infer(g, phys, segment_samples=T, batch=16)
    np.testing.assert_allclose(fused_adc, fused_phys, atol=2e-4)


def test_stream_infer_overlap_blend():
    g = init_state(jax.random.key(0), 1, TrainConfig()).g_params
    rec = jnp.asarray(np.random.default_rng(3).random((1, T * 4)), jnp.float32)
    out = stream_infer(g, rec, segment_samples=T, batch=8, overlap=T // 4)
    assert out.ndim == 1 and np.isfinite(out).all()


@pytest.mark.slow
def test_tp_sharded_forward_matches(mesh8):
    """Generator forward with TP-annotated params (out-channels on the
    'model' axis of a 2x4 DP x TP mesh) == replicated forward."""
    from scgrhc.parallel.tp import make_dp_tp_mesh, param_pspecs, shard_params

    g = init_state(jax.random.key(0), 2, TrainConfig()).g_params
    mesh = make_dp_tp_mesh(dp=2, tp=4)

    specs = param_pspecs(g, tp_size=4)
    # conv weights with >=4 out channels are sharded; 1-channel heads not
    assert specs["enc1"]["conv1"]["w"] == jax.sharding.PartitionSpec(
        "model", None, None)
    assert specs["final"]["w"] == jax.sharding.PartitionSpec(None, None, None)
    assert specs["att3"]["psi"]["w"] == jax.sharding.PartitionSpec(
        None, None, None)

    g_tp = shard_params(g, mesh)
    assert len(g_tp["enc1"]["conv1"]["w"].sharding.device_set) == 8

    x = jnp.asarray(np.random.default_rng(5).random((4, 2, T)), jnp.float32)
    fwd = jax.jit(lambda p, a: generator.apply(p, a, train=False))
    ref = fwd(g, x)
    out = fwd(g_tp, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)


def test_sharded_eval_forward_matches(mesh8):
    g = init_state(jax.random.key(0), 2, TrainConfig()).g_params
    x = jnp.asarray(np.random.default_rng(4).random((16, 2, T)), jnp.float32)
    fwd = jax.jit(lambda p, a: generator.apply(p, a, train=False))
    ref = fwd(g, x)
    out = fwd(replicate(mesh8, g), jax.device_put(x, batch_sharding(mesh8)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sharded_eval_non_divisible_batch(mesh8):
    """Eval auto-sharding engages at ANY eval_batch: predict_split rounds
    the static chunk up to the mesh size and pads-to-static, so a
    non-divisible batch no longer silently drops to one chip."""
    from scgrhc.data.store import SegmentStore
    from scgrhc.eval.infer import predict_split
    from scgrhc.eval.run import _auto_sharding

    sharding = _auto_sharding()  # any eval_batch (e.g. 13 % 8 != 0) must shard
    assert sharding is not None

    rng = np.random.default_rng(0)
    n = 19
    store = SegmentStore(
        rng.random((n, 2, T)).astype(np.float32),
        rng.random((n, 1, T)).astype(np.float32),
        [f"r{i}" for i in range(n)],
        np.zeros(n, np.int64), np.zeros(n, np.int64),
        np.tile([0.0, 1.0], (n, 1)), np.tile([0.0, 1.0], (n, 1)),
        segment_samples=T,
    )
    g = init_state(jax.random.key(0), 2, TrainConfig()).g_params
    r1, p1, s1 = predict_split(g, store, batch=13, sharding=sharding)
    r0, p0, s0 = predict_split(g, store, batch=13)
    np.testing.assert_allclose(p1, p0, atol=2e-5)
    np.testing.assert_allclose(s1["pcc_r"], s0["pcc_r"], atol=1e-5)


def test_stream_infer_rejects_bad_overlap():
    g = init_state(jax.random.key(0), 1, TrainConfig()).g_params
    rec = np.zeros((1, T * 4), np.float32)
    for bad in (T, T + 5, -1):
        with pytest.raises(ValueError, match="overlap"):
            stream_infer(g, rec, segment_samples=T, overlap=bad)


def test_stream_infer_bucketed_fast_path():
    """Nearby record lengths share ONE fused serving program (the
    window-count bucket), and the padded/truncated windows never leak
    into the output: values match the unbucketed chunked path."""
    from scgrhc.parallel import stream as st

    g = init_state(jax.random.key(0), 1, TrainConfig()).g_params
    rng = np.random.default_rng(11)
    rec_a = rng.random((1, T * 9 + 3)).astype(np.float32)  # n=9 → bucket 10
    rec_b = rng.random((1, T * 10)).astype(np.float32)     # n=10 → bucket 10

    out_a = stream_infer(g, rec_a, segment_samples=T, batch=16)
    size_after_a = st._fused_stream._cache_size()
    out_b = stream_infer(g, rec_b, segment_samples=T, batch=16)
    assert st._fused_stream._cache_size() == size_after_a  # same program

    assert out_a.shape == (T * 9,)
    assert out_b.shape == (T * 10,)
    chunked_a = stream_infer(g, rec_a, segment_samples=T, batch=2)
    np.testing.assert_allclose(out_a, chunked_a, atol=2e-5)
    # overlap mode drops the padded windows before blending too
    ov = stream_infer(g, rec_a, segment_samples=T, batch=16, overlap=T // 4)
    assert np.isfinite(ov).all()


def test_bucket_windows_shape():
    from scgrhc.parallel.stream import _bucket_windows

    for n in range(1, 5):
        assert _bucket_windows(n) == n
    assert _bucket_windows(5) == 5       # q=1 in the 4..7 octave
    assert _bucket_windows(9) == 10      # q=2
    assert _bucket_windows(80) == 80     # q=16, exact boundary
    assert _bucket_windows(81) == 96
    for n in range(1, 2000):
        b = _bucket_windows(n)
        assert b >= n and (b - n) / n <= 0.25


def test_blend_keeps_record_endpoints():
    """The cross-fade ramp is exactly 0 at its outer ends; without full
    weight on the first window's leading edge and the last window's
    trailing edge, the record's first and last samples normalized to 0
    (a spurious spike on a calibrated mmHg waveform)."""
    from scgrhc.parallel.stream import _blend

    pred = np.full((3, 8), 5.0, dtype=np.float32)
    out = _blend(pred, hop=4, t=8)
    assert out.shape == (16,)
    np.testing.assert_allclose(out, 5.0)  # including out[0] and out[-1]

    # single window: blend degenerates to the prediction itself
    one = _blend(pred[:1], hop=4, t=8)
    np.testing.assert_allclose(one, 5.0)


def test_mesh_for_request_policy(mesh8):
    """Single policy implementation for serve + predict (VERDICT r3 #6
    review): past-the-bucket shards, in-bucket and invalid overlaps do
    not (invalid overlap defers to stream_infer's loud ValueError)."""
    from scgrhc.parallel.stream import mesh_for_request

    t = 100
    assert mesh_for_request(mesh8, 20 * t, t, batch=16) is mesh8
    assert mesh_for_request(mesh8, 16 * t, t, batch=16) is None
    assert mesh_for_request(None, 20 * t, t, batch=16) is None
    # overlap == t used to ZeroDivision in predict's copy of the gate
    assert mesh_for_request(mesh8, 20 * t, t, overlap=t, batch=16) is None
    assert mesh_for_request(mesh8, 20 * t, t, overlap=-1, batch=16) is None
    # overlapped windows count correctly: 20t samples at hop t/2
    assert mesh_for_request(mesh8, 17 * t, t, overlap=t // 2, batch=32) is mesh8
