"""Pipeline-parallel (stage-sharded) generator inference.

The 2-stage microbatched pipeline (scgrhc.parallel.pp) must reproduce the
single-device eval forward: the stage bodies are generator.encode/decode,
so any drift beyond XLA fusion jitter is a scheduling bug (a microbatch
decoded from the wrong tick's activations shows up as gross error, not
jitter).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scgrhc.models import generator
from scgrhc.parallel import pp

C, T = 3, 96


@pytest.fixture(scope="module")
def params():
    return generator.init(jax.random.key(0), C)


@pytest.fixture(scope="module")
def mesh():
    return pp.make_pp_mesh()


@pytest.mark.slow
def test_pipeline_matches_single_device(params, mesh):
    x = jax.random.uniform(jax.random.key(1), (12, C, T), jnp.float32)
    ref = np.asarray(generator.apply(params, x, train=False))
    out = np.asarray(pp.pipeline_infer(params, x, mesh, microbatch=4))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_pipeline_pads_ragged_batch(params, mesh):
    # B=13, mb=4 → 4 microbatches with one padded row, dropped on return.
    x = jax.random.uniform(jax.random.key(2), (13, C, T), jnp.float32)
    ref = np.asarray(generator.apply(params, x, train=False))
    out = np.asarray(pp.pipeline_infer(params, x, mesh, microbatch=4))
    assert out.shape == (13, 1, T)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_pipeline_single_microbatch_and_clamped_mb(params, mesh):
    # mb > B clamps to B: a 1-microbatch pipeline (pure 2-tick handoff).
    x = jax.random.uniform(jax.random.key(3), (3, C, T), jnp.float32)
    ref = np.asarray(generator.apply(params, x, train=False))
    out = np.asarray(pp.pipeline_infer(params, x, mesh, microbatch=64))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_pipeline_bf16_payload(params, mesh):
    # bf16 weight tree ⇒ bf16 skips on the wire (half the ICI bytes) and
    # an f32 output epilogue (cast_params keeps `final` f32).  Compare
    # against the single-device bf16 forward at a tolerance matched to
    # bf16 reassociation (CPU accumulates bf16 natively — see ops.nn).
    x = jax.random.uniform(jax.random.key(4), (8, C, T), jnp.float32)
    pb = generator.cast_params(params, jnp.bfloat16)
    ref = np.asarray(generator.apply(pb, x, train=False), np.float32)
    out_dev = pp.pipeline_infer(pb, x, mesh, microbatch=4)
    assert out_dev.dtype == jnp.float32  # f32 final epilogue survives PP
    out = np.asarray(out_dev, np.float32)
    np.testing.assert_allclose(out, ref, atol=0.3)
    # and it still tracks the f32 truth to bf16 precision
    f32 = np.asarray(generator.apply(params, x, train=False))
    np.testing.assert_allclose(out, f32, atol=0.3)


def test_pipeline_rejects_wrong_stage_count(params):
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:4])
    with pytest.raises(ValueError, match="2-stage"):
        pp.pipeline_infer(
            params,
            jnp.zeros((4, C, T)),
            Mesh(devs, (pp.STAGE_AXIS,)),
            microbatch=2,
        )


def test_skip_shapes_reject_short_segments():
    with pytest.raises(ValueError, match="too short"):
        pp._skip_shapes(6, 2)


def test_pipeline_rejects_bad_inputs(params, mesh):
    # ADVICE r3: clear errors instead of ZeroDivision / opaque trace faults.
    with pytest.raises(ValueError, match="microbatch"):
        pp.pipeline_infer(params, jnp.zeros((4, C, T)), mesh, microbatch=0)
    with pytest.raises(ValueError, match="empty batch"):
        pp.pipeline_infer(params, jnp.zeros((0, C, T)), mesh, microbatch=4)


def test_pipeline_rejects_int8_tree(params, mesh):
    from scgrhc.models import quant

    qp = quant.quantize_generator(params)
    with pytest.raises(ValueError, match="int8"):
        pp.pipeline_infer(qp, jnp.zeros((4, C, T)), mesh, microbatch=2)


def test_pipeline_program_cached_and_widths_derived(params, mesh):
    # Same (mesh, schedule, shapes) → the same compiled program object;
    # widths come off the param tree, matching generator._BLOCKS.
    assert pp._skip_widths(params) == tuple(c for _, _, c in generator._BLOCKS[:4])
    x = jax.random.uniform(jax.random.key(7), (8, C, T), jnp.float32)
    pp.pipeline_infer(params, x, mesh, microbatch=4)
    key = (mesh, pp.STAGE_AXIS, 4, 2, C, T, pp._skip_widths(params),
           "float32", "float32")
    info0 = pp._compiled_run.cache_info()
    pp.pipeline_infer(params, x, mesh, microbatch=4)
    info1 = pp._compiled_run.cache_info()
    assert info1.hits == info0.hits + 1
    assert pp._compiled_run(*key) is pp._compiled_run(*key)
