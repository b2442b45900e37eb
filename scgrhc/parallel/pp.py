"""Pipeline parallelism: 2-stage microbatched generator inference.

The reference has no distributed execution at all; this is the TPU-native
pipeline axis of SURVEY §2.3, completing the mesh-axis family (``data`` =
DP, ``model`` = TP, ``time`` = SP/CP, sweep fan-out = EP, ``stage`` = PP).

The attention U-Net has exactly one natural cut: after the bottleneck.
Stage 0 runs the encoder (enc1..enc3 + bottleneck,
``generator.encode``); stage 1 runs the decoder (up/attention/dec ×3 +
final 1×1 conv, ``generator.decode``).  The inter-stage payload is the
U-Net's skip set — (e1, e2, e3, b), ≈715k floats per 750-sample segment —
packed into ONE flat buffer so a single ``lax.ppermute`` per microbatch
ships it over ICI.  Deeper cuts would ship the same skips across more
hops for less compute per stage, so S=2 is the right depth for this
model.

Schedule: classic 1F pipeline.  The batch is split into M microbatches;
at tick t (t = 0..M), stage 0 encodes microbatch ``min(t, M-1)`` while
stage 1 decodes microbatch ``t-1`` from the activations ppermuted to it
at the previous tick — both stages are busy on every interior tick, and
the bubble fraction is (S-1)/(M+S-1).  The whole schedule is ONE
``lax.scan`` inside ONE ``shard_map`` program: both stage bodies live in
a ``lax.switch`` on ``lax.axis_index`` (SPMD — every device holds the
same program, the branch picks its stage's work), so XLA overlaps the
ppermute with the next tick's compute.

Scope: inference.  Training-path parallelism is DP × TP (parallel/dp,
parallel/tp) — at ~10 M generator params a training pipeline would be
bubble- and transfer-bound long before it paid for itself, and the WGAN-GP
step's critic/generator alternation leaves no long per-sample chain to
pipeline.  Weights are replicated on both stages (~40 MB; activation
residency, not weight residency, is what PP partitions here).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

STAGE_AXIS = "stage"
N_STAGES = 2  # the U-Net's one natural cut (module docstring)


def make_pp_mesh(axis: str = STAGE_AXIS):
    """1-D 2-device ``stage`` mesh over the first two devices."""
    import numpy as np

    devs = jax.devices()
    if len(devs) < N_STAGES:
        raise ValueError(f"pipeline needs {N_STAGES} devices, have {len(devs)}")
    return jax.sharding.Mesh(np.asarray(devs[:N_STAGES]), (axis,))


def _skip_shapes(t: int, mb: int, widths=(64, 128, 256, 512)):
    """Shapes of the inter-stage payload for segment length ``t``.

    Encoder lengths follow the reference geometry T → T-2 → T-4 → T-6
    (MaxPool k3 s1, reference: waveform_train.py:175-181); they must stay
    positive, and the decoder's ConvTranspose k3 s1 (+2 per level)
    reconciles them back to T exactly, so the ``_pad_size`` quirk branch
    is dead here just as it is in ``generator.apply``.

    ``widths`` are the (e1, e2, e3, bottleneck) channel counts — callers
    with a param tree in hand should derive them via :func:`_skip_widths`
    so a generator-geometry change can't silently desynchronize this
    table (it would otherwise only surface as a reshape-size trace error
    inside the shard_map).
    """
    if t <= 6:
        raise ValueError(f"segment length {t} too short for the U-Net (need > 6)")
    w1, w2, w3, wb = widths
    return (
        (mb, w1, t),
        (mb, w2, t - 2),
        (mb, w3, t - 4),
        (mb, wb, t - 6),
    )


def _skip_widths(params):
    """(e1, e2, e3, bottleneck) out-channel widths read off the params."""
    return tuple(
        params[name]["conv2"]["w"].shape[0]
        for name in ("enc1", "enc2", "enc3", "bottleneck")
    )


def _pack(acts):
    """(e1, e2, e3, b) → (mb, P) flat buffer for one ppermute."""
    mb = acts[0].shape[0]
    return jnp.concatenate([a.reshape(mb, -1) for a in acts], axis=1)


def _unpack(buf, shapes):
    out, off = [], 0
    for s in shapes:
        n = s[1] * s[2]
        out.append(buf[:, off : off + n].reshape(s))
        off += n
    return tuple(out)


def pipeline_infer(params, scg, mesh, microbatch: int = 8,
                   axis: str = STAGE_AXIS):
    """Pipeline-parallel eval forward.  scg (B, C, T) → (B, 1, T).

    Numerically the single-device ``generator.apply(train=False)`` — the
    stage bodies ARE ``generator.encode``/``generator.decode``, so the op
    sequence is identical; only placement changes.  B is padded up to a
    multiple of ``microbatch`` internally (padded rows computed and
    dropped).  Weight dtype picks compute precision exactly as in
    ``apply`` (bf16 params ⇒ bf16 skips on the wire ⇒ half the ICI
    bytes).
    """
    if mesh.shape[axis] != N_STAGES:
        raise ValueError(
            f"mesh axis {axis!r} has size {mesh.shape[axis]}; the U-Net "
            f"pipeline is {N_STAGES}-stage (one cut, at the bottleneck)"
        )
    if microbatch < 1:
        raise ValueError(f"microbatch must be >= 1, got {microbatch}")
    from scgrhc.models import quant

    if quant.is_quantized(params):
        raise ValueError(
            "int8-quantized param trees are unsupported under pipeline "
            "parallelism (the stage bodies call generator.encode/decode "
            "directly); dequantize or use the single-device int8 path"
        )
    from jax.sharding import NamedSharding

    # Inputs may arrive committed to a different mesh (e.g. DP-replicated
    # over all chips); re-place them onto the stage mesh explicitly so
    # the jit below sees one consistent device set.  Arrays already
    # committed to this mesh pass through untouched — repeated calls must
    # not re-upload the ~40 MB tree (ADVICE r3).
    rep = NamedSharding(mesh, P())

    def _place(a):
        if getattr(a, "sharding", None) == rep:
            return a
        return jax.device_put(a, rep)

    params = jax.tree.map(_place, params)
    scg = _place(scg)

    b_in, c, t = scg.shape
    if b_in == 0:
        raise ValueError("empty batch: scg has 0 rows")
    mb = min(microbatch, b_in)
    n_mb = -(-b_in // mb)  # ceil
    b_pad = n_mb * mb
    dtype = jax.tree.leaves(params)[0].dtype
    x = jnp.pad(scg.astype(dtype), ((0, b_pad - b_in), (0, 0), (0, 0)))
    widths = _skip_widths(params)
    out_dtype = params["final"]["w"].dtype

    run = _compiled_run(
        mesh, axis, mb, n_mb, c, t, widths,
        jnp.dtype(dtype).name, jnp.dtype(out_dtype).name,
    )
    return run(params, x)[:b_in]


@lru_cache(maxsize=64)
def _compiled_run(mesh, axis, mb, n_mb, c, t, widths, dtype_name,
                  out_dtype_name):
    """One cached jitted shard_map program per (mesh, schedule, shapes).

    Rebuilding the closure per call would give every call a fresh jit
    cache — a ~21 s remote retrace/recompile per request if this path is
    ever reused for serving (ADVICE r3).
    """
    from scgrhc.models import generator
    from jax import shard_map

    dtype = jnp.dtype(dtype_name)
    out_dtype = jnp.dtype(out_dtype_name)
    b_pad = n_mb * mb
    shapes = _skip_shapes(t, mb, widths)

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P(), P()), out_specs=P())
    def run(p, xs):
        stage = lax.axis_index(axis)
        dummy = jnp.zeros((mb, c, t), dtype)  # length ref for decode's quirk

        def _vary(pair):
            # Both switch branches must agree on the varying-axis type of
            # each output (one computes from replicated inputs, the other
            # from the ppermuted — varying — buffer).
            return tuple(
                a if axis in getattr(jax.typeof(a), "vma", ())
                else lax.pcast(a, axis, to="varying")
                for a in pair
            )

        def stage0(recv, ti):
            xi = lax.dynamic_slice_in_dim(
                xs, jnp.minimum(ti, n_mb - 1) * mb, mb, axis=0
            )
            acts = generator.encode(p, xi)
            return _vary((_pack(acts), jnp.zeros((mb, 1, t), out_dtype)))

        def stage1(recv, ti):
            e1, e2, e3, bb = _unpack(recv, shapes)
            y = generator.decode(p, dummy, e1, e2, e3, bb)
            return _vary((jnp.zeros_like(recv), y))

        def tick(carry, ti):
            out, recv = carry
            send, y = lax.switch(stage, (stage0, stage1), recv, ti)
            out = lax.dynamic_update_slice_in_dim(
                out, y, jnp.maximum(ti - 1, 0) * mb, axis=0
            )
            recv = lax.ppermute(send, axis, [(0, 1)])
            return (out, recv), None

        # The carries are device-varying (each stage accumulates different
        # values), so the zero inits must carry the varying-axis type too.
        pack_n = sum(s[1] * s[2] for s in shapes)
        out0 = lax.pcast(jnp.zeros((b_pad, 1, t), out_dtype), axis, to="varying")
        recv0 = lax.pcast(jnp.zeros((mb, pack_n), dtype), axis, to="varying")
        (out, _), _ = lax.scan(tick, (out0, recv0), jnp.arange(n_mb + 1))
        # Stage 0's accumulator only ever received zeros; the psum makes
        # the result provably replicated for the P() out_spec.
        return lax.psum(out, axis)

    return run
