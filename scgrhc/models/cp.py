"""Context-parallel (time-sharded) continuous whole-record inference.

Two new inference modes for the generator, beyond the reference's
windowed semantics (the reference can ONLY process independent 750-sample
windows, recordutil.py:122-149):

* :func:`apply_continuous` — run the U-Net over an arbitrarily long
  record as ONE sequence: convs keep their k3 p1 zero-padding at the
  record ends, pooling becomes SAME-padded (edge max over available
  samples), upsampling's ConvTranspose k3 s1 is expressed as the
  equivalent SAME conv with the flipped kernel, and InstanceNorm
  normalizes over the full record.  Every op is length-preserving, so
  L in → L out with no window seams.

* :func:`apply_cp` — the SAME math sharded over a mesh ``time`` axis
  inside ``shard_map``: each chip holds a contiguous time block, every
  local op exchanges its 1-sample halo with neighbors via
  ``lax.ppermute`` (unmatched ends receive zeros — exactly the
  continuous mode's zero padding), and InstanceNorm moments are reduced
  across chips with ``lax.psum``.  Output is numerically the continuous
  mode's, distributed.  This is the conv-receptive-field halo-exchange
  scheme of SURVEY §2.3's CP row, with collective norm statistics.

Weights are the ordinary generator pytree — no retraining or conversion.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from scgrhc.ops.nn import IN_EPS, conv1d, relu


# -- halo exchange primitives (inside shard_map) ------------------------------


def _edge_from_left(col, axis, n):
    """Every shard receives its LEFT neighbor's column (zeros at shard 0)."""
    return lax.ppermute(col, axis, [(i, i + 1) for i in range(n - 1)])


def _edge_from_right(col, axis, n):
    return lax.ppermute(col, axis, [(i, i - 1) for i in range(1, n)])


def _with_halo(x, axis, n):
    """(1, C, T) → (1, C, T+2) with 1-sample halos from neighbors (zeros at
    the global record ends — the continuous mode's conv padding)."""
    left = _edge_from_left(x[..., -1:], axis, n)
    right = _edge_from_right(x[..., :1], axis, n)
    return jnp.concatenate((left, x, right), axis=-1)


# -- length-preserving op variants -------------------------------------------


def _conv3(x, w, b, axis, n):
    """k3 SAME conv: zero pad (single-device) or neighbor halo (CP)."""
    if axis is None:
        return conv1d(x, w, b, padding=1)
    return conv1d(_with_halo(x, axis, n), w, b, padding=0)


def _conv_transpose3(x, w, b, axis, n):
    """ConvTranspose1d k3 s1 center-cropped to length — identically a SAME
    conv with the kernel flipped and in/out channels swapped."""
    w_eq = jnp.flip(w, axis=-1).transpose(1, 0, 2)  # (I,O,K) → (O,I,K)
    return _conv3(x, w_eq, b, axis, n)


def _max_pool3_same(x, axis, n):
    """k3 s1 SAME max pool: record ends take the max over available
    samples (-inf fill); CP shards fill from neighbors."""
    if axis is None:
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1)), constant_values=-jnp.inf)
    else:
        ones = jnp.ones_like(x[..., :1])
        left = _edge_from_left(x[..., -1:], axis, n)
        lmask = _edge_from_left(ones, axis, n)
        right = _edge_from_right(x[..., :1], axis, n)
        rmask = _edge_from_right(ones, axis, n)
        neg = jnp.float32(-jnp.inf)
        left = jnp.where(lmask > 0, left, neg)
        right = jnp.where(rmask > 0, right, neg)
        xp = jnp.concatenate((left, x, right), axis=-1)
    return lax.reduce_window(xp, -jnp.inf, lax.max, (1, 1, 3), (1, 1, 1), "VALID")


def _instance_norm_global(x, axis):
    """InstanceNorm over the FULL record length (psum across time shards)."""
    s = jnp.sum(x, axis=-1, keepdims=True)
    ss = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    cnt = jnp.float32(x.shape[-1])
    if axis is not None:
        s = lax.psum(s, axis)
        ss = lax.psum(ss, axis)
        cnt = lax.psum(cnt, axis)
    mean = s / cnt
    # clamp like ops.nn.instance_norm: one-pass E[x²]−mean² cancellation
    # can go slightly negative in f32 (worse here — the sums psum over
    # up-to-millions of samples), and rsqrt of a negative NaNs the whole
    # record
    var = jnp.maximum(ss / cnt - jnp.square(mean), 0.0)
    return (x - mean) * lax.rsqrt(var + IN_EPS)


# -- model forward ------------------------------------------------------------


def _block(p, x, axis, n):
    x = relu(_instance_norm_global(_conv3(x, p["conv1"]["w"], p["conv1"]["b"], axis, n), axis))
    x = relu(_instance_norm_global(_conv3(x, p["conv2"]["w"], p["conv2"]["b"], axis, n), axis))
    return x


def _attention(p, g, x, axis):
    """1x1-conv additive attention gate (local ops; norms are global)."""
    g1 = _instance_norm_global(conv1d(g, p["W_g"]["w"], p["W_g"]["b"]), axis)
    x1 = _instance_norm_global(conv1d(x, p["W_x"]["w"], p["W_x"]["b"]), axis)
    psi = jax.nn.sigmoid(
        _instance_norm_global(conv1d(relu(g1 + x1), p["psi"]["w"], p["psi"]["b"]), axis)
    )
    return x * psi


def _forward(params, x, axis, n):
    e1 = _block(params["enc1"], x, axis, n)
    e2 = _block(params["enc2"], _max_pool3_same(e1, axis, n), axis, n)
    e3 = _block(params["enc3"], _max_pool3_same(e2, axis, n), axis, n)
    b = _block(params["bottleneck"], _max_pool3_same(e3, axis, n), axis, n)

    d3 = _conv_transpose3(b, params["up3"]["w"], params["up3"]["b"], axis, n)
    d3 = _block(params["dec3"], jnp.concatenate((d3, _attention(params["att3"], d3, e3, axis)), axis=1), axis, n)
    d2 = _conv_transpose3(d3, params["up2"]["w"], params["up2"]["b"], axis, n)
    d2 = _block(params["dec2"], jnp.concatenate((d2, _attention(params["att2"], d2, e2, axis)), axis=1), axis, n)
    d1 = _conv_transpose3(d2, params["up1"]["w"], params["up1"]["b"], axis, n)
    d1 = _block(params["dec1"], jnp.concatenate((d1, _attention(params["att1"], d1, e1, axis)), axis=1), axis, n)
    return conv1d(d1, params["final"]["w"], params["final"]["b"])


@jax.jit
def apply_continuous(params, x):
    """Continuous whole-record forward.  x (1, C, L) → (1, 1, L)."""
    return _forward(params, x, None, 1)


def apply_cp(params, record, mesh, axis: str = "time"):
    """Time-sharded continuous forward over ``mesh``'s ``axis``.

    record (C, L) with L divisible by the axis size → (1, 1, L), computed
    with each chip owning an L/n block, 1-sample halo exchanges per local
    op, and psum'd InstanceNorm moments.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[axis]
    c, L = record.shape
    assert L % n == 0, f"record length {L} not divisible by {n} shards"
    x = record.reshape(1, c, L)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, None, axis)),
        out_specs=P(None, None, axis),
    )
    def sharded(p, xs):
        return _forward(p, xs, axis, n)

    return sharded(params, x)
