"""Checkpoint save/load with the reference's on-disk layout.

The reference saves one dict per epoch at ``checkpoints/{epoch:03d}.checkpoint``
via ``torch.save`` with keys start_time, epoch, g_losses, d_losses,
g_state_dict, d_state_dict, g/d_optimizer_state_dict (reference:
waveform_train.py:401-411); resume loads the lexicographically last filename
(waveform_train.py:289-296,334-346).

We keep the same filenames and dict keys.  Model weights are stored as
torch-layout state_dicts (numpy arrays keyed exactly like the reference's),
so an scgrhc checkpoint converts losslessly to a torch one and vice versa:

  * native save: plain pickle of the dict (numpy arrays);
  * :func:`load` reads BOTH native pickles and reference ``torch.save``
    files (dispatching on the zip magic torch uses);
  * :func:`export_torch` writes a genuine ``torch.save`` file loadable by
    the reference scripts unchanged.

Optimizer state crosses the torch↔optax boundary too: torch Adam keeps
(step, exp_avg, exp_avg_sq) per parameter — a relabeling of optax's
(count, mu, nu) — so resuming a reference run mid-training preserves
optimizer momentum.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np
import optax

from scgrhc.models import torch_compat

_NATIVE_TAG = "scgrhc-checkpoint.v1"


def is_complete_checkpoint(dirpath: str, name: str) -> bool:
    """True for entries safe to resume/evaluate from.

    Excluded: Orbax in-flight temp dirs (``*.orbax-checkpoint-tmp-*``),
    Orbax dirs whose ``meta.json`` hasn't landed (a crash between the
    atomic array commit and the meta write leaves exactly this state —
    see scgrhc.train.orbax_io.save), and scgrhc side-artifacts
    (``*.torch`` exports, ``*.tmp``) that shadow a real checkpoint in the
    reverse-lex sort."""
    if "orbax-checkpoint-tmp" in name:
        return False
    if name.endswith((".torch", ".tmp")):
        return False
    full = os.path.join(dirpath, name)
    if os.path.isdir(full):
        return os.path.exists(os.path.join(full, "meta.json"))
    return True


def get_last_checkpoint_path(dirpath: str) -> str | None:
    """Latest *complete* checkpoint filename, by reverse lexicographic sort
    (reference: waveform_train.py:289-296).  Incomplete entries (see
    :func:`is_complete_checkpoint`) are skipped so a crash mid-save resumes
    from the previous epoch instead of dying on a half-written directory."""
    try:
        names = sorted(os.listdir(dirpath), reverse=True)
    except Exception:
        return None
    for name in names:
        if is_complete_checkpoint(dirpath, name):
            return name
    return None


def list_checkpoints(dirpath: str) -> list[str]:
    """Sorted complete checkpoint names, deduplicated by epoch stem.

    Mixed-backend directories can hold both ``NNN.checkpoint`` and
    ``NNN.checkpoint.orbax`` for the same epoch; evaluation must score
    each epoch once (the reference enumerates raw listdir,
    waveform_test.py:119-124, but it only ever sees one backend)."""
    try:
        names = sorted(os.listdir(dirpath))
    except Exception:
        return []
    out, seen = [], set()
    for name in names:
        if not is_complete_checkpoint(dirpath, name):
            continue
        stem = name.split(".")[0]
        if stem in seen:
            continue
        seen.add(stem)
        out.append(name)
    return out


# -- optax adam ↔ torch Adam state -------------------------------------------
#
# torch's Adam state_dict keys params by integer id in Module.parameters()
# registration order (reference Generator registration: waveform_train.py:
# 101-117; Critic: waveform_train.py:224-243).  That order equals the
# state_dict key order, which we enumerate statically below, and the
# optax mu/nu trees are params-shaped — so the existing state_dict
# relabelers convert them name-for-name and the id mapping becomes exact.
# A genuine reference mid-training checkpoint therefore resumes with its
# Adam moments intact, and our exports load into torch.optim.Adam
# correctly.

_GEN_PARAM_ORDER = tuple(
    [
        f"{blk}.{i}.{wb}"
        for blk in ("enc1", "enc2", "enc3", "bottleneck", "dec3", "dec2", "dec1")
        for i in (0, 3)
        for wb in ("weight", "bias")
    ]
    + [
        f"{att}.{sub}.0.{wb}"
        for att in ("att3", "att2", "att1")
        for sub in ("W_x", "W_g", "psi")
        for wb in ("weight", "bias")
    ]
    + [f"{up}.{wb}" for up in ("up3", "up2", "up1") for wb in ("weight", "bias")]
    + ["final.weight", "final.bias"]
)

_CRITIC_PARAM_ORDER = tuple(
    f"model.{i}.{wb}" for i in (0, 2, 5, 8, 11) for wb in ("weight", "bias")
)


def _interop(kind: str):
    if kind == "generator":
        return (
            _GEN_PARAM_ORDER,
            torch_compat.generator_to_torch_sd,
            torch_compat.generator_from_torch_sd,
        )
    return (
        _CRITIC_PARAM_ORDER,
        torch_compat.critic_to_torch_sd,
        torch_compat.critic_from_torch_sd,
    )


def optax_to_torch_adam_sd(opt_state, params: dict, kind: str, cfg=None) -> dict:
    """optax.adam state → torch ``optim.Adam.state_dict()`` layout, with
    param ids in true torch registration order.

    ``cfg`` (a TrainConfig) supplies the Adam hyperparameters for the
    param_group.  torch's ``Optimizer.load_state_dict`` adopts the saved
    group dicts wholesale (only ``params`` is remapped), so the group must
    carry the full hyperparameter set or the reference's first
    ``optimizer.step()`` after resuming would KeyError on ``lr``/``betas``
    (reference Adam construction: waveform_train.py:325-326 — lr=alpha,
    betas=(beta1, beta2), torch defaults for the rest)."""
    scale_state = opt_state[0]  # ScaleByAdamState(count, mu, nu)
    count = int(scale_state.count)
    order, to_sd, _ = _interop(kind)
    mu_sd = to_sd(jax.tree.map(np.asarray, scale_state.mu), as_torch=False)
    nu_sd = to_sd(jax.tree.map(np.asarray, scale_state.nu), as_torch=False)
    state = {
        i: {"step": count, "exp_avg": mu_sd[key], "exp_avg_sq": nu_sd[key]}
        for i, key in enumerate(order)
    }
    if cfg is None:
        from scgrhc.train.wgan import TrainConfig

        cfg = TrainConfig()
    group = {
        "lr": float(cfg.alpha),
        "betas": (float(cfg.beta1), float(cfg.beta2)),
        "eps": 1e-8,
        "weight_decay": 0,
        "amsgrad": False,
        "maximize": False,
        "foreach": None,
        "capturable": False,
        "differentiable": False,
        "fused": None,
        "params": list(range(len(order))),
    }
    return {"state": state, "param_groups": [group]}


def optax_from_torch_adam_sd(
    sd: dict, params: dict, opt: optax.GradientTransformation, kind: str
):
    """Rebuild an optax.adam state from a torch Adam state_dict (ours or a
    genuine reference one — both use torch registration ordering)."""
    fresh = opt.init(params)
    scale_state = fresh[0]
    state = sd["state"]
    if not state:  # optimizer never stepped
        return fresh
    order, _, from_sd = _interop(kind)
    mu_sd = {key: np.asarray(state[i]["exp_avg"]) for i, key in enumerate(order)}
    nu_sd = {key: np.asarray(state[i]["exp_avg_sq"]) for i, key in enumerate(order)}
    count = np.int32(state[0]["step"])
    new_scale = scale_state._replace(
        count=count, mu=from_sd(mu_sd), nu=from_sd(nu_sd)
    )
    return (new_scale,) + tuple(fresh[1:])


# -- save / load ---------------------------------------------------------------


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


_flat_fetch_jit = None


def _fetch_tree_batched(tree):
    """Pull a device pytree to host numpy in ONE device→host transfer.

    Per-leaf ``np.asarray`` pays a device→host round-trip per leaf; on a
    remote-TPU (tunneled) host that latency dominates the per-epoch
    checkpoint pull — the TrainState is 194 leaves (~41.5 MB), and at
    ~30 ms/round-trip the latency alone (~6 s) exceeds the ~4.3 s the
    bytes need at the measured ~9.5 MB/s D2H bandwidth.  Concatenating
    the float32 leaves on device (one cached jitted program) turns the
    pull into a single bandwidth-bound transfer; the handful of non-f32
    leaves (Adam step counters) fetch individually.  Bytes are identical
    to the per-leaf path; any failure falls back to it."""
    leaves, treedef = jax.tree.flatten(tree)
    f32 = [
        i for i, l in enumerate(leaves)
        if isinstance(l, jax.Array) and l.dtype == np.float32 and l.size > 0
    ]
    if len(f32) < 2:
        return _to_numpy(tree)
    try:
        global _flat_fetch_jit
        if _flat_fetch_jit is None:
            import jax.numpy as jnp

            _flat_fetch_jit = jax.jit(
                lambda xs: jnp.concatenate([x.ravel() for x in xs])
            )
        host = np.asarray(_flat_fetch_jit([leaves[i] for i in f32]))
    except Exception:
        return _to_numpy(tree)  # exotic shardings/platforms: per-leaf path
    out = list(leaves)
    off = 0
    for i in f32:
        n = leaves[i].size
        out[i] = host[off:off + n].reshape(leaves[i].shape)
        off += n
    for i, l in enumerate(out):
        if not isinstance(l, np.ndarray):
            out[i] = np.asarray(l)
    return jax.tree.unflatten(treedef, out)


_async_thread = None
_async_error: list = []
_copy_jit = None


def _device_snapshot(state):
    """Donation-safe device-side copy of the train state.

    The train step donates its input state buffers (wgan.py
    ``donate_argnums=(0,)``), so a background writer must never read the
    live arrays — the next epoch's dispatch would invalidate them under
    it.  One jitted copy (fresh, un-donated output buffers) costs a few
    hundred µs of HBM bandwidth; the slow device→host pull then happens
    safely in the writer thread."""
    global _copy_jit
    if _copy_jit is None:
        import jax.numpy as jnp

        _copy_jit = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
    return _copy_jit(state)


def wait() -> None:
    """Block until an in-flight :func:`save` (``block=False``) is durable.

    Re-raises any exception the background write hit (a silently-dropped
    checkpoint must not look like a successful epoch)."""
    global _async_thread
    if _async_thread is not None:
        _async_thread.join()
        _async_thread = None
    if _async_error:
        raise _async_error.pop()


def save(
    path: str,
    *,
    start_time: float,
    epoch: int,
    g_losses: list,
    d_losses: list,
    state,
    cfg=None,
    block: bool = True,
) -> None:
    """Write a reference-layout checkpoint dict (native pickle).

    ``cfg`` fills the exported Adam param_group hyperparameters (defaults
    match every reference config: lr 1e-4, betas (0.5, 0.999)).

    The write is atomic (``.tmp`` + rename — ``is_complete_checkpoint``
    skips in-flight temps, so a crash mid-write resumes from the previous
    epoch instead of dying on a truncated pickle).  ``block=False``
    (params key ``checkpoint_async``) returns immediately and runs the
    device→host pull + pickle in a background thread, overlapping the
    next epoch's on-device compute; at most one write is in flight (the
    next save joins the previous first, preserving resume's
    latest-complete ordering), and callers MUST :func:`wait` before
    relying on the file — the training loop does before it returns.  The
    bytes written are identical either way."""
    # snapshot the histories NOW — the caller keeps appending to these
    # lists while an async write is in flight
    g_losses = list(g_losses)
    d_losses = list(d_losses)

    def _write():
        st = _fetch_tree_batched(state)  # ONE D2H pull (see docstring)
        ckpt = {
            "format": _NATIVE_TAG,
            "start_time": start_time,
            "epoch": epoch,
            "g_losses": g_losses,
            "d_losses": d_losses,
            "g_state_dict": torch_compat.generator_to_torch_sd(
                st.g_params, as_torch=False
            ),
            "d_state_dict": torch_compat.critic_to_torch_sd(
                st.d_params, as_torch=False
            ),
            "g_optimizer_state_dict": optax_to_torch_adam_sd(
                st.g_opt, st.g_params, "generator", cfg
            ),
            "d_optimizer_state_dict": optax_to_torch_adam_sd(
                st.d_opt, st.d_params, "critic", cfg
            ),
        }
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(ckpt, f)
        os.replace(tmp, path)

    if block:
        wait()  # keep strict write ordering when modes mix
        _write()
        return

    import threading

    global _async_thread
    wait()  # one in-flight write at a time; surfaces the previous error
    state = _device_snapshot(state)  # donation-safe (see _device_snapshot)

    def _bg():
        try:
            _write()
        except BaseException as e:  # re-raised by wait()
            _async_error.append(e)

    _async_thread = threading.Thread(target=_bg, daemon=True)
    _async_thread.start()


def load(path: str) -> dict:
    """Read a checkpoint — native pickle or reference torch.save zip."""
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic[:2] == b"PK":  # torch.save zipfile container
        import torch

        ckpt = torch.load(path, weights_only=False, map_location="cpu")
        # normalize tensors → numpy
        for k in ("g_state_dict", "d_state_dict"):
            if k in ckpt:
                ckpt[k] = {
                    kk: vv.detach().cpu().numpy() if hasattr(vv, "detach") else vv
                    for kk, vv in ckpt[k].items()
                }
        return ckpt
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_state(ckpt: dict, cfg, in_channels: int):
    """Checkpoint dict → TrainState (weights + Adam moments)."""
    from scgrhc.train.wgan import TrainState, make_optimizer

    g_params = torch_compat.generator_from_torch_sd(ckpt["g_state_dict"])
    d_params = torch_compat.critic_from_torch_sd(ckpt["d_state_dict"])
    opt = make_optimizer(cfg)
    g_opt = _restore_opt(
        ckpt.get("g_optimizer_state_dict"), g_params, opt, "generator"
    )
    d_opt = _restore_opt(ckpt.get("d_optimizer_state_dict"), d_params, opt, "critic")
    return TrainState(g_params, d_params, g_opt, d_opt)


def _restore_opt(sd, params, opt, kind):
    if sd and sd.get("state"):
        return optax_from_torch_adam_sd(sd, params, opt, kind)
    return opt.init(params)


def export_torch(ckpt_path: str, out_path: str) -> None:
    """Re-encode a native checkpoint as a genuine torch.save file the
    reference scripts can load (checkpoint save parity)."""
    import torch

    ckpt = load(ckpt_path)
    ckpt.pop("format", None)
    for k in ("g_state_dict", "d_state_dict"):
        ckpt[k] = {kk: torch.from_numpy(np.ascontiguousarray(vv)) for kk, vv in ckpt[k].items()}
    for k in ("g_optimizer_state_dict", "d_optimizer_state_dict"):
        if k in ckpt:
            for pstate in ckpt[k]["state"].values():
                for kk in ("exp_avg", "exp_avg_sq"):
                    pstate[kk] = torch.from_numpy(np.ascontiguousarray(pstate[kk]))
    torch.save(ckpt, out_path)
