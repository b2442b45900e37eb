"""Orbax checkpoint backend.

The default backend writes the reference's pickle dict layout
(scgrhc.train.checkpoint, reference: waveform_train.py:401-411) for
drop-in artifact parity.  This module is the TPU-native alternative:
Orbax persists the *live* TrainState pytree (sharded-array aware,
async-capable, atomic renames) in a ``NNN.checkpoint.orbax`` directory
next to where the reference file would sit, and converts to/from the
reference dict layout on demand, so the two backends interoperate —
``scgrhc.train.checkpoint.load`` reads either.

Select with ``"checkpoint_backend": "orbax"`` in params.json.
"""

from __future__ import annotations

import os

import jax

ORBAX_SUFFIX = ".orbax"


_shared_ckptr = None
_meta_threads: list = []


def _checkpointer():
    """One StandardCheckpointer per process (its background thread pool
    enables async saves that overlap the next epoch's compute)."""
    global _shared_ckptr
    if _shared_ckptr is None:
        import orbax.checkpoint as ocp

        _shared_ckptr = ocp.StandardCheckpointer()
    return _shared_ckptr


def wait() -> None:
    """Block until any in-flight async save (arrays + meta) is durable."""
    if _shared_ckptr is not None:
        _shared_ckptr.wait_until_finished()
    while _meta_threads:
        _meta_threads.pop().join()


def save(path: str, *, start_time, epoch, g_losses, d_losses, state,
         block: bool = True) -> None:
    """Write an Orbax checkpoint directory at ``path + '.orbax'``.

    The array pytree goes through Orbax; the variable-length scalars
    (epoch, loss histories) go to a ``meta.json`` inside the directory —
    Orbax's abstract-tree restore needs static shapes, which loss
    histories don't have.

    ``block=False`` returns once the arrays are snapshotted and lets the
    write proceed in the background (Orbax commits atomically); callers
    MUST :func:`wait` before relying on the file (the training loop does
    at the end of its run).
    """
    import json

    tree = {
        "g_params": state.g_params,
        "d_params": state.d_params,
        "g_opt": state.g_opt,
        "d_opt": state.d_opt,
    }
    out = os.path.abspath(path) + ORBAX_SUFFIX
    ckptr = _checkpointer()
    ckptr.save(out, tree, force=True)
    if block:
        ckptr.wait_until_finished()
    # meta.json is tiny and written synchronously; readers treat the
    # checkpoint as complete only once Orbax's atomic rename lands, which
    # wait()/the next save() ensures before anything consumes it.
    def _write_meta():
        with open(os.path.join(out, "meta.json"), "w") as f:
            json.dump(
                {
                    "start_time": float(start_time),
                    "epoch": int(epoch),
                    "g_losses": [float(x) for x in g_losses],
                    "d_losses": [float(x) for x in d_losses],
                },
                f,
            )

    if jax.process_index() != 0:
        return  # multi-controller: orbax coordinated the commit; only the
        # primary writes meta.json (single-writer discipline)
    if block:
        _write_meta()
    else:
        import threading

        def _bg():
            ckptr.wait_until_finished()
            _write_meta()

        th = threading.Thread(target=_bg, daemon=True)
        th.start()
        _meta_threads.append(th)


def load(path: str, cfg, in_channels: int):
    """Read an Orbax checkpoint directory → (ckpt_dict, TrainState).

    The returned dict carries the reference layout's scalar keys
    (start_time/epoch/g_losses/d_losses) so stage code is backend-blind.
    """
    import json

    from scgrhc.train.wgan import TrainState, init_state

    target = init_state(jax.random.key(0), in_channels, cfg)
    abstract = {
        "g_params": target.g_params,
        "d_params": target.d_params,
        "g_opt": target.g_opt,
        "d_opt": target.d_opt,
    }
    ckptr = _checkpointer()
    p = os.path.abspath(path)
    if not p.endswith(ORBAX_SUFFIX):
        p += ORBAX_SUFFIX
    tree = ckptr.restore(p, abstract)
    with open(os.path.join(p, "meta.json")) as f:
        ckpt = json.load(f)
    state = TrainState(
        tree["g_params"], tree["d_params"], tree["g_opt"], tree["d_opt"]
    )
    return ckpt, state


def is_orbax_checkpoint(path: str) -> bool:
    return os.path.isdir(path) and path.endswith(ORBAX_SUFFIX)


def to_reference(path: str, out_path: str, cfg, in_channels: int) -> None:
    """Orbax directory → reference-layout pickle (artifact parity shim)."""
    from scgrhc.train import checkpoint as ckpt_io

    ckpt, state = load(path, cfg, in_channels)
    ckpt_io.save(
        out_path,
        start_time=ckpt["start_time"],
        epoch=ckpt["epoch"],
        g_losses=ckpt["g_losses"],
        d_losses=ckpt["d_losses"],
        state=state,
        cfg=cfg,
    )
