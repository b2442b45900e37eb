"""Training stage (reference parity: waveform_train.py:299-418).

Resume-from-latest-checkpoint, per-epoch checkpointing, loss-diff prints
every 10 batches, and the ``train_losses.png`` curve all match the
reference's observable behavior.  The compute path is one jitted XLA
program per batch (n_critic critic updates + generator update, second-order
GP included) instead of the reference's 7 separate forward/backward passes
with host round-trips between them.
"""

from __future__ import annotations

import os
from time import time

import jax
import jax.numpy as jnp
import numpy as np

from scgrhc.core.timelog import timelog
from scgrhc.core.trace import annotate, trace
from scgrhc.data.loaders import load_dataloader
from scgrhc.parallel import comm
from scgrhc.train import checkpoint as ckpt_io
from scgrhc.train import orbax_io
from scgrhc.train.wgan import TrainConfig, init_state, train_step


def _plot_losses(g_losses, d_losses, epoch, total_epochs, batch, n_batches, dir_path):
    """Loss curve png (reference: waveform_train.py:391-399)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    plt.plot(g_losses, label="Generator Loss")
    plt.plot(d_losses, label="Discriminator Loss")
    plt.title(f"Epoch {epoch}/{total_epochs} | Batch {batch}/{n_batches}")
    plt.xlabel("Iteration")
    plt.ylabel("Loss")
    plt.ylim(0, 100)
    plt.legend()
    plt.savefig(os.path.join(dir_path, "train_losses.png"))
    plt.close()


class _AsyncPlotter:
    """Latest-wins background loss plotting (params ``plot_async``).

    A full-history matplotlib redraw costs ~0.5 s on a 1-core host and
    the reference cadence redraws every 10 batches — serialized with the
    training loop, that is pure wall time the device spends idle.  This
    worker draws on a daemon thread so redraws overlap on-device compute,
    and keeps only the NEWEST pending request (a backlogged redraw of an
    older history is useless — the next one repaints the same file with
    more data).  :meth:`flush` drains the queue before ``run()`` returns,
    so the final ``train_losses.png`` is identical to the sync path's."""

    def __init__(self):
        import threading

        self._cv = threading.Condition()
        self._pending = None
        self._busy = False
        self._live = False  # worker committed to draining _pending
        # (checked instead of Thread.is_alive(): a worker that already
        # decided to exit can still report alive, losing the submission)

    def submit(self, *args):
        import threading

        with self._cv:
            self._pending = args
            if not self._live:
                self._live = True
                threading.Thread(target=self._worker, daemon=True).start()
            self._cv.notify_all()

    def _worker(self):
        while True:
            with self._cv:
                if self._pending is None:
                    self._busy = False
                    self._live = False
                    self._cv.notify_all()
                    return
                args = self._pending
                self._pending = None
                self._busy = True
            try:
                _plot_losses(*args)
            except Exception:
                pass  # plotting is best-effort, same as the sync path
            with self._cv:
                self._busy = False
                self._cv.notify_all()

    def flush(self):
        with self._cv:
            while self._pending is not None or self._busy:
                self._cv.wait()


_plotter = _AsyncPlotter()


def run(params, plot: bool = True) -> None:
    start_time = time()
    print(timelog(f"Run waveform_train for {params.dir_path}", start_time))

    cfg = TrainConfig.from_params(params)
    total_epochs = params.total_epochs
    os.makedirs(params.checkpoint_dir_path, exist_ok=True)

    train_loader = load_dataloader(params.train_path, seed=params.seed)

    last = ckpt_io.get_last_checkpoint_path(params.checkpoint_dir_path)
    if last is not None:
        last_path = os.path.join(params.checkpoint_dir_path, last)
        if orbax_io.is_orbax_checkpoint(last_path):
            ckpt, state = orbax_io.load(last_path, cfg, len(params.in_channels))
        else:
            ckpt = ckpt_io.load(last_path)
            state = ckpt_io.restore_state(ckpt, cfg, len(params.in_channels))
        start_time = ckpt["start_time"]
        epoch = ckpt["epoch"] + 1
        g_losses = list(ckpt["g_losses"])
        d_losses = list(ckpt["d_losses"])
        print(timelog(f"Loaded {last}", start_time))
    else:
        epoch = 0
        g_losses = []
        d_losses = []
        state = init_state(
            jax.random.key(params.seed), len(params.in_channels), cfg
        )

    c_pad = _channel_pad_to(params)
    if c_pad:
        # channel_bucket: the in-HBM state is bucket-padded (program
        # shapes stop depending on the channel subset); checkpoints are
        # sliced back to the true count at every save (_train_loop), so
        # artifacts keep the reference layout — and the padded columns
        # provably never move (scgrhc.models.channel_pad).
        from scgrhc.models import channel_pad

        state = channel_pad.pad_state(state, len(params.in_channels), c_pad)

    g_loss_total = sum(g_losses)
    d_loss_total = sum(d_losses)
    # loop key (dropout / GP eps / shuffles): opt-in XLA-native "rbg"
    # generator cuts the per-step threefry mask cost on TPU (BENCH.md);
    # weight init above stays threefry for cross-backend reproducibility
    rng = _loop_key(params.seed, getattr(params, "rng_impl", "threefry"))
    n_batches = len(train_loader)

    with trace("train"):
        _train_loop(
            params, cfg, state, train_loader, rng, epoch, total_epochs,
            g_losses, d_losses, g_loss_total, d_loss_total, start_time,
            n_batches, plot,
        )


def _loop_key(seed: int, impl: str):
    """Training-loop PRNG key.  "threefry" (the documented default) maps to
    jax's own default impl ("threefry2x32" today); "rbg"/"unsafe_rbg" are
    the XLA-native generators (params.rng_impl, BENCH.md)."""
    return jax.random.key(
        (seed << 16) ^ 0x5C6, impl=None if impl == "threefry" else impl
    )


def _pad_idx_mask(idx: np.ndarray, n_dev: int):
    """Pad the (nb, B) gather permutation so B divides the mesh, plus the
    (B',) 0/1 mask that makes the pad rows inert.  Returns (idx, mask_np)
    with mask_np None when no padding is needed."""
    bs = idx.shape[-1]
    if bs % n_dev == 0:
        return idx, None
    pad = n_dev - bs % n_dev
    idx = np.concatenate(
        [idx, np.zeros((*idx.shape[:-1], pad), np.int32)], axis=-1
    )
    return idx, np.concatenate(
        [np.ones(bs, np.float32), np.zeros(pad, np.float32)]
    )


def _channel_pad_to(params):
    """4 when ``channel_bucket`` applies (true SCG count below the
    bucket), else None.  See scgrhc.models.channel_pad."""
    from scgrhc.models.channel_pad import bucket_for

    return bucket_for(params)


def _bucket_cap(n: int) -> int:
    """Next power of two ≥ n — the ``shape_bucket`` size policy.  Every
    dataset size in an octave shares one XLA program (and one remote
    compile) instead of one per exact size."""
    return 1 << max(0, (n - 1).bit_length())


def _dp_gather_place(
    state, store, idx: np.ndarray, pad_to=None, pad_channels_to=None
):
    """Multi-chip DP with zero per-epoch staging: the dense store is
    replicated into every chip's HBM once (cached on the store), the train
    state is replicated, and each scanned batch is gathered on-device with
    its batch dim sharded — so each chip gathers only its local shard and
    GSPMD all-reduces the gradients over ICI.  Batches that don't divide
    the mesh are padded with masked-out rows, so DP engages at any batch
    size.  (The padded shape changes the dropout/GP-eps draw *shapes*, so a
    padded run is a different — equally valid — trajectory than the
    single-chip one; divisible batches remain trajectory-identical.)

    Returns (state, scg_all, rhc_all, idx, mask)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scgrhc.parallel.mesh import make_mesh, place_global, replicate, replicated

    mesh = make_mesh()
    axis = mesh.axis_names[0]
    idx, mask_np = _pad_idx_mask(idx, mesh.devices.size)
    mask = (
        place_global(mask_np, NamedSharding(mesh, P(axis)))
        if mask_np is not None
        else None
    )
    scg_all, rhc_all = store.device_arrays(
        sharding=replicated(mesh), pad_to=pad_to, pad_channels_to=pad_channels_to
    )
    idx = place_global(idx, NamedSharding(mesh, P(None, axis)))
    return replicate(mesh, state), scg_all, rhc_all, idx, mask


def _dp_place_tail(scg_t: np.ndarray, rhc_t: np.ndarray, base_mask=None):
    """Pad + place ONE host-resident batch across the mesh (the tail batch
    of epoch mode; scanned batches go through :func:`_dp_gather_place`).
    Shares the pad+mask invariant with the gather path via
    :func:`_pad_idx_mask`.  ``base_mask`` (len(scg_t),) carries rows
    already masked upstream (``shape_bucket``'s pad-to-full-batch) so the
    two paddings compose.  Returns (scg, rhc, mask, mesh)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scgrhc.parallel.mesh import make_mesh, place_global

    mesh = make_mesh()
    axis = mesh.axis_names[0]
    tail_idx, pad_mask = _pad_idx_mask(
        np.arange(scg_t.shape[0], dtype=np.int32), mesh.devices.size
    )
    mask_np = None
    if base_mask is not None or pad_mask is not None:
        m = (
            base_mask
            if base_mask is not None
            else np.ones(scg_t.shape[0], np.float32)
        )
        m = m[tail_idx]  # mesh-pad rows gather row 0's flag ...
        if pad_mask is not None:
            m = m * pad_mask  # ... then get zeroed here
        mask_np = m
    batch_sh = NamedSharding(mesh, P(axis))
    mask = place_global(mask_np, batch_sh) if mask_np is not None else None
    return (
        place_global(scg_t[tail_idx], batch_sh),
        place_global(rhc_t[tail_idx], batch_sh),
        mask,
        mesh,
    )


def _run_epoch_step_mode(params, cfg, state, train_loader, epoch_rng, epoch):
    """Reference-style loop: one jitted program per batch.  Yields
    (batch_index, d_losses (n_critic,), g_loss) as floats arrive.

    Per-batch keys are ``split(epoch_rng, n_batches)[i]`` — the exact keys
    the epoch-scan mode uses (threefry split is counter-based, so the
    prefix property makes the two modes' dropout masks and GP epsilons
    identical batch for batch, hence identical loss histories and
    checkpoints)."""
    train_loader.set_epoch(epoch)
    keys = jax.random.split(epoch_rng, max(1, len(train_loader)))
    bs = train_loader.batch_size
    bucket = bool(getattr(params, "shape_bucket", False))
    c_pad = _channel_pad_to(params)
    for i, (scg, rhc) in enumerate(train_loader):
        if c_pad:
            from scgrhc.models.channel_pad import pad_batch

            scg = pad_batch(scg, c_pad)
        mask = None
        if bucket and scg.shape[0] < bs:
            # pad the remainder batch to the full batch_size with masked
            # rows, so the step program's shape is dataset-independent
            # (same policy as epoch mode's tail — shape_bucket)
            pad = bs - scg.shape[0]
            scg = np.concatenate(
                [scg, np.zeros((pad, *scg.shape[1:]), scg.dtype)]
            )
            rhc = np.concatenate(
                [rhc, np.zeros((pad, *rhc.shape[1:]), rhc.dtype)]
            )
            mask = jnp.asarray(
                np.concatenate(
                    [np.ones(bs - pad, np.float32), np.zeros(pad, np.float32)]
                )
            )
        with annotate("train_step"):
            state, d_step, g_loss = train_step(
                state, jnp.asarray(scg), jnp.asarray(rhc), keys[i], cfg, mask
            )
        yield state, i, np.asarray(d_step).tolist(), float(g_loss)


def _run_epoch_scan_mode(params, cfg, state, train_loader, epoch_rng, epoch):
    """TPU-native path: all full-size batches of the epoch as one scanned
    XLA program (scgrhc.train.wgan.train_epoch); the remainder batch, if
    any, runs as one extra step.  Per-batch losses come back afterwards,
    so observable outputs (loss histories, prints, plots, checkpoints)
    match step mode's — including the RNG stream: the scan's internal
    ``split(epoch_rng, nb)`` is a prefix of step mode's
    ``split(epoch_rng, n_batches)`` and the tail batch takes the next key,
    so both modes draw identical dropout masks and GP epsilons."""
    from scgrhc.train.wgan import train_epoch_gather

    store = train_loader.dataset
    bs = train_loader.batch_size
    order = train_loader.epoch_order(epoch)
    n = len(order)
    nb = n // bs
    n_batches = nb + (1 if n % bs else 0)
    tail_rng = jax.random.split(epoch_rng, max(1, n_batches))[-1]

    use_dp = jax.device_count() > 1
    # shape_bucket: decouple the compiled programs' shapes from the
    # dataset size — scan rows and store rows pad to power-of-two
    # buckets (cond-skipped / never gathered), the remainder batch pads
    # to a full batch_size with masked rows.  Every chamber in the same
    # size octave then reuses one XLA cache entry per (channels, batch).
    bucket = bool(getattr(params, "shape_bucket", False))
    pad_to = _bucket_cap(len(store)) if bucket else None
    # channel_bucket: the state is already bucket-padded (run());
    # the store's SCG channel axis pads to match
    c_pad = _channel_pad_to(params)

    out = []
    if nb:
        idx = order[: nb * bs].reshape(nb, bs).astype(np.int32)
        mask = None
        row_valid = None
        if bucket:
            cap = _bucket_cap(nb)
            idx = np.concatenate([idx, np.zeros((cap - nb, bs), np.int32)])
            rv = np.zeros(cap, bool)
            rv[:nb] = True
            # passed even when cap == nb so the program shape is uniform
            # across datasets in the octave
            row_valid = jnp.asarray(rv)
        if use_dp:
            state, scg_all, rhc_all, idx, mask = _dp_gather_place(
                state, store, idx, pad_to, c_pad
            )
        else:
            # single chip: the store lives in HBM once; only the epoch's
            # (nb, B) permutation crosses host→device
            scg_all, rhc_all = store.device_arrays(
                pad_to=pad_to, pad_channels_to=c_pad
            )
            idx = jnp.asarray(idx)
        with annotate("train_epoch"):
            state, d_hist, g_hist = train_epoch_gather(
                state, scg_all, rhc_all, idx, epoch_rng, cfg, mask, row_valid
            )
        d_hist = np.asarray(d_hist)
        g_hist = np.asarray(g_hist)
        for i in range(nb):
            out.append((state, i, d_hist[i].tolist(), float(g_hist[i])))
    if n % bs:
        tail = order[nb * bs :]
        scg_t, rhc_t = store.scg[tail], store.rhc[tail]
        if c_pad:
            from scgrhc.models.channel_pad import pad_batch

            scg_t = pad_batch(scg_t, c_pad)
        mask_t = None
        base_mask = None
        if bucket:
            t = len(tail)
            scg_t = np.concatenate(
                [scg_t, np.zeros((bs - t, *scg_t.shape[1:]), scg_t.dtype)]
            )
            rhc_t = np.concatenate(
                [rhc_t, np.zeros((bs - t, *rhc_t.shape[1:]), rhc_t.dtype)]
            )
            base_mask = np.concatenate(
                [np.ones(t, np.float32), np.zeros(bs - t, np.float32)]
            )
            mask_t = jnp.asarray(base_mask)
        if use_dp:
            from scgrhc.parallel.mesh import replicate

            scg_t, rhc_t, mask_t, mesh = _dp_place_tail(
                scg_t, rhc_t, base_mask
            )
            if not nb:  # state not yet replicated by the scan path
                state = replicate(mesh, state)
        with annotate("train_step"):
            state, d_step, g_loss = train_step(
                state, jnp.asarray(scg_t), jnp.asarray(rhc_t), tail_rng, cfg,
                mask_t,
            )
        out.append((state, nb, np.asarray(d_step).tolist(), float(g_loss)))
    return out


def _train_loop(
    params, cfg, state, train_loader, rng, epoch, total_epochs,
    g_losses, d_losses, g_loss_total, d_loss_total, start_time, n_batches,
    plot,
):
    """Epoch loop + unconditional flush of the async artifact writers.

    The flush/wait MUST run even when the loop raises: the plot worker and
    the async checkpoint writer are module-global, so an abandoned
    in-flight write from a failed config would otherwise leak into the
    NEXT config of an in-process sweep (its first ``save()`` would join —
    and re-raise the stale error of — the previous run's writer)."""
    ok = False
    try:
        _train_epochs(
            params, cfg, state, train_loader, rng, epoch, total_epochs,
            g_losses, d_losses, g_loss_total, d_loss_total, start_time,
            n_batches, plot,
        )
        ok = True
    finally:
        try:
            _plotter.flush()  # final train_losses.png identical to sync path
            ckpt_io.wait()
            orbax_io.wait()
        except Exception:
            # success path: a silently-dropped checkpoint must fail the
            # run.  Failure path: the writer state is drained either way;
            # keep the ORIGINAL loop error, not the secondary one.
            if ok:
                raise
        finally:
            # a primary-side flush failure must still release
            # non-primaries parked at the barrier; non-primaries must not
            # outrun the last write
            comm.barrier("train_end")


def _train_epochs(
    params, cfg, state, train_loader, rng, epoch, total_epochs,
    g_losses, d_losses, g_loss_total, d_loss_total, start_time, n_batches,
    plot,
):
    mode = getattr(params, "train_mode", "epoch")
    # Fast-forward the loop stream to the starting epoch: a resumed run
    # must draw the SAME per-epoch keys (shuffle/dropout/GP eps) an
    # uninterrupted run draws from here on — without this, resume
    # replayed epoch-0's keys from the checkpoint epoch onward, silently
    # breaking seed reproducibility across interruptions.  Host-side
    # splits, O(total_epochs), sub-ms.
    for _ in range(epoch):
        rng, _ = jax.random.split(rng)
    c_pad = _channel_pad_to(params)
    while epoch < total_epochs:
        rng, epoch_rng = jax.random.split(rng)
        if mode == "step":
            steps = _run_epoch_step_mode(
                params, cfg, state, train_loader, epoch_rng, epoch
            )
        else:
            steps = _run_epoch_scan_mode(
                params, cfg, state, train_loader, epoch_rng, epoch
            )
        for state, i, d_step, g_loss in steps:
            d_losses.extend(d_step)
            g_losses.append(g_loss)

            if i > 0 and (i % 10 == 0 or i == n_batches - 1):
                g_loss_sum = sum(g_losses)
                d_loss_sum = sum(d_losses)
                print(
                    timelog(
                        f"waveform_train | {params.dir_path} | epoch "
                        f"{epoch}/{total_epochs} | batch {i}/{n_batches}",
                        start_time,
                    )
                )
                print(f"  G Loss Diff: {g_loss_sum - g_loss_total}")
                print(f"  D Loss Diff: {d_loss_sum - d_loss_total}")
                g_loss_total = g_loss_sum
                d_loss_total = d_loss_sum
                if plot and comm.is_primary():
                    if getattr(params, "plot_async", False):
                        # snapshot the histories — the loop keeps
                        # appending while the worker draws
                        _plotter.submit(
                            list(g_losses), list(d_losses), epoch,
                            total_epochs, i, n_batches, params.dir_path,
                        )
                    else:
                        _plot_losses(
                            g_losses, d_losses, epoch, total_epochs, i,
                            n_batches, params.dir_path,
                        )

        ckpt_path = os.path.join(
            params.checkpoint_dir_path, f"{epoch:03d}.checkpoint"
        )
        save_state = state
        if c_pad:
            # checkpoints keep the reference layout at the TRUE channel
            # count — strip the provably-zero bucket columns
            from scgrhc.models import channel_pad

            save_state = channel_pad.slice_state(
                state, len(params.in_channels), c_pad
            )
        if getattr(params, "checkpoint_backend", "reference") == "orbax":
            # async: the write overlaps the next epoch's compute; flushed
            # below before run() returns (eval reads right after).
            # Multi-controller: orbax coordinates its own multi-process
            # commit, so ALL processes call save (meta.json is guarded to
            # the primary inside orbax_io).
            orbax_io.save(
                ckpt_path, start_time=start_time, epoch=epoch,
                g_losses=g_losses, d_losses=d_losses, state=save_state,
                block=False,
            )
        elif comm.is_primary():
            # single-writer discipline: on a multi-controller pod only
            # process 0 writes the pickle (every process holds the same
            # replicated state).  checkpoint_async overlaps the
            # device→host pull + pickle with the next epoch's compute
            # (identical bytes; flushed below before run() returns).
            ckpt_io.save(
                ckpt_path, start_time=start_time, epoch=epoch,
                g_losses=g_losses, d_losses=d_losses, state=save_state,
                cfg=cfg,
                block=not getattr(params, "checkpoint_async", False),
            )
        epoch += 1
