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

    g_loss_total = sum(g_losses)
    d_loss_total = sum(d_losses)
    rng = jax.random.key((params.seed << 16) ^ 0x5C6)
    n_batches = len(train_loader)

    with trace("train"):
        _train_loop(
            params, cfg, state, train_loader, rng, epoch, total_epochs,
            g_losses, d_losses, g_loss_total, d_loss_total, start_time,
            n_batches, plot,
        )


def _auto_dp_place(state, scg_b, rhc_b, bs: int):
    """Data-parallel placement for multi-chip hosts: replicate the train
    state and shard each step's batch dim across all local devices (GSPMD
    inserts the gradient all-reduce over ICI).  Returns None on one chip
    or when the batch doesn't divide the mesh."""
    n = jax.device_count()
    if n <= 1 or bs % n != 0:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scgrhc.parallel.mesh import make_mesh, replicate

    mesh = make_mesh()
    batch_sh = NamedSharding(mesh, P(None, mesh.axis_names[0]))
    return (
        replicate(mesh, state),
        jax.device_put(scg_b, batch_sh),
        jax.device_put(rhc_b, batch_sh),
    )


def _run_epoch_step_mode(params, cfg, state, train_loader, rng, epoch):
    """Reference-style loop: one jitted program per batch.  Yields
    (batch_index, d_losses (n_critic,), g_loss) as floats arrive."""
    train_loader.set_epoch(epoch)
    for i, (scg, rhc) in enumerate(train_loader):
        rng, step_rng = jax.random.split(rng)
        with annotate("train_step"):
            state, d_step, g_loss = train_step(
                state, jnp.asarray(scg), jnp.asarray(rhc), step_rng, cfg
            )
        yield state, i, np.asarray(d_step).tolist(), float(g_loss)


def _run_epoch_scan_mode(params, cfg, state, train_loader, rng, epoch):
    """TPU-native path: all full-size batches of the epoch as one scanned
    XLA program (scgrhc.train.wgan.train_epoch); the remainder batch, if
    any, runs as one extra step.  Per-batch losses come back afterwards,
    so observable outputs (loss histories, prints, plots, checkpoints)
    match step mode's."""
    from scgrhc.train.wgan import train_epoch, train_epoch_gather

    store = train_loader.dataset
    bs = train_loader.batch_size
    order = train_loader.epoch_order(epoch)
    n = len(order)
    nb = n // bs
    rng, epoch_rng, tail_rng = jax.random.split(rng, 3)

    out = []
    if nb:
        placed = None
        if jax.device_count() > 1 and bs % jax.device_count() == 0:
            # multi-chip: stage this epoch's batches with the batch dim
            # sharded (the gather path would need a sharded-gather layout)
            idx = order[: nb * bs]
            scg_b = jnp.asarray(store.scg[idx].reshape(nb, bs, *store.scg.shape[1:]))
            rhc_b = jnp.asarray(store.rhc[idx].reshape(nb, bs, *store.rhc.shape[1:]))
            placed = _auto_dp_place(state, scg_b, rhc_b, bs)
        if placed is not None:
            state, scg_b, rhc_b = placed
            with annotate("train_epoch"):
                state, d_hist, g_hist = train_epoch(
                    state, scg_b, rhc_b, epoch_rng, cfg
                )
        else:
            # single chip: the store lives in HBM once; only the epoch's
            # (nb, B) permutation crosses host→device
            scg_all, rhc_all = store.device_arrays()
            idx = jnp.asarray(
                order[: nb * bs].reshape(nb, bs).astype("int32")
            )
            with annotate("train_epoch"):
                state, d_hist, g_hist = train_epoch_gather(
                    state, scg_all, rhc_all, idx, epoch_rng, cfg
                )
        d_hist = np.asarray(d_hist)
        g_hist = np.asarray(g_hist)
        for i in range(nb):
            out.append((state, i, d_hist[i].tolist(), float(g_hist[i])))
    if n % bs:
        tail = order[nb * bs :]
        with annotate("train_step"):
            state, d_step, g_loss = train_step(
                state,
                jnp.asarray(store.scg[tail]),
                jnp.asarray(store.rhc[tail]),
                tail_rng,
                cfg,
            )
        out.append((state, nb, np.asarray(d_step).tolist(), float(g_loss)))
    return out


def _train_loop(
    params, cfg, state, train_loader, rng, epoch, total_epochs,
    g_losses, d_losses, g_loss_total, d_loss_total, start_time, n_batches,
    plot,
):
    mode = getattr(params, "train_mode", "epoch")
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
                if plot:
                    _plot_losses(
                        g_losses, d_losses, epoch, total_epochs, i, n_batches,
                        params.dir_path,
                    )

        ckpt_path = os.path.join(
            params.checkpoint_dir_path, f"{epoch:03d}.checkpoint"
        )
        if getattr(params, "checkpoint_backend", "reference") == "orbax":
            # async: the write overlaps the next epoch's compute; flushed
            # below before run() returns (eval reads right after)
            orbax_io.save(
                ckpt_path, start_time=start_time, epoch=epoch,
                g_losses=g_losses, d_losses=d_losses, state=state, block=False,
            )
        else:
            ckpt_io.save(
                ckpt_path, start_time=start_time, epoch=epoch,
                g_losses=g_losses, d_losses=d_losses, state=state,
            )
        epoch += 1

    orbax_io.wait()
