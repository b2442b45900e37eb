"""Evaluation stage (reference parity: waveform_test.py:96-162).

Same observable contract as the reference: resolves the checkpoint list
('all' → sorted dir truncated to total_epochs / 'last' / explicit), skips
checkpoints that already have a comparison CSV, and writes per-segment
rows (full denormalized real/pred waveforms as stringified lists, PCC +
Fisher-z CI, RMSE + t-CI) sorted by pcc_r descending to
``comparisons/<split>/<ckpt>.csv``.

The compute path is redesigned: instead of a per-segment batch-1 CPU loop
(waveform_test.py:58-67), the whole split is scored by batched jitted
inference on device (see scgrhc.eval.infer).
"""

from __future__ import annotations

import os
import threading
from time import time

import jax
import numpy as np

from scgrhc.core.timelog import timelog
from scgrhc.core.trace import trace
from scgrhc.data.loaders import load_dataloader
from scgrhc.eval.infer import predict_split
from scgrhc.models import torch_compat
from scgrhc.train import checkpoint as ckpt_io
from scgrhc.train import orbax_io


CSV_COLUMNS = [
    "filename", "start_idx", "stop_idx", "real_rhc", "pred_rhc",
    "pcc_r", "pcc_ci95_lower", "pcc_ci95_upper",
    "rmse", "rmse_ci95_lower", "rmse_ci95_upper",
]


def _is_oom(e: BaseException) -> bool:
    """XLA out-of-memory detection across jaxlib spellings (compile-time
    allocation failures and runtime RESOURCE_EXHAUSTED both match).

    Deliberately narrow (ADVICE r4): a bare 'out of memory' substring on
    an arbitrary exception (a host MemoryError wrapped by a loader, a
    subprocess error string) must surface, not silently halve
    ``eval_stack`` — so the message must carry an XLA signature
    (RESOURCE_EXHAUSTED / explicit HBM mention) or the exception must be
    an XLA runtime error type."""
    msg = str(e)
    if "RESOURCE_EXHAUSTED" in msg:
        return True
    xla_type = "XlaRuntimeError" in type(e).__name__ or any(
        "XlaRuntimeError" in t.__name__ for t in type(e).__mro__
    )
    oom_text = (
        "Ran out of memory" in msg
        or "Out of memory" in msg
        or "out of memory" in msg
    )
    return oom_text and (xla_type or "hbm" in msg.lower())


def _auto_sharding():
    """Shard eval chunks over all local chips (multi-chip hosts get
    data-parallel eval with zero configuration).  Non-divisible
    ``eval_batch`` values are fine: predict_split rounds the static chunk
    up to the mesh size and pads-to-static, so any batch shards cleanly
    (eval/infer.py)."""
    if jax.device_count() > 1:
        from scgrhc.parallel.mesh import batch_sharding, make_mesh

        return batch_sharding(make_mesh())
    return None


def get_processed_checkpoints(comp_dir_path: str) -> frozenset:
    """Checkpoints already scored in this directory
    (reference: waveform_test.py:89-93)."""
    return frozenset(
        f"{filename.split('.')[0]}.checkpoint"
        for filename in os.listdir(comp_dir_path)
    )


def _comparison_rows(store, real, pred, scores):
    """(real, pred, scores) arrays → per-segment comparison rows
    (reference row schema: waveform_test.py:72-85)."""
    comparisons = []
    for i in range(len(store)):
        comparisons.append(
            {
                "filename": store.record_names[i],
                "start_idx": int(store.start_idx[i]),
                "stop_idx": int(store.stop_idx[i]),
                "real_rhc": str(real[i].tolist()),
                "pred_rhc": str(pred[i].tolist()),
                "pcc_r": float(scores["pcc_r"][i]),
                "pcc_ci95_lower": float(scores["pcc_ci95_lower"][i]),
                "pcc_ci95_upper": float(scores["pcc_ci95_upper"][i]),
                "rmse": float(scores["rmse"][i]),
                "rmse_ci95_lower": float(scores["rmse_ci95_lower"][i]),
                "rmse_ci95_upper": float(scores["rmse_ci95_upper"][i]),
            }
        )
    return comparisons


def get_waveform_comparisons(
    g_params, loader, batch: int = 256, sharding=None, dtype: str = "float32",
    pad_channels_to=None, bucket_batch=False,
):
    """Per-segment comparison rows (reference: waveform_test.py:53-85),
    computed by one batched device program per chunk."""
    store = loader.dataset
    real, pred, scores = predict_split(
        g_params, store, batch=batch, sharding=sharding, dtype=dtype,
        pad_channels_to=pad_channels_to, bucket_batch=bucket_batch,
    )
    return _comparison_rows(store, real, pred, scores)


# pandas string-DataFrame construction is hazardous off the main thread
# in this environment: libarrow initializes lazy globals on the first
# ArrowStringArray ever built, and when that FIRST construction happens
# on a writer-pool thread (or two threads race into it) libarrow
# null-derefs (observed: kernel `segfault ... in libarrow.so.2500`,
# fatal dumps with threads inside string_arrow._from_sequence).  Two
# defenses: `_warm_pandas()` performs one throwaway construction on the
# MAIN thread before any pool write, and the lock serializes
# writer-vs-writer (CSV serialization is cheap relative to device
# compute, so neither costs wall time).
_pandas_write_lock = threading.Lock()
_pandas_warmed = False


def _warm_pandas() -> None:
    global _pandas_warmed
    if _pandas_warmed:
        return
    import pandas as pd

    pd.DataFrame(
        [{c: "0" for c in CSV_COLUMNS}], columns=CSV_COLUMNS
    ).to_csv(os.devnull, index=False)
    _pandas_warmed = True


def _write_comparison_csv(comparisons, comp_dir_path, ckpt_name):
    import pandas as pd

    from scgrhc.parallel import comm

    if not comm.is_primary():
        return  # multi-controller: all processes compute, one writes
    comparisons.sort(key=lambda c: c["pcc_r"], reverse=True)
    checkpoint_str = ckpt_name.split(".")[0]
    comparison_path = os.path.join(comp_dir_path, f"{checkpoint_str}.csv")
    with _pandas_write_lock:
        # explicit columns: an empty split still writes a parseable header
        pd.DataFrame(comparisons, columns=CSV_COLUMNS).to_csv(
            comparison_path, index=False
        )


def run(params, loader_type: str, checkpoint_path: str) -> None:
    start_time = time()
    checkpoint_message = f"{checkpoint_path if checkpoint_path else 'last checkpoint'}"
    print(
        timelog(
            f"Run waveform_test for {params.dir_path} | {loader_type} | "
            f"{checkpoint_message}",
            start_time,
        )
    )

    if loader_type == "train":
        loader_path = params.train_path
    elif loader_type == "valid":
        loader_path = params.valid_path
    elif loader_type == "test":
        loader_path = params.test_path
    else:
        raise Exception("Invalid loader type")

    loader = load_dataloader(loader_path)

    if checkpoint_path == "all":
        # complete checkpoints only, one per epoch (reference enumerates raw
        # listdir, waveform_test.py:119-124; ours additionally skips orbax
        # tmp/half-committed dirs and export side-artifacts)
        checkpoint_paths = ckpt_io.list_checkpoints(params.checkpoint_dir_path)[
            : params.total_epochs
        ]
    elif checkpoint_path == "last":
        checkpoint_paths = [
            ckpt_io.get_last_checkpoint_path(params.checkpoint_dir_path)
        ]
    else:
        # an explicit name (e.g. parsed from checkpoint_best.txt, which
        # always says 'NNN.checkpoint') may live on disk as an orbax dir
        explicit = checkpoint_path
        if not os.path.exists(
            os.path.join(params.checkpoint_dir_path, explicit)
        ) and orbax_io.is_orbax_checkpoint(
            os.path.join(params.checkpoint_dir_path, explicit + orbax_io.ORBAX_SUFFIX)
        ):
            explicit += orbax_io.ORBAX_SUFFIX
        checkpoint_paths = [explicit]

    comp_dir_path = os.path.join(params.comparison_dir_path, loader_type)
    os.makedirs(comp_dir_path, exist_ok=True)
    processed_checkpoints = get_processed_checkpoints(comp_dir_path)

    # Pipeline checkpoint IO with device compute: while checkpoint i is
    # being scored on device, a background thread reads checkpoint i+1
    # from disk (the reference reloads serially per checkpoint,
    # waveform_test.py:142-145; with 250 per-epoch checkpoints the loads
    # are a significant serial tax).
    from concurrent.futures import ThreadPoolExecutor

    def is_processed(name: str) -> bool:
        return f"{name.split('.')[0]}.checkpoint" in processed_checkpoints

    todo = [name for name in checkpoint_paths if not is_processed(name)]

    def load_g_params(ckpt_name):
        full_path = os.path.join(params.checkpoint_dir_path, ckpt_name)
        if orbax_io.is_orbax_checkpoint(full_path):
            from scgrhc.train.wgan import TrainConfig

            _, state = orbax_io.load(
                full_path, TrainConfig.from_params(params), len(params.in_channels)
            )
            return jax.tree.map(np.asarray, state.g_params)
        ckpt = ckpt_io.load(full_path)
        return jax.tree.map(
            np.asarray, torch_compat.generator_from_torch_sd(ckpt["g_state_dict"])
        )

    def print_line(i: int) -> None:
        # log-line parity: the reference prints i/len over ALL checkpoints,
        # including already-processed ones (waveform_test.py:138-140)
        print(
            timelog(
                f"waveform_test | {params.dir_path} | {loader_type} | "
                f"{checkpoint_message} | {i}/{len(checkpoint_paths)}",
                start_time,
            )
        )

    stack = max(1, int(getattr(params, "eval_stack", 8)))
    sharding = _auto_sharding()
    # channel_bucket: eval programs stop depending on the SCG channel
    # subset (exact — zero weight columns meet zero input channels)
    from scgrhc.models.channel_pad import bucket_for

    c_pad = bucket_for(params)
    # shape_bucket: keep the eval chunk at eval_batch even for small
    # splits, so programs stop depending on the dataset size
    b_bucket = bool(getattr(params, "shape_bucket", False))
    try:
        # Stacked path, with OOM auto-degrade (VERDICT r3 #4): a K-stacked
        # program that doesn't fit HBM (measured: K=16 needs 16.76 GB vs
        # 15.75 GB at eval_batch 256) halves the stack and retries instead
        # of aborting the stage — the eval contract is that every
        # checkpoint gets scored (waveform_test.py:119-154).  Already-
        # written CSVs survive the retry via the processed-checkpoint
        # skip, so only unscored checkpoints are recomputed; the i/len
        # progress lines for the crashed group may print twice.
        while len(todo) > 1 and stack > 1:
            try:
                _run_stacked(
                    params, loader, checkpoint_paths, todo, comp_dir_path,
                    load_g_params, print_line, stack, sharding, loader_type,
                    c_pad, b_bucket,
                )
                return
            except Exception as e:
                if not _is_oom(e):
                    raise
                stack = max(1, stack // 2)
                print(
                    timelog(
                        f"waveform_test | eval_stack program out of memory; "
                        f"retrying with eval_stack={stack}",
                        start_time,
                    )
                )
                processed_checkpoints = get_processed_checkpoints(comp_dir_path)
                todo = [n for n in checkpoint_paths if not is_processed(n)]

        pool = ThreadPoolExecutor(max_workers=1)
        pending = pool.submit(load_g_params, todo[0]) if todo else None
        next_todo = 1

        try:
            for i, ckpt_name in enumerate(checkpoint_paths):
                print_line(i)
                if is_processed(ckpt_name):
                    continue
                g_params = pending.result()
                pending = (
                    pool.submit(load_g_params, todo[next_todo])
                    if next_todo < len(todo)
                    else None
                )
                next_todo += 1

                with trace(f"eval_{loader_type}"):
                    comparisons = get_waveform_comparisons(
                        g_params, loader, batch=params.eval_batch,
                        dtype=params.dtype, sharding=sharding,
                        pad_channels_to=c_pad, bucket_batch=b_bucket,
                    )
                _write_comparison_csv(comparisons, comp_dir_path, ckpt_name)
        finally:
            if pending is not None:
                pending.cancel()
            pool.shutdown(wait=False, cancel_futures=True)
    finally:
        # select reads comparisons/*.csv next; non-primaries must not
        # outrun the primary's (thread-pooled) CSV writes.  In the
        # finally so a primary-side exception still releases the others.
        from scgrhc.parallel import comm

        comm.barrier("test_end")


def _run_stacked(
    params, loader, checkpoint_paths, todo, comp_dir_path,
    load_g_params, print_line, stack, sharding, loader_type,
    pad_channels_to=None, bucket_batch=False,
):
    """'test all' with checkpoint stacking: groups of ``stack`` checkpoints
    are scored by ONE vmapped program per segment chunk (weights carry a
    leading (K,) axis), the next group's checkpoint files load on a
    background thread while the current group computes on device, and row
    building + CSV serialization run on writer threads off the device
    critical path.  The reference reloads the model and loops segments
    serially per checkpoint (waveform_test.py:119-154)."""
    from concurrent.futures import ThreadPoolExecutor

    from scgrhc.eval.infer import predict_split_multi

    store = loader.dataset
    groups = [todo[i : i + stack] for i in range(0, len(todo), stack)]
    _warm_pandas()  # libarrow lazy init MUST happen on the main thread
    load_pool = ThreadPoolExecutor(max_workers=1)
    write_pool = ThreadPoolExecutor(max_workers=2)

    def load_group(names):
        return [load_g_params(n) for n in names]

    pending = load_pool.submit(load_group, groups[0])
    cursor = 0  # print-line cursor over checkpoint_paths (order parity)
    writes = []
    try:
        for gi, names in enumerate(groups):
            loaded = pending.result()
            pending = (
                load_pool.submit(load_group, groups[gi + 1])
                if gi + 1 < len(groups)
                else None
            )
            with trace(f"eval_{loader_type}"):
                results = predict_split_multi(
                    loaded, store, batch=params.eval_batch, stack=stack,
                    sharding=sharding, dtype=params.dtype,
                    pad_channels_to=pad_channels_to, bucket_batch=bucket_batch,
                )
            for name, (real, pred, scores) in zip(names, results):
                while (
                    cursor < len(checkpoint_paths)
                    and checkpoint_paths[cursor] != name
                ):
                    print_line(cursor)
                    cursor += 1
                if cursor < len(checkpoint_paths):
                    print_line(cursor)
                    cursor += 1
                writes.append(
                    write_pool.submit(
                        _build_and_write, store, real, pred, scores,
                        comp_dir_path, name,
                    )
                )
        while cursor < len(checkpoint_paths):
            print_line(cursor)
            cursor += 1
        for w in writes:
            w.result()  # surface writer exceptions
    finally:
        if pending is not None:
            pending.cancel()
        load_pool.shutdown(wait=False, cancel_futures=True)
        write_pool.shutdown(wait=True)


def _build_and_write(store, real, pred, scores, comp_dir_path, name):
    _write_comparison_csv(
        _comparison_rows(store, real, pred, scores), comp_dir_path, name
    )
