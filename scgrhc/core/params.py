"""Experiment configuration.

Reads the same per-experiment ``params.json`` files the reference uses
(reference: paramutil.py:5-33), so all 37 ``waveform_NN`` configs run
unchanged.  Required keys match the reference exactly; a missing key raises
``KeyError`` just like the reference (which is why the legacy
``waveform_01..05`` schema fails to load there too).

Additions over the reference (all optional, defaulted):
  * ``seed``          — deterministic RNG seed for splits / init / dropout.
                        The reference's train/valid/test split is unseeded
                        (reference: recordutil.py:191-192); ours is seeded so
                        experiments are reproducible.
  * ``dtype``         — compute dtype for the model ("float32" | "bfloat16" |
                        "int8" — int8 is inference-only post-training
                        quantization, models.quant; measured NEGATIVE on this
                        chip's conv path, kept documented — BENCH.md).
  * ``eval_batch``    — batch size for vmapped evaluation (reference
                        evaluates segment-by-segment at batch 1,
                        waveform_test.py:58-67; we batch on the MXU).
"""

from __future__ import annotations

import json
import os
from typing import Any


class Params:
    """Typed view over one experiment's ``params.json``.

    Attribute surface mirrors the reference's ``paramutil.Params``
    (reference: paramutil.py:6-29): every path key is joined onto
    ``dir_path``.
    """

    REQUIRED_KEYS = (
        "in_channels",
        "chamber",
        "segment_size",
        "batch_size",
        "dir_path",
        "train_path",
        "valid_path",
        "test_path",
        "checkpoint_dir_path",
        "comparison_dir_path",
        "pred_top_dir_path",
        "pred_rand_dir_path",
        "alpha",
        "beta1",
        "beta2",
        "n_critic",
        "lambda_gp",
        "lambda_aux",
        "total_epochs",
        "min_RHC",
        "use_global_min_max",
    )

    def __init__(self, path: str):
        self.path = path
        self.data = self.init_json(path)
        d = self.data
        self.in_channels = d["in_channels"]
        self.chamber = d["chamber"]
        self.segment_size = d["segment_size"]
        self.batch_size = d["batch_size"]
        self.dir_path = d["dir_path"]
        self.train_path = os.path.join(self.dir_path, d["train_path"])
        self.valid_path = os.path.join(self.dir_path, d["valid_path"])
        self.test_path = os.path.join(self.dir_path, d["test_path"])
        self.checkpoint_dir_path = os.path.join(self.dir_path, d["checkpoint_dir_path"])
        self.comparison_dir_path = os.path.join(self.dir_path, d["comparison_dir_path"])
        self.pred_top_dir_path = os.path.join(self.dir_path, d["pred_top_dir_path"])
        self.pred_rand_dir_path = os.path.join(self.dir_path, d["pred_rand_dir_path"])
        self.alpha = d["alpha"]
        self.beta1 = d["beta1"]
        self.beta2 = d["beta2"]
        self.n_critic = d["n_critic"]
        self.lambda_gp = d["lambda_gp"]
        self.lambda_aux = d["lambda_aux"]
        self.total_epochs = d["total_epochs"]
        self.min_RHC = d["min_RHC"]
        self.use_global_min_max = d["use_global_min_max"]
        # --- scgrhc extensions (optional, defaulted) ---
        # "train_profile": "reference" (default — every knob at its
        # reference-parity default) | "fast" (the measured-best TPU
        # training bundle, BENCH.md round 3: bfloat16 compute with the
        # f32 output epilogue, XLA-native rbg loop RNG, shared critic
        # prediction, 2-batch critic fusion, dataset-size-independent
        # program shapes, async checkpoint writes).  Explicitly-set keys
        # always win over the
        # profile; "fast" trains a different — equally valid —
        # trajectory than the reference (see the individual keys below).
        profile = d.get("train_profile", "reference")
        if profile not in ("reference", "fast"):
            raise ValueError(
                f"train_profile must be 'reference' or 'fast', got {profile!r}"
            )
        self.train_profile = profile
        d = dict(d)  # profile defaults must not mutate the caller's dict
        if profile == "fast":
            for k, v in (
                ("train_dtype", "bfloat16"),
                ("rng_impl", "rbg"),
                ("reuse_pred", True),
                ("critic_fuse", "2b"),
                ("shape_bucket", True),
                ("channel_bucket", True),
                ("checkpoint_async", True),
                ("plot_async", True),
            ):
                d.setdefault(k, v)
        # "seed": null reproduces the reference's unseeded behavior
        # (recordutil.py:191-192): a fresh random seed is drawn per run, so
        # splits/init/shuffles differ run to run like the reference's —
        # while staying self-consistent within the run.
        seed = d.get("seed", 0)
        self.unseeded = seed is None
        if self.unseeded:
            seed = self._draw_shared_seed()
        self.seed = seed
        self.dtype = d.get("dtype", "float32")
        if self.dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(
                f"dtype must be 'float32', 'bfloat16' or 'int8', got {self.dtype!r}"
            )
        self.eval_batch = d.get("eval_batch", 1024)
        # "reference" = the pickle dict layout of waveform_train.py:401-411;
        # "orbax" = native sharded-pytree checkpoints (scgrhc.train.orbax_io)
        self.checkpoint_backend = d.get("checkpoint_backend", "reference")
        # True overlaps the per-epoch reference-layout checkpoint write
        # (device→host pull + pickle) with the next epoch's on-device
        # compute — identical bytes, written by a background thread with
        # atomic tmp+rename (crash mid-write resumes from the previous
        # epoch, same contract as the orbax backend's async saves)
        self.checkpoint_async = d.get("checkpoint_async", False)
        # True draws the per-10-batch loss png on a background thread
        # (latest-wins queue — ~0.5 s/redraw of host matplotlib time
        # otherwise serialized with the loop); the final png is flushed
        # before the stage returns, so artifacts are unchanged
        self.plot_async = d.get("plot_async", False)
        # "epoch" = lax.scan whole-epoch programs (one dispatch per epoch);
        # "step" = one jitted program per batch (reference-style loop)
        self.train_mode = d.get("train_mode", "epoch")
        # "host" = float64 NumPy noise gate (bit-exact dataset builds);
        # "device" = fused Pallas gate kernel (scgrhc.ops.pallas.dsp)
        self.data_backend = d.get("data_backend", "host")
        # True trains a textbook conditional WGAN (adversarial term scores
        # the prediction) instead of reproducing the reference's
        # zero-gradient quirk (waveform_train.py:376)
        self.fix_g_adversarial = d.get("fix_g_adversarial", False)
        # Training compute dtype ("float32" | "bfloat16"); bf16 keeps f32
        # master weights/optimizer state (scgrhc.train.wgan TrainConfig)
        self.train_dtype = d.get("train_dtype", "float32")
        if self.train_dtype not in ("float32", "bfloat16"):
            # int8 is inference-only (models.quant) — a quantized tree has
            # no gradient path, so reject it here rather than mid-train
            raise ValueError(
                f"train_dtype must be 'float32' or 'bfloat16', got {self.train_dtype!r}"
            )
        # Critic forward batching per critic step ("off" | "2b" | "3b");
        # per-sample math is identical across modes; "off" measured fastest
        # on-chip (scgrhc.train.wgan, BENCH.md)
        self.critic_fuse = d.get("critic_fuse", "off")
        # Rematerialize conv blocks in the backward (recompute-for-bandwidth
        # trade; the step is HBM-bound — scgrhc.train.wgan, BENCH.md)
        self.remat = d.get("remat", False)
        # Generator conv-block backend: "xla" | "pallas" (fused
        # conv+IN+relu kernel — scgrhc.ops.pallas.conv_block, BENCH.md)
        self.conv_backend = d.get("conv_backend", "xla")
        # Critic layer backend: "xla" | "fused" (second-order-capable
        # fused Pallas layers — scgrhc.ops.pallas.critic_fused, BENCH.md)
        self.critic_backend = d.get("critic_backend", "xla")
        # Training-loop PRNG implementation: "threefry" (JAX default,
        # reproducible across backends) | "rbg" (XLA-native generator —
        # much cheaper dropout mask generation on TPU; a different,
        # equally valid trajectory).  Weight init stays threefry.
        self.rng_impl = d.get("rng_impl", "threefry")
        # True computes G(scg) ONCE per step and scores it in every
        # critic iteration, instead of the reference's fresh
        # dropout-resampled generator forward per critic iteration
        # (waveform_train.py:364-368) — saves (n_critic-1) generator
        # forwards per step; a different dropout-stream trajectory.
        self.reuse_pred = d.get("reuse_pred", False)
        # How many checkpoints to score per vmapped eval program in
        # 'test all' (weights stacked on a leading axis; 1 = serial)
        self.eval_stack = d.get("eval_stack", 8)
        # True pads the epoch scan's batch-row count and the HBM store's
        # segment count up to power-of-two buckets (and the remainder
        # batch up to a full batch_size with masked rows), so the train
        # programs' shapes depend only on (channels, batch_size) — not on
        # the dataset's size.  Sweeps then share XLA cache entries across
        # chambers instead of recompiling per config (BENCH.md).  The
        # scanned batches' trajectory is identical (prefix-stable keys +
        # cond-skipped pad rows); the tail batch draws full-batch-shaped
        # dropout/eps, a different — equally valid — trajectory (same
        # caveat as multi-chip divisibility padding).  Eval keeps its
        # static chunk at eval_batch even for smaller splits (programs
        # independent of dataset size; within cross-batch-shape float
        # jitter of the clamped chunk, same scope as eval_stack).
        self.shape_bucket = d.get("shape_bucket", False)
        # True zero-pads the SCG channel axis (data + first conv layers)
        # to the sweep's maximum (4), so train/eval program shapes stop
        # depending on the per-config channel subset — EXACTLY
        # trajectory-identical (zero weights x zero inputs; checkpoints
        # stay reference-layout at the true count).  See
        # scgrhc.models.channel_pad.
        self.channel_bucket = d.get("channel_bucket", False)
        # "native" = scgrhc dict loader files; "torch" = genuine pickled
        # torch DataLoader objects, byte-compatible with the reference's
        # artifacts (recordutil.py:202-209) — both remain readable by
        # scgrhc (scgrhc.data.loaders reads either format)
        self.loader_backend = d.get("loader_backend", "native")

    @staticmethod
    def _draw_shared_seed() -> int:
        """One random seed, agreed across all controllers.

        Multi-controller pods must adopt process 0's draw or every
        process's inits/shuffles silently diverge under replicated
        shardings.  The broadcast only works if ``jax.distributed`` is
        initialized BEFORE ``Params`` is constructed; a multi-process
        launch detected from the environment while ``process_count()`` is
        still 1 therefore fails loudly instead of silently diverging, and
        a broadcast failure on an initialized pod propagates (it must not
        be swallowed into per-process seeds)."""
        import random as _random

        seed = _random.SystemRandom().randrange(2**31)
        try:
            import jax

            pc = jax.process_count()
        except Exception:
            return seed  # jax absent: plain single-process use
        if pc > 1:
            import numpy as _np
            from jax.experimental import multihost_utils

            return int(multihost_utils.broadcast_one_to_all(_np.int64(seed)))
        n_env = os.environ.get("JAX_NUM_PROCESSES")
        coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if (n_env and n_env.isdigit() and int(n_env) > 1) or (
            coord and n_env is None
        ):
            raise RuntimeError(
                '"seed": null on a multi-controller launch '
                f"(JAX_COORDINATOR_ADDRESS={coord!r}, JAX_NUM_PROCESSES="
                f"{n_env!r}) requires jax.distributed.initialize() before "
                "Params(...): process_count() is still 1, so each process "
                "would draw a different seed and replicated state would "
                "silently diverge."
            )
        return seed

    @staticmethod
    def init_json(path: str) -> dict[str, Any]:
        with open(path, "r") as f:
            return json.load(f)

    @property
    def segment_samples(self) -> int:
        """Segment length in samples (segment_size seconds x 500 Hz)."""
        from scgrhc.io.catalog import SAMPLE_FREQ

        return int(self.segment_size * SAMPLE_FREQ)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Params({self.path!r})"
