"""scgrhc — a TPU-native (JAX/XLA/Pallas/pjit) framework for SCG→RHC waveform
synthesis, built from scratch with the capabilities of the reference
``jwang6174/scg-rhc-waveform`` pipeline (see /root/repo/SURVEY.md).

Subpackages
-----------
core      config (params.json), paths, timestamped logging
io        WFDB record reader/writer (pure NumPy + optional C++ decoder),
          sidecar JSON chamber-interval parsing, record catalog
ops       functional TPU ops (conv1d, instance norm, pooling, dropout)
          + Pallas kernels for the hot DSP paths
dsp       noise/artifact gate, sliding-window segmentation
data      segment store (padded device arrays + metadata), seeded splits,
          batching loaders, reference-pickle read shim
models    attention U-Net generator + PatchGAN critic as pure-fn pytrees
train     WGAN-GP training step (jit, second-order gradient penalty),
          optax Adam, checkpointing with reference-layout shim
eval      vmapped batched inference + on-device Pearson/RMSE with CIs
select    checkpoint scoring / best-checkpoint selection
parallel  device mesh, data-parallel training, time-sharded (context
          parallel) full-record streaming inference, experiment sweeps
pipeline  end-to-end stage orchestrator (CLI-compatible with the reference)
utils     synthetic WFDB record generation, plotting
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache, shared across stage processes.

    The pipeline runs data/train/eval/select as separate processes (CLI and
    sweep fan-out); without a persistent cache every process re-JITs the
    same programs (minutes per stage).  Opt out or redirect with
    ``SCGRHC_COMPILE_CACHE`` (set to ``0``/``off`` to disable).
    """
    import os

    loc = os.environ.get("SCGRHC_COMPILE_CACHE", "")
    if loc.lower() in ("0", "off", "false", "none"):
        return
    if not loc:
        # scope by requested platform: executables AOT-compiled through the
        # remote TPU tunnel carry CPU-feature flags that can SIGILL if a
        # local-CPU process (e.g. the test suite) loads them
        platform = os.environ.get("JAX_PLATFORMS", "default").replace(",", "_")
        loc = os.path.join(
            os.path.expanduser("~"), ".cache", "scgrhc", f"xla_cache_{platform}"
        )
    try:
        import jax

        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization only


_enable_compilation_cache()

from scgrhc.core import debug as _debug  # noqa: E402  (SCGRHC_DEBUG modes)
