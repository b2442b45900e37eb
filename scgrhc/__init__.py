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


def _host_fingerprint() -> str:
    """Short hash of this host's CPU identity (arch + feature flags).

    CPU executables AOT-cached by XLA carry CPU-feature flags; loading an
    artifact compiled on a different machine can SIGILL
    (``cpu_aot_loader`` feature-mismatch).  Scoping the cache dir by host
    fingerprint makes cross-machine pollution structurally impossible.
    """
    import hashlib
    import platform

    basis = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    basis += ":" + line.split(":", 1)[1].strip()
                    break
    except OSError:
        basis += ":" + platform.processor()
    return hashlib.sha256(basis.encode()).hexdigest()[:8]


def _build_fingerprint() -> str:
    """Short hash of the XLA build provenance in THIS process.

    Same-host, same-platform processes can still emit incompatible CPU
    AOT artifacts when a PJRT plugin ships its own XLA build: on this
    machine, a plain ``JAX_PLATFORMS=cpu`` process compiles CPU code with
    LLVM tuning features (``prefer-no-scatter/gather``) that the
    axon-plugin-loaded process's loader rejects.  Keying by jax/jaxlib
    versions plus the platform-selection provenance (env var AND config
    value) keeps those populations in separate dirs; over-segmentation
    only costs cache sharing, never correctness."""
    import hashlib
    import os

    import jax
    import jaxlib

    basis = ":".join(
        (
            jax.__version__,
            getattr(jaxlib, "__version__", "?"),
            os.environ.get("JAX_PLATFORMS", ""),
            str(getattr(jax.config, "jax_platforms", "") or ""),
        )
    )
    return hashlib.sha256(basis.encode()).hexdigest()[:8]


def _cache_dir_for(platform_name: str) -> str:
    import os

    return os.path.join(
        os.path.expanduser("~"),
        ".cache",
        "scgrhc",
        f"xla_cache_{platform_name}_{_host_fingerprint()}_{_build_fingerprint()}",
    )


def configure_compilation_cache():
    """Persistent XLA compilation cache, shared across stage processes.

    The pipeline runs data/train/eval/select as separate processes (CLI and
    sweep fan-out); without a persistent cache every process re-JITs the
    same programs (minutes per stage).  The cache dir is keyed by the
    RESOLVED jax backend (``jax.default_backend()``, not the
    ``JAX_PLATFORMS`` env var — callers may force a platform via
    ``jax.config`` after import) plus a host CPU fingerprint, so a
    CPU-mesh run never loads AOT artifacts compiled for another machine's
    CPU.  Called from every entry point (CLI dispatch, bench, driver
    entries, test conftest) AFTER any platform forcing; resolving the
    backend here initializes it, which those callers do next anyway.

    Opt out or redirect with ``SCGRHC_COMPILE_CACHE`` (``0``/``off``
    disables).  Returns the cache dir in use, or None when disabled/failed.
    """
    import os

    loc = os.environ.get("SCGRHC_COMPILE_CACHE", "")
    if loc.lower() in ("0", "off", "false", "none"):
        return None
    try:
        import jax

        resolved = jax.default_backend()
        if not loc and resolved == "cpu" and _pjrt_plugin_present():
            # A TPU PJRT plugin is installed and the process resolves to
            # the CPU backend (the driver dryrun and the test suite): the
            # process then holds TWO XLA builds, and measured on this
            # machine it cannot reload even its OWN CPU AOT artifacts —
            # the wheel's LLVM emits prefer-no-scatter/gather tuning
            # features the plugin build's loader rejects
            # (cpu_aot_loader "could lead to SIGILL" spew, and every
            # cache load falls back to a fresh compile anyway).  This
            # holds regardless of HOW cpu was selected (env var or
            # jax.config) because the plugin's sitecustomize import
            # happens either way.  No cache is better than a cache of
            # unloadable-or-SIGILL artifacts; plugin-free CPU machines
            # (CI) keep the persistent cache.
            return None
        if not loc:
            loc = _cache_dir_for(resolved)
        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return loc
    except Exception:
        return None  # cache is an optimization only


def _pjrt_plugin_present() -> bool:
    """True when any out-of-tree PJRT plugin is installed (jax_plugins
    entry points or namespace package)."""
    try:
        from importlib.metadata import entry_points

        if list(entry_points(group="jax_plugins")):
            return True
    except Exception:
        pass
    try:
        import importlib.util
        import os

        if os.environ.get("PALLAS_AXON_POOL_IPS"):
            return True  # this machine's tunneled-TPU plugin (sitecustomize)
        return any(
            importlib.util.find_spec(name) is not None
            for name in ("jax_plugins", "axon")
        )
    except Exception:
        return False

from scgrhc.core import debug as _debug  # noqa: E402  (SCGRHC_DEBUG modes)
