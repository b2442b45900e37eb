"""Test configuration: force an 8-virtual-device CPU platform so sharding /
multi-chip paths run in CI without TPUs (SURVEY.md §4), and provide a
synthetic database fixture standing in for the reference's hard-coded
dataset path (reference: pathutil.py:4-6)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon/TPU: tests run on CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# NOT set: --xla_backend_optimization_level=0.  Measured full-tier A/B
# (BENCH.md "Quick test tier", round 5): it cuts a single WGAN-step
# compile ~24% CPU-time but the slower generated code costs MORE across
# the runtime-heavy tests — 454 s vs 381 s for the identical tier.
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize forces jax_platforms=axon,cpu; tests
# must run on the 8-virtual-device CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

import scgrhc  # noqa: E402

# after the CPU forcing above: cache dir keys on the resolved backend
scgrhc.configure_compilation_cache()


@pytest.fixture(autouse=True)
def _pin_torch_threads():
    """Single-thread every torch oracle (VERDICT r4 weak #1).

    torch's intra-op parallelism partitions reductions by thread count,
    so under host contention its f32 reduction ORDER shifts and oracle
    comparisons drift past tight tolerances (measured: 3.4e-4 vs an
    1e-4 GP tolerance with a busy core).  Pinning to one thread makes
    every torch reference value bit-deterministic regardless of load.
    Lazy — only touches torch if some test already imported it."""
    import sys

    t = sys.modules.get("torch")
    if t is not None and t.get_num_threads() != 1:
        t.set_num_threads(1)
    yield


@pytest.fixture(scope="session")
def synth_db(tmp_path_factory):
    """Session-scoped synthetic database; returns its processed_data dir."""
    from scgrhc.utils.synth import make_synthetic_database

    root = tmp_path_factory.mktemp("scgdb")
    return make_synthetic_database(str(root), n_records=2, duration_s=120.0)


@pytest.fixture()
def use_synth_db(synth_db, monkeypatch):
    """Point scgrhc.core.paths at the synthetic database for one test."""
    from scgrhc.core import paths

    root = os.path.dirname(synth_db)
    monkeypatch.setattr(paths, "DATA_PATH", root)
    monkeypatch.setattr(paths, "PROCESSED_DATA_PATH", synth_db)
    return synth_db
