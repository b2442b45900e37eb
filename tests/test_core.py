"""Config / paths / timelog unit tests (reference parity: paramutil.py,
pathutil.py, timelog.py)."""

import json
import re
import time

import pytest

from scgrhc.core.params import Params
from scgrhc.core.timelog import timelog

MODERN_CONFIG = {
    "dir_path": "waveform_06",
    "in_channels": ["patch_ACC_lat", "patch_ACC_hf", "patch_ACC_dv"],
    "chamber": "PA",
    "segment_size": 1.5,
    "batch_size": 64,
    "train_path": "loader_train.pickle",
    "valid_path": "loader_valid.pickle",
    "test_path": "loader_test.pickle",
    "checkpoint_dir_path": "checkpoints",
    "comparison_dir_path": "comparisons",
    "pred_top_dir_path": "pred_top",
    "pred_rand_dir_path": "pred_rand",
    "alpha": 0.0001,
    "beta1": 0.5,
    "beta2": 0.999,
    "n_critic": 2,
    "lambda_gp": 10,
    "lambda_aux": 100,
    "total_epochs": 250,
    "min_RHC": -50,
    "use_global_min_max": False,
}


def write_params(tmp_path, cfg):
    p = tmp_path / "params.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_params_loads_modern_schema(tmp_path):
    params = Params(write_params(tmp_path, MODERN_CONFIG))
    assert params.chamber == "PA"
    assert params.in_channels == ["patch_ACC_lat", "patch_ACC_hf", "patch_ACC_dv"]
    assert params.train_path == "waveform_06/loader_train.pickle"
    assert params.checkpoint_dir_path == "waveform_06/checkpoints"
    assert params.segment_samples == 750  # 1.5 s * 500 Hz
    assert params.seed == 0  # scgrhc extension default


def test_params_rejects_legacy_schema(tmp_path):
    """Legacy waveform_01-05 configs lack 'chamber' and must raise KeyError,
    matching the reference (paramutil.py:10, SURVEY.md C18)."""
    legacy = {k: v for k, v in MODERN_CONFIG.items() if k != "chamber"}
    with pytest.raises(KeyError):
        Params(write_params(tmp_path, legacy))


def test_params_reads_all_reference_configs():
    """All 37 reference params.json files: 06-37 load, legacy 01-05 raise the
    same KeyError the reference raises."""
    import os

    ref = "/root/reference"
    if not os.path.isdir(ref):
        pytest.skip("reference not mounted")
    ok, bad = 0, 0
    for i in range(1, 38):
        path = os.path.join(ref, f"waveform_{i:02d}", "params.json")
        try:
            Params(path)
            ok += 1
        except KeyError:
            bad += 1
            assert i <= 5, f"modern config waveform_{i:02d} failed to load"
    assert ok >= 32 and ok + bad == 37


def test_timelog_format():
    start = time.time() - 3723  # 1h 2m 3s ago
    line = timelog("hello", start)
    assert re.search(r"\| 01:02:0[34] \| hello$", line)


def test_clear_and_clear_comparisons_valid(tmp_path, monkeypatch, capsys):
    """Directory cleanup utilities (reference: pathutil.py:9-19)."""
    import os

    from scgrhc.core import paths

    d = tmp_path / "stale"
    os.makedirs(d / "sub")
    (d / "sub" / "x.txt").write_text("x")
    paths.clear([str(d), str(tmp_path / "absent")])
    assert os.path.isdir(d) and not os.listdir(d)  # recreated empty
    assert f"Cleared {d}" in capsys.readouterr().out

    # clear_comparisons_valid wipes every experiment's comparisons/valid
    exp = tmp_path / "waveform_99"
    os.makedirs(exp / "comparisons" / "valid")
    (exp / "comparisons" / "valid" / "000.csv").write_text("a")
    monkeypatch.chdir(tmp_path)
    paths.clear_comparisons_valid()
    assert os.listdir(exp / "comparisons" / "valid") == []


def test_seed_null_unseeded_escape_hatch(tmp_path):
    """"seed": null draws a fresh random seed per load (reference parity
    with the unseeded sklearn split, recordutil.py:191-192)."""
    import json

    from scgrhc.core.params import Params

    cfg = json.load(open("/root/reference/waveform_06/params.json"))
    cfg["dir_path"] = str(tmp_path)
    cfg["seed"] = None
    p = tmp_path / "params.json"
    p.write_text(json.dumps(cfg))
    a, b = Params(str(p)), Params(str(p))
    assert a.unseeded and b.unseeded
    assert isinstance(a.seed, int)
    assert a.seed != b.seed  # 2^-31 collision odds

    cfg["seed"] = 7
    p.write_text(json.dumps(cfg))
    c = Params(str(p))
    assert not c.unseeded and c.seed == 7


def test_extension_keys_reach_train_config(tmp_path):
    """The round-2 opt-in keys plumb through Params into TrainConfig."""
    import json

    from scgrhc.core.params import Params
    from scgrhc.train.wgan import TrainConfig

    cfg = json.load(open("/root/reference/waveform_06/params.json"))
    cfg.update(dir_path=str(tmp_path), train_dtype="bfloat16",
               critic_fuse="2b", remat=True, conv_backend="pallas")
    p = tmp_path / "params.json"
    p.write_text(json.dumps(cfg))
    tc = TrainConfig.from_params(Params(str(p)))
    assert tc.compute_dtype == "bfloat16"
    assert tc.critic_fuse == "2b"
    assert tc.remat is True
    assert tc.conv_backend == "pallas"

    # defaults when the keys are absent
    cfg2 = json.load(open("/root/reference/waveform_06/params.json"))
    cfg2["dir_path"] = str(tmp_path)
    p.write_text(json.dumps(cfg2))
    tc2 = TrainConfig.from_params(Params(str(p)))
    assert (tc2.compute_dtype, tc2.critic_fuse, tc2.remat,
            tc2.conv_backend) == ("float32", "off", False, "xla")


def test_train_profile_fast_bundle(tmp_path):
    """"train_profile": "fast" expands to the measured-best TPU training
    bundle (BENCH.md round 3); explicitly-set keys win over the profile;
    unknown profiles fail loudly."""
    import json

    import pytest as _pytest

    from scgrhc.core.params import Params
    from scgrhc.train.wgan import TrainConfig

    cfg = json.load(open("/root/reference/waveform_06/params.json"))
    cfg.update(dir_path=str(tmp_path), train_profile="fast")
    p = tmp_path / "params.json"
    p.write_text(json.dumps(cfg))
    params = Params(str(p))
    tc = TrainConfig.from_params(params)
    assert tc.compute_dtype == "bfloat16"
    assert tc.critic_fuse == "2b"
    assert tc.reuse_pred is True
    assert params.rng_impl == "rbg"
    assert params.shape_bucket is True
    assert params.checkpoint_async is True
    assert params.data["train_profile"] == "fast"  # caller dict unmutated
    assert "train_dtype" not in params.data

    # an explicit key beats the profile
    cfg["critic_fuse"] = "off"
    p.write_text(json.dumps(cfg))
    assert TrainConfig.from_params(Params(str(p))).critic_fuse == "off"

    cfg["train_profile"] = "warp"
    p.write_text(json.dumps(cfg))
    with _pytest.raises(ValueError):
        Params(str(p))

    # default profile leaves every knob at its reference-parity default
    cfg2 = json.load(open("/root/reference/waveform_06/params.json"))
    cfg2["dir_path"] = str(tmp_path)
    p.write_text(json.dumps(cfg2))
    params2 = Params(str(p))
    assert params2.train_profile == "reference"
    assert params2.shape_bucket is False
    assert params2.checkpoint_async is False
    assert TrainConfig.from_params(params2).compute_dtype == "float32"


def test_compilation_cache_keyed_by_platform_and_host():
    """The persistent XLA cache dir is keyed by RESOLVED backend + host CPU
    fingerprint (round-2 VERDICT weak #5: the env-var key let a CPU run
    load another machine's AOT artifacts)."""
    import re

    import jax

    import scgrhc

    cpu_dir = scgrhc._cache_dir_for("cpu")
    tpu_dir = scgrhc._cache_dir_for("tpu")
    assert cpu_dir != tpu_dir  # platform in the key
    fp = scgrhc._host_fingerprint()
    bfp = scgrhc._build_fingerprint()
    assert re.fullmatch(r"[0-9a-f]{8}", fp)
    assert re.fullmatch(r"[0-9a-f]{8}", bfp)
    assert cpu_dir.endswith(f"xla_cache_cpu_{fp}_{bfp}")
    assert scgrhc._host_fingerprint() == fp  # stable within a host

    # platform-selection provenance is part of the key: a process whose
    # JAX_PLATFORMS env differs (different XLA build populations on this
    # machine) must not share AOT artifacts
    import os
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-c",
         "import scgrhc; print(scgrhc._build_fingerprint())"],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "zzz_other"},
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() != bfp

    # the live config: on a plugin-free machine the cache points at the
    # resolved-backend dir; with a TPU PJRT plugin installed and CPU
    # resolved (this machine's test population) the persistent cache is
    # DISABLED — measured: that mixed-build process cannot reload even
    # its own CPU AOT artifacts (cpu_aot_loader feature mismatch)
    loc = scgrhc.configure_compilation_cache()
    if scgrhc._pjrt_plugin_present() and jax.default_backend() == "cpu":
        assert loc is None
    else:
        assert loc == scgrhc._cache_dir_for(jax.default_backend())
        assert jax.config.jax_compilation_cache_dir == loc


def test_unseeded_requires_distributed_init_first(tmp_path, monkeypatch):
    """'seed': null with a multi-controller environment configured but
    jax.distributed NOT yet initialized must fail loudly (each process
    would otherwise silently draw its own seed — ADVICE r2)."""
    import json

    import pytest

    from scgrhc.core.params import Params

    cfg = json.load(open("/root/reference/waveform_06/params.json"))
    cfg["dir_path"] = str(tmp_path)
    cfg["seed"] = None
    p = tmp_path / "params.json"
    p.write_text(json.dumps(cfg))

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    with pytest.raises(RuntimeError, match="jax.distributed.initialize"):
        Params(str(p))

    # coordinator set, process count ambiguous -> still loud
    monkeypatch.delenv("JAX_NUM_PROCESSES")
    with pytest.raises(RuntimeError, match="jax.distributed.initialize"):
        Params(str(p))

    # explicit single-process is fine
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    assert isinstance(Params(str(p)).seed, int)
