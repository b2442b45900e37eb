"""Reproducible benchmark suite.  Prints ONE JSON line per invocation.

Default (no args) is the driver headline: batched SCG→RHC generator
inference throughput.  Other modes re-measure every BENCH.md table from
committed code:

    python bench.py                      # headline inference (f32)
    python bench.py --mode inference --dtype bfloat16
    python bench.py --mode train [--batch 64] [--dtype bfloat16]
                    [--fuse off|2b|3b] [--loop step|epoch]
    python bench.py --mode eval  [--ckpts 32] [--segments 512] [--stack 8]
    python bench.py --mode stream [--minutes 10] [--continuous]
    python bench.py --mode data
    python bench.py --mode pallas

The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
compares against the reference's own implementation style measured live
(torch CPU, batch-1 eval loop / per-batch training loop — reference:
waveform_test.py:58-67, waveform_train.py:357-381) where that is
feasible, else null.

Timing methodology: on this machine's tunneled TPU backend
``block_until_ready()`` returns before execution completes, so every
loop reads back a scalar checksum per iteration — the only reliable
completion barrier (adds one 4-byte transfer).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

IN_CHANNELS = 3  # flagship config waveform_06
T = 750
BATCH = 2048  # measured knee on v5e under scan-pipelined timing (BENCH.md:
              # f32 1024→22.1k, 2048→22.5k, 3072→20.2k; bf16 2048→29.1k,
              # 4096→27.7k — bf16's old per-dispatch knee at 4096 was
              # round-trip amortization, not a compute preference)


def _readback_time(fn, *args, seconds=3.0):
    """(per-iteration seconds, iterations) with scalar-readback barrier."""
    float(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    float(fn(*args))
    per_iter = time.perf_counter() - t0
    iters = max(3, int(seconds / max(per_iter, 1e-4)))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters, iters


def _flops_of(jitted, *args):
    """XLA's own FLOP estimate for the compiled program (None if the
    backend doesn't expose cost analysis)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def _emit(metric, value, unit, vs_baseline=None, **extra):
    line = {"metric": metric, "value": round(float(value), 1), "unit": unit,
            "vs_baseline": (round(float(vs_baseline), 1)
                            if vs_baseline is not None else None)}
    line.update(extra)
    print(json.dumps(line))


# -- inference (the driver headline) ------------------------------------------


def bench_jax(dtype="float32", batch=None, depth=8):
    """Chip inference throughput: ONE jitted program scans ``depth``
    distinct chunks of ``batch`` segments (carrying only a scalar sum),
    with one scalar readback per call — the same whole-program shape the
    epoch-scan train bench uses, so the tunnel's per-dispatch round trip
    (~30 ms on this machine; a co-located PCIe host would not see it)
    amortizes over depth×batch segments instead of taxing every batch.
    Distinct per-step inputs keep XLA from hoisting the forward out of
    the scan and mirror eval's real chunk stream.  ``depth=0`` restores
    the round-2 per-dispatch timing (one chunk per readback)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from scgrhc.models import generator

    batch = BATCH if batch is None else batch
    g_params = generator.init(jax.random.key(0), IN_CHANNELS)
    if dtype != "float32":
        g_params = generator.cast_params(g_params, jnp.dtype(dtype))
    shape = ((batch, IN_CHANNELS, T) if depth == 0
             else (depth, batch, IN_CHANNELS, T))
    scg = jax.random.uniform(jax.random.key(1), shape, jnp.float32)
    if dtype not in ("float32", "int8"):  # int8 quantizes weights, not input
        scg = scg.astype(jnp.dtype(dtype))

    if depth == 0:
        fwd = jax.jit(
            lambda p, x: jnp.sum(generator.apply(p, x, train=False).astype(jnp.float32))
        )
    else:
        def _scan(p, xs):
            def step(acc, x):
                y = generator.apply(p, x, train=False)
                return acc + jnp.sum(y.astype(jnp.float32)), None

            acc, _ = lax.scan(step, jnp.float32(0.0), xs)
            return acc

        fwd = jax.jit(_scan)
    per_iter, iters = _readback_time(fwd, g_params, scg)
    return max(1, depth) * batch / per_iter, {"iters": iters, "batch": batch}


def bench_torch_reference():
    """Reference-style eval: torch batch-1 per-segment loop on CPU
    (waveform_test.py:58-67, 142-145)."""
    try:
        import torch

        mod = _torch_oracles()
        g = mod.TorchGenerator(IN_CHANNELS).eval()
        x = torch.rand(1, IN_CHANNELS, T)
        with torch.no_grad():
            g(x)  # warm
            n = 20
            t0 = time.perf_counter()
            for _ in range(n):
                g(x)
            dt = time.perf_counter() - t0
        return n / dt
    except Exception:
        return None


def _torch_oracles():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "torch_oracles",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "tests", "torch_oracles.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_inference(args):
    batch = args.infer_batch or None
    sps, info = bench_jax(dtype=args.dtype, batch=batch, depth=args.depth)
    ref = bench_torch_reference()
    extra = {} if args.dtype == "float32" else {"dtype": args.dtype}
    if batch:
        extra["batch"] = info["batch"]
    if args.depth == 0:
        extra["timing"] = "per-dispatch"
    _emit("generator_inference_throughput", sps, "segments/s/chip",
          (sps / ref) if ref else None, **extra)


# -- training ------------------------------------------------------------------


def run_train(args):
    """WGAN-GP step throughput (n_critic critic updates + second-order GP +
    generator update — reference: waveform_train.py:357-381) at the
    flagship config shapes."""
    import jax
    import jax.numpy as jnp

    from scgrhc.train.wgan import (
        TrainConfig, init_state, train_epoch_gather, train_step,
    )

    cfg = TrainConfig(
        compute_dtype=args.dtype, critic_fuse=args.fuse, remat=args.remat,
        conv_backend=args.conv_backend, critic_backend=args.critic_backend,
        reuse_pred=args.reuse_pred,
    )
    impl = None if args.rng_impl == "threefry" else args.rng_impl
    loop_key = lambda i: jax.random.key(i, impl=impl)
    b = args.batch
    state = init_state(jax.random.key(0), IN_CHANNELS, cfg)
    rng = np.random.default_rng(0)
    nseg = max(4 * b, 256)
    scg_all = jnp.asarray(rng.random((nseg, IN_CHANNELS, T)), jnp.float32)
    rhc_all = jnp.asarray(rng.random((nseg, 1, T)), jnp.float32)

    step_flops = _flops_of(
        train_step, state, scg_all[:b], rhc_all[:b], loop_key(1), cfg
    )

    if args.loop == "step":
        # time a closure over a persistent state (train_step donates it)
        holder = {"state": state}

        def fn():
            st, d, g = train_step(
                holder["state"], scg_all[:b], rhc_all[:b], loop_key(2), cfg
            )
            holder["state"] = st
            return g

        per_iter, iters = _readback_time(lambda: fn())
        steps_per_iter = 1
    else:
        nb = args.nb
        idx = jnp.asarray(
            rng.integers(0, nseg, size=(nb, b)).astype(np.int32)
        )
        holder = {"state": state}

        def fn():
            st, d_hist, g_hist = train_epoch_gather(
                holder["state"], scg_all, rhc_all, idx, loop_key(2), cfg
            )
            holder["state"] = st
            return jnp.sum(g_hist)

        per_iter, iters = _readback_time(lambda: fn(), seconds=5.0)
        steps_per_iter = nb

    step_time = per_iter / steps_per_iter
    sps = b / step_time
    tflops = (step_flops / step_time / 1e12) if step_flops else None
    _emit("wgan_train_throughput", sps, "segments/s/chip",
          tflops, batch=b, dtype=args.dtype, fuse=args.fuse, loop=args.loop,
          remat=args.remat, conv_backend=args.conv_backend,
          critic_backend=args.critic_backend, rng_impl=args.rng_impl,
          reuse_pred=args.reuse_pred,
          ms_per_step=round(step_time * 1e3, 2),
          tflops_sustained=round(tflops, 1) if tflops else None,
          note="vs_baseline = TFLOPs sustained (XLA cost_analysis)")


def run_train_torch_baseline(args):
    """The reference's own training style: torch per-batch loop, CPU
    (waveform_train.py:357-381).  Slow — measured over a few steps."""
    import torch

    mod = _torch_oracles()
    b = min(args.batch, 16)
    g = mod.TorchGenerator(IN_CHANNELS)
    d = mod.TorchCritic(IN_CHANNELS)
    g_opt = torch.optim.Adam(g.parameters(), lr=1e-4, betas=(0.5, 0.999))
    d_opt = torch.optim.Adam(d.parameters(), lr=1e-4, betas=(0.5, 0.999))
    scg = torch.rand(b, IN_CHANNELS, T)
    rhc = torch.rand(b, 1, T)
    mse = torch.nn.MSELoss()

    def compute_gp(critic, scg_b, real, fake):
        # reference GP semantics (waveform_train.py:249-286)
        eps = torch.rand(real.size(0), 1, 1)
        interp = (eps * real + (1 - eps) * fake).requires_grad_(True)
        score = critic(torch.cat((scg_b, interp), 1))
        grads = torch.autograd.grad(
            score, interp, grad_outputs=torch.ones_like(score),
            create_graph=True,
        )[0]
        return ((grads.reshape(real.size(0), -1).norm(2, dim=1) - 1) ** 2).mean()

    def step():
        for _ in range(2):
            pred = g(scg)
            d_opt.zero_grad()
            loss = -d(torch.cat((scg, rhc), 1)).mean() + d(
                torch.cat((scg, pred.detach()), 1)
            ).mean() + 10.0 * compute_gp(d, scg, rhc, pred.detach())
            loss.backward()
            d_opt.step()
        g_opt.zero_grad()
        pred = g(scg)
        gl = -d(torch.cat((scg, rhc), 1)).mean() + 100.0 * mse(pred, rhc)
        gl.backward()
        g_opt.step()

    step()  # warm
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    dt = (time.perf_counter() - t0) / n
    _emit("wgan_train_torch_cpu_baseline", b / dt, "segments/s", None, batch=b)


# -- eval (multi-checkpoint) ---------------------------------------------------


def run_eval(args):
    """Eval-all throughput: score K checkpoints over an S-segment split
    (reference: one serial CPU loop per checkpoint, waveform_test.py:119-154).
    Ours stacks checkpoints and vmaps the forward over the weight axis."""
    import jax
    import jax.numpy as jnp

    from scgrhc.eval.infer import predict_split_multi
    from scgrhc.data.store import SegmentStore
    from scgrhc.models import generator

    rng = np.random.default_rng(0)
    S = args.segments
    store = SegmentStore(
        rng.random((S, IN_CHANNELS, T)).astype(np.float32),
        rng.random((S, 1, T)).astype(np.float32),
        [f"r{i}" for i in range(S)], np.zeros(S, np.int64),
        np.zeros(S, np.int64), np.tile([0.0, 1.0], (S, 1)),
        np.tile([0.0, 1.0], (S, 1)), segment_samples=T,
    )
    params_list = [
        generator.init(jax.random.key(i), IN_CHANNELS) for i in range(args.ckpts)
    ]

    # warm/compile outside the timed region (chunk shapes are identical
    # for every group thanks to pad-to-static)
    predict_split_multi(
        params_list[: args.stack], store, batch=args.eval_batch,
        stack=args.stack, dtype=args.dtype,
    )

    t0 = time.perf_counter()
    out = predict_split_multi(
        params_list, store, batch=args.eval_batch, stack=args.stack,
        dtype=args.dtype,
    )
    # the scores dict is host-side numpy → computation is complete
    assert len(out) == args.ckpts
    dt = time.perf_counter() - t0
    cps = args.ckpts / dt
    _emit("eval_all_throughput", cps * S, "segment-evals/s/chip", None,
          ckpts=args.ckpts, segments=S, stack=args.stack,
          eval_batch=args.eval_batch,
          checkpoints_per_s=round(cps, 2))


# -- streaming ----------------------------------------------------------------


def run_stream(args):
    import jax.numpy as jnp

    import jax

    from scgrhc.models import generator
    from scgrhc.parallel.stream import stream_infer

    L = int(args.minutes * 60 * 500)
    g = generator.init(jax.random.key(0), IN_CHANNELS)
    rec = np.random.default_rng(0).random((IN_CHANNELS, L)).astype(np.float32)

    if args.device_resident:
        # compute-only roofline: the record already lives in HBM (e.g. an
        # on-device acquisition buffer) — frame + normalize + U-Net +
        # denorm with NO tunnel H2D in the timed region.  The gap to the
        # end-to-end rows below is pure host↔device transfer (this
        # machine's tunnel sustains ~17 MB/s H2D; a PCIe host would not
        # see it).  A single scalar readback closes each rep (the tunnel
        # acks execution early — see bench header).
        from scgrhc.parallel.stream import _frame_norm, eval_windows_denorm

        rec_d = jax.device_put(jnp.asarray(rec))
        lo, hi = jnp.float32(0.0), jnp.float32(1.0)

        def one_pass():
            w = _frame_norm(rec_d, T, None)
            n = w.shape[0]
            batch = min(512, n)
            tot = jnp.float32(0.0)
            for s in range(0, n, batch):
                chunk = w[s : s + batch]
                if chunk.shape[0] < batch:
                    chunk = jnp.pad(
                        chunk, ((0, batch - chunk.shape[0]), (0, 0), (0, 0))
                    )
                tot = tot + jnp.sum(eval_windows_denorm(g, chunk, lo, hi))
            return float(tot)

        one_pass()  # warm/compile
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            one_pass()
        dt = (time.perf_counter() - t0) / reps
        label = "device-resident"
    elif args.continuous:
        from scgrhc.models import cp

        np.asarray(cp.apply_continuous(g, jnp.asarray(rec)[None]))  # warm
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            # H2D inside the timed region — this is an end-to-end row
            # (round 2 staged the record on device before timing, which
            # silently excluded the upload; BENCH.md now says so)
            np.asarray(cp.apply_continuous(g, jnp.asarray(rec)[None]))
        dt = (time.perf_counter() - t0) / reps
        label = "continuous"
    elif args.adc:
        # int16 ADC upload + on-device calibration (the serve/predict
        # digital fast path): half the H2D bytes of the f32 path — the
        # dominant cost through this machine's tunnel (BENCH.md roofline)
        adc = np.clip(rec * 1000, -32767, 32767).astype(np.int16)
        cal = (np.full(IN_CHANNELS, 1000.0, np.float32),
               np.zeros(IN_CHANNELS, np.float32),
               np.full(IN_CHANNELS, -32768.0, np.float32))
        stream_infer(g, adc, segment_samples=T, calibration=cal)  # warm
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = stream_infer(g, adc, segment_samples=T, calibration=cal)
        dt = (time.perf_counter() - t0) / reps
        label = "windowed-adc"
    else:
        stream_infer(g, rec, segment_samples=T)  # warm
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = stream_infer(g, rec, segment_samples=T)
        dt = (time.perf_counter() - t0) / reps
        label = "windowed"
    xrt = (L / 500.0) / dt
    _emit("stream_infer_xrealtime", xrt, "x_realtime/chip", None,
          minutes=args.minutes, mode=label,
          msamples_per_s=round(L / dt / 1e6, 2))


# -- data stage ----------------------------------------------------------------


def run_data(args):
    """Dataset build throughput (segmentation + noise gate) on synthetic
    records, host path (the default data_backend)."""
    import tempfile

    from scgrhc.core import paths
    from scgrhc.dsp.segment import get_segments
    from scgrhc.utils.synth import make_synthetic_database

    class P:
        in_channels = ["patch_ACC_lat", "patch_ACC_hf", "patch_ACC_dv"]
        chamber = "PA"
        segment_size = 1.5
        min_RHC = -50
        use_global_min_max = False

    with tempfile.TemporaryDirectory() as td:
        make_synthetic_database(td, n_records=4, duration_s=600.0)
        old = paths.DATA_PATH
        paths.set_data_path(td)
        try:
            get_segments(P())  # warm imports
            t0 = time.perf_counter()
            segs = get_segments(P())
            dt = time.perf_counter() - t0
        finally:
            paths.set_data_path(old)
    total_s = 4 * 600.0
    _emit("data_stage_throughput", total_s / dt, "signal-seconds/s", None,
          segments=len(segs), records=4)


# -- pallas -------------------------------------------------------------------


def run_pallas(args):
    """Fused on-device gate+normalize kernel vs the plain jnp framing path,
    both on signal already resident in HBM."""
    import jax
    import jax.numpy as jnp

    from scgrhc.ops.pallas.dsp import segment_record_on_device
    from scgrhc.parallel.stream import _frame_norm

    L = (10 * 60 * 500 // T) * T
    rhc = jnp.asarray(np.random.default_rng(0).random((L,)), jnp.float32)
    scg_lc = jnp.asarray(
        np.random.default_rng(1).random((L, IN_CHANNELS)), jnp.float32
    )
    scg_cl = scg_lc.T

    def fused():
        keep, scg_n, rhc_n, mm_s, mm_r, starts = segment_record_on_device(
            scg_lc, rhc, T, -50.0
        )
        return jnp.sum(scg_n) + jnp.sum(keep)

    per_fused, _ = _readback_time(jax.jit(fused))

    def plain():
        return jnp.sum(_frame_norm(scg_cl, T, None))

    per_plain, _ = _readback_time(jax.jit(plain))

    # norm-only head-to-head on the streaming-inference framing path
    def norm_pallas():
        return jnp.sum(_frame_norm(scg_cl, T, None, "pallas"))

    per_np, _ = _readback_time(jax.jit(norm_pallas))

    n_windows = L // T
    _emit("pallas_gate_normalize", n_windows / per_fused, "windows/s/chip",
          per_plain / per_fused,
          stream_norm_pallas_speedup=round(per_plain / per_np, 3),
          note="vs_baseline = fused gate+norm speedup over plain jnp "
               "framing; stream_norm_pallas_speedup = norm-only kernel vs "
               "jnp on the same framing")


def _run_with_compile_budget(budget_s, argv):
    """Re-run this benchmark in a child process, waiting at most ``budget_s``.

    Remote-TPU compiles through this machine's tunnel can exceed 30 min for
    pathological program shapes (BENCH.md: ``eval --stack >= 16``, ``train
    --batch 128 --fuse 2b``), and killing a client mid-remote-compile wedges
    the chip for tens of minutes.  So on timeout the child is deliberately
    NOT killed: it is detached to finish harmlessly — populating the
    persistent XLA compilation cache so a later attempt starts warm — while
    this process emits a ``compile-budget-exceeded`` JSON line and returns.
    The child's (late) output goes to the temp file named in that line, never
    to this stdout, so the one-JSON-line contract holds either way.
    """
    child_argv = []
    skip = False
    for a in argv:
        if skip:
            skip = False
        elif a == "--compile-budget":
            skip = True
        elif not a.startswith("--compile-budget="):
            child_argv.append(a)
    out = tempfile.NamedTemporaryFile(
        mode="w+", suffix=".bench.out", delete=False
    )
    env = dict(os.environ, _SCGRHC_BENCH_CHILD="1")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)] + child_argv,
        stdout=out, stderr=subprocess.STDOUT, env=env,
        start_new_session=True,  # survives this process exiting
    )
    try:
        rc = proc.wait(timeout=budget_s)
    except subprocess.TimeoutExpired:
        _emit("bench_compile_budget", 0, "seconds", None,
              error="compile-budget-exceeded", budget_s=budget_s,
              detached_pid=proc.pid, detached_output=out.name,
              argv=child_argv)
        return 0
    out.seek(0)
    text = out.read()
    os.unlink(out.name)
    # pass through the child's JSON line(s); drop warning noise
    for line in text.splitlines():
        if line.startswith("{"):
            print(line)
    return rc


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="inference",
                    choices=["inference", "train", "train-torch", "eval",
                             "stream", "data", "pallas"])
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--fuse", default="off", choices=["off", "2b", "3b"])
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--conv-backend", default="xla", choices=["xla", "pallas"])
    ap.add_argument("--critic-backend", default="xla", choices=["xla", "fused"])
    ap.add_argument("--rng-impl", default="threefry",
                    choices=["threefry", "rbg", "unsafe_rbg"])
    ap.add_argument("--reuse-pred", action="store_true")
    ap.add_argument("--loop", default="epoch", choices=["step", "epoch"])
    ap.add_argument("--nb", type=int, default=8)
    ap.add_argument("--ckpts", type=int, default=32)
    ap.add_argument("--segments", type=int, default=512)
    ap.add_argument("--stack", type=int, default=8)
    ap.add_argument("--eval-batch", type=int, default=256)
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--adc", action="store_true")
    ap.add_argument("--device-resident", action="store_true")
    ap.add_argument("--infer-batch", type=int, default=0,
                    help="inference-mode batch size (0 = the headline's "
                         f"default {BATCH})")
    ap.add_argument("--depth", type=int, default=8,
                    help="inference-mode scan depth: chunks per dispatched "
                         "program (0 = round-2 per-dispatch timing, one "
                         "tunnel round-trip per chunk)")
    ap.add_argument("--compile-budget", type=float, default=0.0,
                    help="seconds to wait for the (child-process) run before "
                         "emitting a compile-budget-exceeded line; 0 = no "
                         "budget.  The child is detached, never killed "
                         "(killing mid-remote-compile wedges the chip).")
    args = ap.parse_args(argv)

    if args.compile_budget > 0 and not os.environ.get("_SCGRHC_BENCH_CHILD"):
        return _run_with_compile_budget(
            args.compile_budget, list(argv) if argv is not None else sys.argv[1:]
        )

    # test hook: lets the budget-timeout path be exercised deterministically
    # without a multi-minute compile (tests/test_graft_bench.py)
    _sleep = float(os.environ.get("SCGRHC_BENCH_TEST_SLEEP", "0") or 0)
    if _sleep:
        time.sleep(_sleep)

    # the axon TPU plugin's sitecustomize overrides JAX_PLATFORMS at
    # interpreter startup; re-assert the caller's explicit choice so child
    # runs (compile-budget guard, test subprocesses) land on the intended
    # backend
    want_platform = os.environ.get("JAX_PLATFORMS")
    if want_platform:
        import jax

        jax.config.update("jax_platforms", want_platform)

    import scgrhc

    scgrhc.configure_compilation_cache()
    {
        "inference": run_inference,
        "train": run_train,
        "train-torch": run_train_torch_baseline,
        "eval": run_eval,
        "stream": run_stream,
        "data": run_data,
        "pallas": run_pallas,
    }[args.mode](args)


if __name__ == "__main__":
    sys.exit(main())
