"""Headline benchmark: batched SCG→RHC generator inference throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "segments/s/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
compares against the reference's own evaluation implementation measured
live: a PyTorch batch-1 per-segment loop (reference: waveform_test.py:
58-67 — it evaluates segment-by-segment on CPU, never batching and never
using the GPU).  Ours is the same model architecture run as batched jitted
XLA on the available accelerator.

Context for the value: 1 segment = 1.5 s of 500 Hz signal, so
×real-time = value × 1.5 (north star in BASELINE.md: ≥50× ⇔ ≥33.4 seg/s).
"""

import json
import time

import numpy as np


IN_CHANNELS = 3  # flagship config waveform_06
T = 750
BATCH = 1024


def bench_jax() -> tuple[float, dict]:
    import jax
    import jax.numpy as jnp

    from scgrhc.models import generator

    g_params = generator.init(jax.random.key(0), IN_CHANNELS)
    scg = jax.random.uniform(jax.random.key(1), (BATCH, IN_CHANNELS, T), jnp.float32)

    # The jitted step returns a scalar checksum and timing reads it back to
    # host each iteration: on this machine's tunneled TPU backend,
    # block_until_ready() returns before execution finishes, so a plain
    # dispatch loop over-reports throughput ~1000x.  A scalar readback is
    # the only reliable completion barrier, and adds one 4-byte transfer.
    fwd = jax.jit(lambda p, x: jnp.sum(generator.apply(p, x, train=False)))
    float(fwd(g_params, scg))  # compile + warm

    t0 = time.perf_counter()
    float(fwd(g_params, scg))
    per_iter = time.perf_counter() - t0
    iters = max(3, int(3.0 / max(per_iter, 1e-4)))

    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        acc += float(fwd(g_params, scg))
    dt = time.perf_counter() - t0
    sps = BATCH * iters / dt
    return sps, {"iters": iters, "batch": BATCH, "checksum": acc}


def bench_torch_reference() -> float | None:
    """Reference-style eval: torch batch-1 per-segment loop on CPU
    (waveform_test.py:58-67, 142-145)."""
    try:
        import torch

        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "torch_oracles",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tests", "torch_oracles.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

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


def main() -> None:
    sps, _ = bench_jax()
    ref = bench_torch_reference()
    vs = (sps / ref) if ref else None
    print(
        json.dumps(
            {
                "metric": "generator_inference_throughput",
                "value": round(float(sps), 1),
                "unit": "segments/s/chip",
                "vs_baseline": round(float(vs), 1) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
