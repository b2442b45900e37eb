"""Profiling / tracing hooks.

The reference's only observability is wall-clock ``timelog`` prints
(reference: timelog.py:3-10, sprinkled through every stage).  Those are
kept for log parity (scgrhc.core.timelog); this module adds the TPU-native
tier on top: ``jax.profiler`` device traces (XLA op timelines viewable in
TensorBoard/Perfetto) and named trace annotations around the hot loops.

Enable by setting ``SCGRHC_PROFILE_DIR=/path`` (traces every stage) or by
using :func:`trace` / :func:`annotate` directly.
"""

from __future__ import annotations

import os
from contextlib import contextmanager, nullcontext

ENV_VAR = "SCGRHC_PROFILE_DIR"


def profile_dir() -> str | None:
    return os.environ.get(ENV_VAR) or None


@contextmanager
def trace(label: str, out_dir: str | None = None):
    """Capture a jax.profiler device trace for the enclosed block.

    No-op unless ``out_dir`` or ``$SCGRHC_PROFILE_DIR`` is set, so hot
    paths can stay instrumented unconditionally.
    """
    out = out_dir or profile_dir()
    if not out:
        yield
        return
    import jax

    path = os.path.join(out, label)
    os.makedirs(path, exist_ok=True)
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the host timeline).

    Cheap enough to leave on: a no-op context manager when tracing is
    disabled.
    """
    if not profile_dir():
        return nullcontext()
    import jax

    return jax.profiler.TraceAnnotation(name)
