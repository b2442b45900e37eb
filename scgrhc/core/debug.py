"""Numerical-debug mode — the rebuild's sanitizer tier.

The reference has no sanitizers or runtime checks (SURVEY §5 "race
detection: none").  The TPU-native analogs are XLA-level: NaN tracing
(``jax_debug_nans`` re-runs the offending primitive un-jitted and points
at it) and jit-disable for step-through debugging.  Enable with
``SCGRHC_DEBUG=nan``, ``SCGRHC_DEBUG=nojit``, or ``SCGRHC_DEBUG=all``
before import, or call :func:`enable` directly.
"""

from __future__ import annotations

import os

ENV_VAR = "SCGRHC_DEBUG"


def enable(mode: str) -> None:
    import jax

    if mode in ("nan", "all"):
        jax.config.update("jax_debug_nans", True)
    if mode in ("nojit", "all"):
        jax.config.update("jax_disable_jit", True)


def enable_from_env() -> None:
    mode = os.environ.get(ENV_VAR, "").lower()
    if mode:
        enable(mode)


enable_from_env()
