"""Native (C) components — optional accelerators with Python fallbacks.

``_wfdbfast`` fuses WFDB .dat decoding + calibration in one C pass (see
_wfdbfast.c).  It is built by ``pip install`` (setup.py ext_modules) or
on demand by :func:`build_inplace`; every caller falls back to the NumPy
path in :mod:`scgrhc.io.wfdb` when the extension is absent, so the
framework works from a plain source checkout.
"""

from __future__ import annotations

decode_calibrate = None
try:  # pragma: no cover - exercised via io tests when built
    from scgrhc.native._wfdbfast import decode_calibrate  # type: ignore
except ImportError:
    pass


def build_inplace(verbose: bool = False) -> bool:
    """Compile _wfdbfast next to this file (dev convenience).  Returns
    True when the extension is importable afterwards."""
    global decode_calibrate
    if decode_calibrate is not None:
        return True
    import os
    import subprocess
    import sysconfig

    import numpy as np

    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "_wfdbfast.c")
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(here, "_wfdbfast" + suffix)
    cmd = [
        "gcc", "-O3", "-shared", "-fPIC", src, "-o", out,
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{np.get_include()}",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=not verbose)
    except Exception:
        return False
    try:
        from scgrhc.native._wfdbfast import decode_calibrate as dc

        decode_calibrate = dc
        return True
    except ImportError:
        return False
