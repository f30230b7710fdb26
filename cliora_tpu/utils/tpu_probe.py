"""Bounded TPU-tunnel reachability probe.

In this environment jax routes through a tunneled PJRT plugin whose
backend init blocks *forever* in a connect-retry loop when the tunnel
is down (observed 2026-08-18) -- and the plugin's sitecustomize
overrides ``JAX_PLATFORMS``, so the only way to bound a probe is to run
the device query in a killable subprocess.  Shared by bench.py and the
tools/ benchmark harnesses so none of them can hang unbounded.
"""

from __future__ import annotations

import subprocess
import sys


def tpu_reachable(timeout_s: float = 240.0) -> bool:
    """True iff a TPU backend init completes within ``timeout_s``."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices()[0].platform == 'tpu'"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False
