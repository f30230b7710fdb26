"""Native host-runtime components (C, CPython API).

The TPU does the heavy lifting (jax/XLA/pallas); these are the *host*
hot loops around it -- currently the batch CKY backpointer decode
(`_fasttrees.c`), whose pure-python counterpart in analysis/trees.py
caps the parse pipeline well below device chart throughput.

Build model: no pip deps and no build step at install time -- the
extension is compiled lazily with the system C toolchain on first use
and cached next to the source (atomic rename, so concurrent processes
race safely).  Everything degrades gracefully: callers get ``None``
from :func:`load` when no compiler is available (or when
``CLIORA_TPU_NO_NATIVE=1``) and fall back to the python implementations,
which remain the behavior oracle (tests/test_native.py pins parity).
"""

from __future__ import annotations

import importlib
import os
import subprocess
import sys
import sysconfig
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_CACHE = "unset"  # tri-state: "unset" | None (unavailable) | module
_LOCK = threading.Lock()  # one build/import per process at a time


def _so_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_HERE, "_fasttrees" + suffix)


def _build() -> None:
    src = os.path.join(_HERE, "_fasttrees.c")
    out = _so_path()
    tmp = out + f".tmp{os.getpid()}.{threading.get_ident()}"
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O2", "-fPIC", "-shared",
           "-I", sysconfig.get_path("include"), src, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load() -> Optional[object]:
    """The compiled `_fasttrees` module, building it on first use.

    Returns None when native is disabled or unbuildable; callers fall
    back to the python path.  The result (including failure) is cached
    for the process.
    """
    global _CACHE
    with _LOCK:
        if _CACHE != "unset":
            return _CACHE
        if os.environ.get("CLIORA_TPU_NO_NATIVE"):
            _CACHE = None
            return None
        try:
            if not (os.path.exists(_so_path())
                    and os.path.getmtime(_so_path())
                    >= os.path.getmtime(
                        os.path.join(_HERE, "_fasttrees.c"))):
                _build()
            _CACHE = importlib.import_module(
                "cliora_tpu.native._fasttrees")
        except Exception:
            _CACHE = None
        return _CACHE
