"""Single builder/loader for the native C library (csrc/ -> one .so)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CSRC = os.path.join(_ROOT, "csrc")
_BUILD = os.path.join(_CSRC, "build")
SRCS = ["ingest.c", "exact_stats.c", "baq.c", "realign.c", "columns.c"]
# non-compiled inputs that must still invalidate the build cache
DEPS = ["baq_glocal_xw.inc"]

_lock = threading.Lock()
_lib = None


def get_native_lib() -> ctypes.CDLL:
    """Build (if stale) and load csrc/build/liblofreq_native.so."""
    global _lib
    with _lock:
        if _lib is None:
            srcs = [os.path.join(_CSRC, s) for s in SRCS]
            out = os.path.join(_BUILD, "liblofreq_native.so")
            os.makedirs(_BUILD, exist_ok=True)
            deps = [os.path.join(_CSRC, d) for d in DEPS]
            newest = max(os.path.getmtime(s) for s in srcs + deps)
            if not (os.path.exists(out)
                    and os.path.getmtime(out) >= newest):
                tmp = out + f".tmp{os.getpid()}"
                # -ffp-contract=off: FMA contraction would change double
                # rounding and break bit-identity with the reference kernels
                # (goldens in tests/golden/); -march=native only vectorizes,
                # which keeps per-lane IEEE semantics.
                subprocess.run(
                    ["gcc", "-O3", "-march=native", "-ffp-contract=off",
                     "-shared", "-fPIC", "-o", tmp, *srcs,
                     "-lm", "-lpthread"],
                    check=True, capture_output=True,
                )
                os.replace(tmp, out)
            _lib = ctypes.CDLL(out)
    return _lib
