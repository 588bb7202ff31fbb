"""Out-of-process device probe: backend kind + host<->device bandwidth.

The device-stage gates (ops/screen.py:device_screen_default,
ops/device_baq.py:device_baq_worthwhile) need two facts before the first
column batch: is an accelerator present, and can the link carry the
screen's traffic?  Measuring that in-process is hazardous twice over:

 * a sick/wedged device service can block the probing thread forever,
   hanging `call` (the host path is always correct, so the gate must
   never be load-bearing), and
 * a Python daemon thread parked inside the PJRT/axon C++ client at
   interpreter shutdown gets pthread_exit()'d by CPython when it next
   takes the GIL; the forced unwind crosses C++ catch(...) frames in the
   client and aborts the whole process with "FATAL: exception not
   rethrown" (the round-2 bench exited 134 through exactly this: the
   gate cache had expired mid-session, every run restarted the probe
   threads, and they were still inside the axon client at exit).

So the probe runs in a *subprocess*: it imports jax fresh, measures one
8 MB host->device round trip, and writes `{"backend", "bw_mbs"}` to a
result file (and to the shared on-disk cache) ATOMICALLY BY ITSELF — so
even if the parent exits first, the measurement lands for the next
process.  The parent never parks a thread inside device code and never
needs to kill anything: callers either wait with a deadline (the
parallel driver, before forking) or poll between column batches, and the
child self-terminates via SIGALRM if the device service wedges.
Results are cached per process and on disk (TTL) so the jax-import cost
is paid once an hour per machine, not once per CLI invocation.

Reference context: the reference has no device, hence no gate; this is
infrastructure for the TPU engine described in SURVEY §7.
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time

log = logging.getLogger("lofreq_tpu")

# What the child runs: warm the transfer path (client + connection
# setup), then time one 8 MB host->device round trip.  Never imports
# lofreq_tpu (no recursion).  argv: result_path cache_path("" = don't)
_CHILD_SRC = r"""
import json, os, signal, sys, time
signal.alarm(int(os.environ.get("LOFREQ_TPU_PROBE_ALARM_S", "300")))
import numpy as np
out = {"backend": "none", "bw_mbs": 0.0}
try:
    import jax
    out["backend"] = jax.default_backend()
    if out["backend"] != "cpu":
        buf = np.zeros(8 << 20, np.uint8)
        # block_until_ready, not a slice fetch: a slice would jit-compile
        # (minutes on a remote-compile tunnel); the put itself is the
        # quantity of interest
        jax.device_put(buf).block_until_ready()
        t0 = time.perf_counter()
        jax.device_put(buf).block_until_ready()
        dt = max(time.perf_counter() - t0, 1e-6)
        out["bw_mbs"] = (buf.nbytes / (1 << 20)) / dt
except Exception as e:
    out["err"] = str(e)[:200]
paths = [sys.argv[1]]
# only accelerator-backed results are worth sharing machine-wide: "none"
# can be a transient service hiccup, and cpu pins are per-process
if len(sys.argv) > 2 and sys.argv[2] and out["backend"] not in (
        "none", "cpu"):
    paths.append(sys.argv[2])
for p in paths:
    tmp = p + f".tmp{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(out, fh)
    os.replace(tmp, p)
# skip interpreter/PJRT teardown entirely: the probe's job is done and a
# wedged client must not turn a successful measurement into a nonzero rc
sys.stdout.flush()
os._exit(0)
"""

_TTL_S = 3600.0
_result: dict | None = None  # per-process cache
_child: tuple[int, subprocess.Popen, str] | None = None


def _cache_enabled() -> bool:
    return os.environ.get("LOFREQ_TPU_GATE_CACHE", "1") != "0"


def _cache_path() -> str:
    import hashlib
    import tempfile

    key = hashlib.md5(
        (os.environ.get("JAX_PLATFORMS", "") + ":"
         + str(os.getuid())).encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(),
                        f"lofreq_tpu_probe_{key}.json")


def _read_json(path: str, ttl: float | None = None) -> dict | None:
    try:
        if ttl is not None and time.time() - os.stat(path).st_mtime > ttl:
            return None
        with open(path) as fh:
            got = json.load(fh)
        return got if "backend" in got else None
    except Exception:
        return None


def _inline_answer() -> dict | None:
    """Fast paths that need no subprocess.

    LOFREQ_TPU_LINK_MBS pins the bandwidth (tests/deployments); a
    cpu-pinned process (env or an already-imported jax config, as the
    test suite sets) is known to have no accelerator."""
    override = os.environ.get("LOFREQ_TPU_LINK_MBS")
    if override:
        try:
            return {"backend": "tpu", "bw_mbs": float(override)}
        except ValueError:
            pass
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return {"backend": "cpu", "bw_mbs": 0.0}
    if "jax" in sys.modules:
        try:
            import jax

            if jax.config.jax_platforms == "cpu":
                return {"backend": "cpu", "bw_mbs": 0.0}
        except Exception:
            pass
    return None


def probe_device(wait_s: float = 0.0) -> dict | None:
    """Returns {"backend": str, "bw_mbs": float} or None (undecided).

    wait_s == 0: non-blocking — starts (or polls) the probe subprocess
    and returns None until its result file appears.  wait_s > 0: blocks
    up to wait_s; on deadline the answer is "no usable device" for this
    process (the child keeps running detached and still writes the
    machine cache when it eventually finishes)."""
    global _result, _child
    if _result is not None:
        return _result
    res = _inline_answer()
    if res is None and _cache_enabled():
        res = _read_json(_cache_path(), ttl=_TTL_S)
    if res is not None:
        _result = res
        return res
    if _child is not None and _child[0] != os.getpid():
        _child = None  # forked: the Popen belongs to the parent
    if _child is None:
        import tempfile

        fd, result_path = tempfile.mkstemp(prefix="lofreq_tpu_probe_res",
                                           suffix=".json")
        os.close(fd)
        os.unlink(result_path)  # child creates it atomically when done
        try:
            proc = subprocess.Popen(
                [sys.executable, "-c", _CHILD_SRC, result_path,
                 _cache_path() if _cache_enabled() else ""],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                start_new_session=True)
        except Exception:
            _result = {"backend": "none", "bw_mbs": 0.0}
            return _result
        _child = (os.getpid(), proc, result_path)
    _, proc, result_path = _child
    deadline = time.monotonic() + wait_s
    while True:
        res = _read_json(result_path)
        if res is not None:
            _result = res
            try:
                os.unlink(result_path)
            except OSError:
                pass
            _child = None
            return res
        if proc.poll() is not None:
            # exited without writing: broken child
            _result = {"backend": "none", "bw_mbs": 0.0}
            _child = None
            return _result
        if time.monotonic() >= deadline:
            break
        time.sleep(min(0.2, max(deadline - time.monotonic(), 0.01)))
    if wait_s > 0:
        log.info("device probe still pending after %.0fs; treating as no "
                 "usable device for this run", wait_s)
        _result = {"backend": "none", "bw_mbs": 0.0}
    return None if wait_s == 0 else _result
