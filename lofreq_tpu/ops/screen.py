"""Device (JAX) significance screening for the Poisson-binomial test.

The reference prunes per column with a data-dependent early exit
(snpcaller.c:950): with ascending-sorted error probs, the running tail
P(X >= K) only grows, so once the partial tail exceeds sig/bonf the column
is insignificant.  On TPU we make this compiler-friendly: a fixed-length
linear-space f32 DP over the (bucket-padded) sorted probs yields a lower
bound of the tail; columns whose bound already exceeds (sig * MARGIN) / bonf
can never be called and are screened out.  Everything else is confirmed by
the exact native DP.

The screen is conservative by construction (lower bound + f32 margin), so
final output is identical to running the exact DP everywhere.
"""

from __future__ import annotations

import logging
import os
from functools import partial

import numpy as np

SCREEN_S = 32  # DP prefix length
# max probs shipped/scanned per column: deep columns are screened from
# their top-S largest err probs (subset tail = lower bound of full tail)
TOP_S = 128
KMAX = 16  # clipped tail cell (tail at smaller k bounds tail at k)
MARGIN = 1e3  # screening slack for f32 drift + running-bonf growth
NEG = -1e30

log = logging.getLogger("lofreq_tpu")


def _get_jax():
    from . import ensure_jax_cache

    ensure_jax_cache()
    import jax
    import jax.numpy as jnp

    return jax, jnp


def _local_mesh():
    """Mesh over all local devices ('cols' axis), or None single-device.

    Production multi-chip: the screen's column batches are data-parallel
    over every local device (SURVEY §2.3 'per-chip batches of pileup
    columns'); bucketed batch sizes are powers of two >= 256, so they
    divide any power-of-two device count."""
    jax, _ = _get_jax()
    devs = jax.devices()
    n = len(devs)
    if n <= 1:
        return None
    # largest power of two <= n: keeps bucketed batches divisible
    p = 1
    while p * 2 <= n:
        p *= 2
    from jax.sharding import Mesh

    return Mesh(np.array(devs[:p]), ("cols",))


def _build_screen_fn(use_pallas=False, mesh=None):
    jax, jnp = _get_jax()

    # u8 log-quantized err-prob decode table: code c decodes to
    # 2^(-c/8) (255 = 0.0, the DP identity).  The host encodes with
    # ceil(), so decode <= p: smaller probs shrink the tail lower bound,
    # which only ADDS candidates — conservative (ulp-level f32 rounding
    # of the table is absorbed by MARGIN).  Shipping u8 instead of f32
    # cuts the per-column link traffic 4x.
    dec = np.zeros(256, dtype=np.float32)
    dec[:255] = np.exp2(-np.arange(255, dtype=np.float64) / 8.0
                        ).astype(np.float32)

    def screen_body(codes, depths, ks, log_thresh, s=SCREEN_S,
                    kmax=KMAX):
        """codes [B, s] u8 log-quantized err probs (255 = padding/zero);
        depths [B]; ks [B] (>=1); log_thresh [B] = log(sig*MARGIN/bonf).
        Returns candidate mask [B] (True = needs exact confirmation).

        Linear f32 space: each step is pure multiply-add; a p=0 read
        multiplies every cell by (1-p)=1, so padding and rows beyond a
        column's depth map to an exact identity (masked to 0 up front).
        Underflow only shrinks the partial tail, which only adds
        candidates — the safe, conservative direction."""
        B = codes.shape[0]
        kc = jnp.minimum(ks, kmax)
        cell = jnp.arange(kmax + 1)[None, :]
        is_tail = (cell == kc[:, None]).astype(jnp.float32)
        not_beyond = (cell <= kc[:, None]).astype(jnp.float32)
        state0 = jnp.where(cell == 0, 1.0, 0.0).astype(jnp.float32)
        state0 = jnp.broadcast_to(state0, (B, kmax + 1))
        in_depth = jnp.arange(s)[None, :] < depths[:, None]
        # decode arithmetically, NOT via a 256-entry table gather: the
        # gather lowers to scalar loads and measured 4.3ms of the
        # kernel's 4.4ms on v5e (the whole DP scan is 0.02ms) — exp2 on
        # the VPU is effectively free.  f32 exp2 rounds within ~1 ulp of
        # the f64-built table; either decode is a per-element lower-
        # bound approximation whose rounding MARGIN absorbs (see module
        # docstring) — conservativeness does not depend on which.
        cf = codes.astype(jnp.float32)
        probs = jnp.where(codes == 255, 0.0, jnp.exp2(-cf / 8.0))
        p_all = jnp.where(in_depth, probs, 0.0)
        # tie the scan carry to a batch-varying input so shard_map's
        # varying-axis tracking accepts it (same trick as
        # device_call.py's column step)
        state0 = state0 + 0.0 * p_all[:, :1]

        if use_pallas:
            from .pallas_poissbin import tail_device

            tail_val = tail_device(p_all, kc)
        else:
            def step(state, p):
                shifted = jnp.concatenate(
                    [state[:, :1] * 0.0, state[:, :-1]], axis=1)
                adv = shifted * p[:, None]
                std = state * (1.0 - p)[:, None] + adv
                tail = state + adv
                new = (is_tail * tail + (1.0 - is_tail) * std) * not_beyond
                return new, None

            state, _ = jax.lax.scan(step, state0, p_all.T, unroll=16)
            lin_tail = jnp.take_along_axis(state, kc[:, None], axis=1)[:, 0]
            tail_val = jnp.log(jnp.maximum(lin_tail, jnp.float32(1e-37)))
        # candidate if the lower bound is below the (slackened) threshold;
        # K beyond the clipped tail cell can't be ruled out (clipped tail
        # is an upper bound there)
        return (tail_val < log_thresh) | (ks > kmax)

    if mesh is None:
        return partial(jax.jit, static_argnames=("s", "kmax"))(screen_body)

    # multi-device: columns data-parallel over the mesh via shard_map
    # (works for both the XLA scan and the pallas kernel — each shard
    # runs the single-device program on its B/n slice; the mask is
    # per-column, so there is no cross-device communication)
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def build(s=SCREEN_S, kmax=KMAX):
        body = partial(screen_body, s=s, kmax=kmax)
        sm = shard_map(body, mesh=mesh,
                       in_specs=(P("cols"), P("cols"), P("cols"),
                                 P("cols")),
                       out_specs=P("cols"))
        return jax.jit(sm)

    cache = {}

    def screen_sharded(codes, depths, ks, log_thresh, s=SCREEN_S,
                       kmax=KMAX):
        fn = cache.get((s, kmax))
        if fn is None:
            fn = cache[(s, kmax)] = build(s, kmax)
        return fn(codes, depths, ks, log_thresh)

    return screen_sharded


def _bucket(n: int) -> int:
    """Round depth up to a power of two (bounds jit recompiles)."""
    b = 32
    while b < n:
        b *= 2
    return b


def _bucket_b(n: int) -> int:
    """Round batch up to a power of two >= 256 (bounds jit recompiles;
    production chunks are a fixed 4096 so steady state is one shape)."""
    b = 256
    while b < n:
        b *= 2
    return b


def compile_deadline() -> float:
    """Per-shape jit deadline (s).  The axon tunnel's remote Mosaic/XLA
    compile can stall for minutes on some shapes; past the deadline the
    screen degrades (pallas -> xla scan -> off) instead of hanging the
    call (VERDICT r1: depth-300 call blew a 560s budget on compile)."""
    return float(os.environ.get("LOFREQ_TPU_COMPILE_DEADLINE", "300"))


def device_screen_default(wait: bool = False) -> bool:
    """True when an accelerator backend is present AND the host<->device
    link can carry the screen's traffic (the TPU is the engine by default
    on PCIe/ICI-attached chips; CPU-only hosts and thin tunneled links run
    the exact path unless --device-screen forces it).

    The screen ships ~128 B per tested column (top-S u8 log-quantized
    err probs); the gate threshold is calibrated for the *overlapped*
    pipeline (screen RPCs run while the host ingests the next window, see
    pipelines/call_pipeline.py), so only the per-window issue/fetch
    latency that can't hide behind ingest counts against it.

    The probe (jax import + backend discovery + an 8 MB transfer) runs in
    a SUBPROCESS (ops/probe.py) so a sick device service can never hang
    `call` and no thread of this process is ever parked inside the device
    client (a daemon thread there aborts the interpreter at shutdown —
    the round-2 rc=134).  While undecided the engine runs the host path,
    which is always correct — column batches are independent, so later
    batches switching to the screen changes nothing in the output.
    wait=True (the parallel driver, before forking) blocks up to the
    probe deadline so workers inherit a settled decision."""
    override = os.environ.get("LOFREQ_TPU_DEVICE_SCREEN")
    if override is not None:
        return override not in ("0", "false", "no", "off", "")
    global _SCREEN_DEFAULT
    if _SCREEN_DEFAULT is not None:
        return _SCREEN_DEFAULT
    from .probe import probe_device

    wait_s = float(os.environ.get("LOFREQ_TPU_GATE_WAIT_S", "60")) \
        if wait else 0.0
    res = probe_device(wait_s=wait_s)
    if res is None:
        if wait:
            _SCREEN_DEFAULT = False
        return False            # undecided: host path for now
    on = (res["backend"] not in ("cpu", "none")
          and res["bw_mbs"] >= MIN_SCREEN_LINK_MBS)
    if not on and res["backend"] not in ("cpu", "none"):
        log.info(
            "device screen auto-off: host<->device link measured "
            "%.0f MB/s (< %.0f MB/s); the host path is faster on this "
            "link (--device-screen forces it on)", res["bw_mbs"],
            MIN_SCREEN_LINK_MBS)
    _SCREEN_DEFAULT = on
    return on


_SCREEN_DEFAULT = None


# below this the screen's per-column transfer + RPC overhead exceeds the
# host pack+qsort CPU it replaces (see device_screen_default; u8
# quantization cut the per-column bytes 4x, lowering the bar from 200)
MIN_SCREEN_LINK_MBS = 80.0

# links at least this fast indicate a direct-attached chip whose local
# Mosaic compile is seconds — try the pallas screen first there; below
# it the compile service is remote/tunneled and the XLA screen leads
# (_ScreenManager._modes auto ladder)
PALLAS_FIRST_LINK_MBS = 4000.0


def _mode_memo_path() -> str:
    import hashlib
    import tempfile

    key = hashlib.md5((os.environ.get("JAX_PLATFORMS", "") + ":"
                       + str(os.getuid())).encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(),
                        f"lofreq_tpu_screenmode_{key}.json")


def _mode_memo_read() -> int:
    import json
    import time

    try:
        pth = _mode_memo_path()
        age = time.time() - os.stat(pth).st_mtime
        if age > 24 * 3600:
            return 0
        with open(pth) as fh:
            rank = int(json.load(fh).get("rank", 0))
        # two different facts with different lifetimes: pallas->xla
        # (rank 1) is a genuine backend property on tunneled chips — the
        # remote Mosaic compile reliably blows the deadline — and keeps
        # the 24h TTL; fully-OFF (rank >= 2) is usually transient host
        # contention stalling the XLA compile RPC, so after 30 min retry
        # from the xla rung instead of staying dark for a day
        if rank >= 2 and age > 1800:
            return 1
        return rank
    except Exception:
        return 0


def _mode_memo_write(rank: int) -> None:
    import json

    if os.environ.get("LOFREQ_TPU_GATE_CACHE", "1") == "0":
        return
    try:
        pth = _mode_memo_path()
        tmp = pth + f".tmp{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(dict(rank=rank), fh)
        os.replace(tmp, pth)
    except Exception:
        pass


class _ScreenManager:
    """Compiles screens per (B, s) bucket under a deadline, degrading
    pallas -> xla -> off on stalls — WITHOUT ever giving up on a compile
    that is still running.  Tunneled remote compiles are wildly variable
    (the same (4096,128) program measured 30s and 300s+ within minutes on
    the dev tunnel), so a blown deadline means "run the host path FOR
    NOW": the in-flight compile future is kept, every later get() polls
    it, and the screen comes alive mid-run the moment the compile lands
    (column batches are independent; late adoption changes no output).
    Only a compile that FAILS advances the degrade rank, and at most one
    compile is in flight at a time — two concurrent compiles queue
    behind each other in the remote service and the second blows its
    deadline on pure queueing (observed on the r4 bench).  A compile
    still pending after HARD_ABANDON_S is treated as failed.  The
    degrade RANK is memoized machine-wide (TTL file) so the next process
    skips a rung this machine's service already proved pathological."""

    HARD_ABANDON_S = 900.0

    def __init__(self):
        self._fns = {}  # (B, s) -> jitted fn
        self._mode_rank = None  # resolved lazily (index into modes)
        # at most one in-flight compile: (key, mode_rank, future, t0)
        self._inflight = None
        import threading

        self._lock = threading.RLock()

    def _modes(self):
        import jax

        if jax.default_backend() == "cpu":
            # pallas interpret mode is far slower than the XLA scan
            return ["xla"]
        forced = os.environ.get("LOFREQ_TPU_SCREEN_MODE", "auto").lower()
        if forced == "pallas":
            return ["pallas", "xla"]
        if forced == "xla":
            return ["xla"]
        if forced == "off":
            return []
        # auto: on tunneled/thin links the remote Mosaic (pallas) compile
        # is the pathological one — the SAME (4096,128) kernel measured
        # 30s and 600s+ within minutes, and it hogs the single in-flight
        # compile slot that the reliable XLA screen needs (r4 bench: 600s
        # spent waiting on pallas, screen never went live).  The XLA scan
        # compiles dependably AND its executable lands in the persistent
        # compile cache, so thin links run it first; direct-attached
        # chips (fat link, local compile service) try pallas first.
        from .probe import probe_device

        res = probe_device(wait_s=0.0)
        if res is not None and res.get("bw_mbs", 0.0) >= PALLAS_FIRST_LINK_MBS:
            return ["pallas", "xla"]
        return ["xla"]

    def _submit(self, key, modes):
        """Start compiling `key` at the current rank (no wait)."""
        B, s = key
        _jax, jnp = _get_jax()
        mesh = _local_mesh()
        mode = modes[self._mode_rank]
        fn = _build_screen_fn(use_pallas=(mode == "pallas"), mesh=mesh)

        def _warm():
            # dtypes MUST match screen_candidates' real call exactly:
            # a signature mismatch would retrace outside this deadline
            codes = jnp.full((B, s), 255, jnp.uint8)
            depths = jnp.zeros(B, jnp.int32)
            ks = jnp.ones(B, jnp.int32)
            lt = jnp.zeros(B, jnp.float32)
            np.asarray(fn(codes, depths, ks, lt, s=s))
            return fn

        import time
        from concurrent.futures import ThreadPoolExecutor

        ex = ThreadPoolExecutor(1)
        fut = ex.submit(_warm)
        ex.shutdown(wait=False)
        self._inflight = (key, self._mode_rank, fut, time.time())
        return fut

    def _adopt_or_degrade(self, modes, fut):
        """Resolve a finished (or hard-stale) in-flight compile.  Returns
        the adopted fn, or None if still pending / degraded.  Caller holds
        the lock; idempotent — a stale fut (already resolved by another
        thread) is a no-op."""
        import time

        if self._inflight is None or self._inflight[2] is not fut:
            return None
        key, rank, fut, t0 = self._inflight
        if not fut.done():
            if time.time() - t0 < self.HARD_ABANDON_S:
                return None
            # stuck beyond any reasonable queueing: treat as failed FOR
            # THIS PROCESS (the thread is abandoned; a success after this
            # point is ignored).  No machine-wide memo write: one
            # pathologically slow — but ultimately fine — remote compile
            # must not blind every process on the box for the TTL; the
            # memo is reserved for compiles that genuinely FAIL.
            log.warning(
                "device screen: %s compile for shape %s still pending "
                "after %ds; abandoning", modes[rank], key,
                int(self.HARD_ABANDON_S))
            self._inflight = None
            if rank == self._mode_rank:
                self._mode_rank += 1
            return None
        self._inflight = None
        try:
            got = fut.result()
            self._fns[key] = got
            return got
        except Exception as e:
            log.warning(
                "device screen: %s compile failed (%s); degrading",
                modes[rank], e)
            if rank == self._mode_rank:
                self._mode_rank += 1
                _mode_memo_write(self._mode_rank)
            return None

    def get(self, B: int, s: int, wait_s: float = None):
        """Compiled screen fn for (B, s), or None (not available yet /
        degraded — the host path covers those columns either way).

        wait_s: block up to this long for the compile (warm-up callers,
        e.g. bench/screen_ready, pass a generous budget so timed runs
        start with a live screen); None = the per-rung deadline for a
        fresh submit, a non-blocking poll for an in-flight one.

        Locking: the manager lock guards only state transitions; the
        blocking future waits happen OUTSIDE it, so a concurrent
        dispatcher polling get() falls straight through to the host path
        instead of queueing behind a warm-up caller's long wait."""
        from concurrent.futures import TimeoutError as _TO

        while True:
            with self._lock:
                fn = self._fns.get((B, s))
                if fn is not None:
                    return fn
                modes = self._modes()
                if self._mode_rank is None:
                    # the memoized degrade rank only transfers between
                    # processes with the same mode ladder (accelerator
                    # backends); the cpu test ladder is a different list,
                    # and tests pin the gate cache off anyway
                    self._mode_rank = (_mode_memo_read()
                                       if len(modes) > 1 and os.environ.get(
                                           "LOFREQ_TPU_GATE_CACHE",
                                           "1") != "0"
                                       else 0)
                if self._inflight is not None:
                    key_i, _rank_i, fut, _t0 = self._inflight
                    budget = wait_s if wait_s else 0.0
                    fresh = False
                elif self._mode_rank >= len(modes):
                    return None  # fully degraded: screen off
                else:
                    mode = modes[self._mode_rank]
                    key_i = (B, s)
                    fut = self._submit((B, s), modes)
                    # first-try budget: locally-attached chips compile in
                    # seconds, so a short wait catches them (and warm
                    # disk-cache hits); tunneled remote compiles can take
                    # minutes and ADOPT LATE instead of stalling a
                    # production call — warm-up callers (bench/
                    # screen_ready) pass wait_s to block through the
                    # whole compile deliberately
                    budget = wait_s if wait_s else min(compile_deadline(),
                                                       10.0)
                    fresh = True
            if budget:
                try:
                    fut.exception(timeout=budget)
                except _TO:
                    if fresh:
                        log.warning(
                            "device screen: %s compile for shape "
                            "(%d, %d) still running after %ds; running "
                            "the host path until it lands", mode, B, s,
                            int(budget))
            with self._lock:
                got = self._adopt_or_degrade(modes, fut)
                pending = (self._inflight is not None
                           and self._inflight[2] is fut)
                if got is None and self._inflight is None:
                    # resolved by us or another thread: reassess from the
                    # top (the fn may be in _fns now, or a rung dropped)
                    continue
            if got is not None and key_i == (B, s):
                return got
            if pending:
                # still compiling: host path for now, poll next call
                return None
            # adopted a different key's fn or lost a race: reassess


_manager = _ScreenManager()

# real dispatch accounting: "did the device screen actually run during
# this process" — the stage timer can't tell (the stage wraps the call
# even when it returns None instantly).  bench.py reports these.
DISPATCH_STATS = {"dispatched": 0, "unavailable": 0}


def screen_ready(B: int = 4096, s: int = None, wait_s: float = None) -> bool:
    """True when the production screen shape is compiled and live (the
    manager compiles it under the deadline on first ask).  The device-BAQ
    screening mode REQUIRES this: with no screen, every alt column
    becomes an exact-confirm candidate and the mode degenerates into a
    slower exact pass — callers must fall back to the plain exact path
    instead (call_pipeline.run_call).

    wait_s: warm-up callers (bench) pass a generous blocking budget so
    their timed runs start with a live screen; the remote compile's
    latency is wildly variable and a soft deadline miss otherwise just
    means the first windows run the host path (late adoption)."""
    import jax

    if s is None:
        s = TOP_S
    if jax.default_backend() == "cpu":
        B = _bucket_b(min(B, 1024))
        s = min(s, TOP_S)
    return _manager.get(B, s, wait_s=wait_s) is not None


def screen_dispatch(probs, depths, ks, bonf, sig):
    """Pack + quantize + ISSUE the device screen for one chunk; returns
    an opaque handle for screen_fetch, or None (screen unavailable —
    treat every column as candidate).

    JAX dispatch is asynchronous: the returned mask is a device array
    whose transfer/compute overlaps whatever the host does next — the
    call pipeline issues chunk N+1's screen before fetching chunk N's
    (call_snvs_batch), so device latency hides behind the exact DP.

    Deep columns are screened from their TOP-S largest err probs only:
    the Poisson-binomial tail over ANY subset of a column's reads is a
    lower bound of the full tail, so a subset bound that already exceeds
    the threshold proves insignificance — and the largest probs carry
    virtually all of the tail mass, so the bound stays sharp.  This keeps
    the host->device transfer at S u8 codes per column regardless of
    depth; the codes are log-quantized with conservative rounding (see
    _build_screen_fn).  B and S are padded to buckets so jit compiles
    are bounded; if compilation blows the deadline the screen degrades
    and every column is marked candidate."""
    _jax, jnp = _get_jax()
    B, D = probs.shape
    s = min(_bucket(D), TOP_S)
    Bp = _bucket_b(B)
    if _jax.default_backend() != "cpu":
        # one compile shape total on real accelerators: remote compiles
        # cost minutes, padding costs microseconds (top-S rows are 512 B)
        s = TOP_S
        Bp = max(Bp, 4096)
    fn = _manager.get(Bp, s)
    if fn is None:
        DISPATCH_STATS["unavailable"] += 1
        return None
    DISPATCH_STATS["dispatched"] += 1
    prefix = np.full((Bp, s), 2.0, dtype=np.float64)
    depths_p = np.zeros(Bp, dtype=np.int32)
    if D > s:
        # top-S per row; padding/invalid (>1.0) mapped to 0.0 first (an
        # exact DP identity) so it can never crowd out real probs.  The
        # selected row order is arbitrary, so every slot is "in depth"
        # (zeros are identities).
        in_depth = np.arange(D)[None, :] < np.asarray(depths)[:, None]
        arr = np.where((probs <= 1.0) & in_depth, probs, 0.0)
        prefix[:B] = np.partition(arr, D - s, axis=1)[:, D - s:]
        depths_p[:B] = s
    else:
        prefix[:B, :D] = probs
        depths_p[:B] = depths
    # u8 log-quantization (see _build_screen_fn): ceil rounds the code up
    # so its decode is <= p — the conservative direction; p<=0, the 2.0
    # padding AND probs below the smallest representable code (clipping
    # them up to code 254 would OVERstate them) all map to the identity
    # code 255 (= 0.0, which only understates)
    with np.errstate(divide="ignore", invalid="ignore"):
        lg = np.ceil(-np.log2(np.maximum(prefix, 1e-300)) * 8.0)
    codes = np.where((prefix <= 0.0) | (prefix > 1.0) | (lg > 254), 255,
                     np.clip(lg, 0, 254)).astype(np.uint8)
    ks_p = np.ones(Bp, dtype=np.int32)
    ks_p[:B] = np.maximum(np.asarray(ks, dtype=np.int32), 1)
    bonf = np.broadcast_to(np.asarray(bonf, dtype=np.float64), (B,))
    log_thresh = np.full(Bp, np.float32(np.log(sig * MARGIN)))
    log_thresh[:B] = np.log(sig * MARGIN / bonf).astype(np.float32)
    mask = fn(
        jnp.asarray(codes), jnp.asarray(depths_p), jnp.asarray(ks_p),
        jnp.asarray(log_thresh), s=s,
    )
    return (mask, B)


def screen_fetch(handle) -> np.ndarray:
    """Blocking fetch of a screen_dispatch handle's candidate mask."""
    mask, B = handle
    return np.asarray(mask)[:B]


def host_screen_tail(probs, depths, ks, bonf, sig) -> np.ndarray:
    """Host (numpy f64) mirror of the device screen's clipped-K partial
    tail DP: True = candidate (needs the exact DP).  Same semantics as
    screen_body — top-S largest err probs per row (subset tail = lower
    bound of the full tail), K clipped to KMAX (a clipped tail can rule
    nothing out beyond it), same MARGIN slack — minus the u8
    quantization (f64 here, and no link to cross).

    This is the fallback engine when the device screen is unavailable
    (compile still in flight, thin link, no accelerator): without it,
    every top-k-prescreen survivor lands on the exact confirm pass
    (measured 10x confirm blow-up on a dark-screen bench run).  It only
    ever sees prescreen survivors, so B is small."""
    probs = np.asarray(probs, dtype=np.float64)
    B, D = probs.shape
    if B == 0:
        return np.ones(0, dtype=bool)
    ks = np.asarray(ks, dtype=np.int64)
    kc = np.minimum(np.maximum(ks, 1), KMAX)
    in_depth = np.arange(D)[None, :] < np.asarray(depths)[:, None]
    arr = np.where((probs <= 1.0) & in_depth, probs, 0.0)
    s = min(D, TOP_S)
    if D > s:
        arr = np.partition(arr, D - s, axis=1)[:, D - s:]
    cell = np.arange(KMAX + 1)[None, :]
    is_tail = cell == kc[:, None]
    not_beyond = cell <= kc[:, None]
    state = np.zeros((B, KMAX + 1))
    state[:, 0] = 1.0
    for j in range(arr.shape[1]):
        p = arr[:, j][:, None]
        shifted = np.concatenate([np.zeros((B, 1)), state[:, :-1]], axis=1)
        adv = shifted * p
        tail = state + adv
        state = np.where(is_tail, tail, state * (1.0 - p) + adv)
        state *= not_beyond
    lin_tail = state[np.arange(B), kc]
    thresh = np.float64(sig) * MARGIN / np.asarray(bonf, dtype=np.float64)
    return (lin_tail < thresh) | (ks > KMAX)


def screen_candidates(probs, depths, ks, bonf, sig) -> np.ndarray:
    """Synchronous wrapper: dispatch + fetch in one call."""
    handle = screen_dispatch(probs, depths, ks, bonf, sig)
    if handle is None:
        return np.ones(probs.shape[0], dtype=bool)
    return screen_fetch(handle)


# -- code-native screening (csrc/screen_pack.c) -------------------------
#
# The fused sweep's CSR f32 probs are quantized/top-S-selected in C —
# per column, sorted ascending, 255-padded — so the whole screening
# front-end (prescreen bound + device/host sub-screen) runs on u8 codes
# with no per-chunk numpy partition/quantize pass at all.

LN2_8 = float(np.log(2.0)) / 8.0


def screen_codes_for(flat_probs, starts, cols) -> np.ndarray | None:
    """[len(cols), TOP_S] u8 top-S codes via the native kernel, or None
    when the native lib is unavailable (callers use the prob path).

    flat_probs may be f32 probs (quantize + counting select) or a
    pre-quantized u8 code CSR straight from the fused sweep
    (screen_flat==2 — pure counting select, the cheapest path)."""
    import ctypes

    if flat_probs.dtype not in (np.float32, np.uint8):
        return None
    try:
        from .._native_build import get_native_lib

        lib = get_native_lib()
    except Exception:
        return None
    n = len(cols)
    out = np.empty((n, TOP_S), np.uint8)
    if n == 0:
        return out
    flat = np.ascontiguousarray(flat_probs)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    nthreads = int(os.environ.get("LOFREQ_NATIVE_THREADS",
                                  min(4, os.cpu_count() or 1)))
    i64p = ctypes.POINTER(ctypes.c_int64)
    if flat.dtype == np.uint8:
        lib.lfq_screen_codes_u8(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            starts.ctypes.data_as(i64p), cols.ctypes.data_as(i64p),
            ctypes.c_int64(n), ctypes.c_int32(TOP_S),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int32(nthreads))
    else:
        lib.lfq_screen_codes(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            starts.ctypes.data_as(i64p), cols.ctypes.data_as(i64p),
            ctypes.c_int64(n), ctypes.c_int32(TOP_S),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int32(nthreads))
    return out


def prescreen_codes(codes, ks, bonf, sig,
                    topk_max: int = 64) -> np.ndarray:
    """Top-k product lower bound straight from the codes: the product of
    the k largest decoded probs is exp(-(ln2/8) * sum of the k smallest
    codes) — an integer cumsum instead of a partition+log pass.  Decodes
    are <= the true probs, so the bound is a lower bound of the true
    top-k product, itself a lower bound of the Poisson-binomial tail:
    discarding on (bound * bonf > sig) is provably output-identical
    (same argument as caller._topk_prescreen; the 0.5 slack is kept for
    uniformity although the code sum is exact integer math).  Rows with
    ks outside [1, topk_max] or whose k-th code is padding (255 = a
    zero prob: the bound degenerates) are kept.  Returns keep mask."""
    B = codes.shape[0]
    if B == 0:
        return np.ones(0, bool)
    ks = np.asarray(ks, dtype=np.int64)
    kmax = int(min(max(int(ks.max(initial=1)), 1), topk_max))
    csum = np.cumsum(codes[:, :kmax].astype(np.int64), axis=1)
    k_idx = np.clip(np.minimum(ks, kmax) - 1, 0, kmax - 1)
    rows = np.arange(B)
    code_sum = csum[rows, k_idx]
    kth = codes[rows, k_idx]
    lb_log = -LN2_8 * code_sum.astype(np.float64)
    bounded = (ks >= 1) & (ks <= topk_max) & (kth < 255)
    with np.errstate(divide="ignore"):
        discard = bounded & (
            lb_log + np.log(np.asarray(bonf, dtype=np.float64))
            + np.log(0.5) > np.log(np.float64(sig)))
    return ~discard


def screen_dispatch_codes(codes, ks, bonf, sig):
    """screen_dispatch for pre-quantized top-S codes: no partition, no
    quantize — pad to the production (Bp, TOP_S) bucket and issue.  The
    255 padding decodes to 0.0 (a DP identity), so depths are simply S
    for every row.  Returns an opaque handle for screen_fetch, or None
    (screen unavailable)."""
    _jax, jnp = _get_jax()
    B, s0 = codes.shape
    s = TOP_S
    Bp = _bucket_b(B)
    if _jax.default_backend() != "cpu":
        Bp = max(Bp, 4096)
    fn = _manager.get(Bp, s)
    if fn is None:
        DISPATCH_STATS["unavailable"] += 1
        return None
    DISPATCH_STATS["dispatched"] += 1
    codes_p = np.full((Bp, s), 255, dtype=np.uint8)
    codes_p[:B, :s0] = codes
    depths_p = np.full(Bp, s, dtype=np.int32)
    ks_p = np.ones(Bp, dtype=np.int32)
    ks_p[:B] = np.maximum(np.asarray(ks, dtype=np.int32), 1)
    bonf = np.broadcast_to(np.asarray(bonf, dtype=np.float64), (B,))
    log_thresh = np.full(Bp, np.float32(np.log(sig * MARGIN)))
    log_thresh[:B] = np.log(sig * MARGIN / bonf).astype(np.float32)
    mask = fn(
        jnp.asarray(codes_p), jnp.asarray(depths_p), jnp.asarray(ks_p),
        jnp.asarray(log_thresh), s=s,
    )
    return (mask, B)


def host_screen_tail_codes(codes, ks, bonf, sig) -> np.ndarray:
    """Host fallback of the code sub-screen: the same clipped-K partial
    tail DP as host_screen_tail, over the decoded codes (f64)."""
    dec = np.zeros(256)
    dec[:255] = np.exp2(-np.arange(255, dtype=np.float64) / 8.0)
    return host_screen_tail(dec[codes], np.full(codes.shape[0],
                                                codes.shape[1]),
                            ks, bonf, sig)
