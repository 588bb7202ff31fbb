"""_ScreenManager behavior under stalled / failing compiles.

The manager must (a) never block a concurrent dispatcher behind a
warm-up caller's long wait (the lock is released around future waits),
(b) bound every caller's wait by its own budget even when the compile
never finishes, and (c) not poison the machine-wide degrade memo on a
hard-abandoned (still-running) compile — the memo is for genuine
failures only.
"""

import threading
import time
from concurrent.futures import Future

import pytest

from lofreq_tpu.ops import screen as S


class _StubManager(S._ScreenManager):
    """Manager whose submits return a controllable Future instead of
    launching a real jit compile."""

    def __init__(self, modes=("stub",)):
        super().__init__()
        self._stub_modes = list(modes)
        self.futures = []

    def _modes(self):
        return self._stub_modes

    def _submit(self, key, modes):
        fut = Future()
        self.futures.append(fut)
        self._inflight = (key, self._mode_rank, fut, time.time())
        return fut


def test_never_finishing_compile_bounds_the_wait():
    m = _StubManager()
    t0 = time.time()
    assert m.get(256, 32, wait_s=0.3) is None
    assert time.time() - t0 < 2.0
    # subsequent non-blocking polls return immediately, still None
    t0 = time.time()
    assert m.get(256, 32) is None
    assert time.time() - t0 < 0.2


def test_concurrent_poll_not_blocked_by_long_wait():
    m = _StubManager()
    started = threading.Event()
    waited = []

    def warmer():
        started.set()
        m.get(256, 32, wait_s=3.0)

    th = threading.Thread(target=warmer, daemon=True)
    th.start()
    started.wait()
    time.sleep(0.1)  # warmer is inside its future wait, lock released
    t0 = time.time()
    assert m.get(256, 32) is None  # dispatcher poll: instant host path
    waited.append(time.time() - t0)
    assert waited[0] < 0.5, "dispatcher blocked behind warm-up wait"
    m.futures[0].set_result(lambda *a, **k: None)
    th.join(timeout=5)
    assert m.get(256, 32) is not None


def test_late_adoption_after_budget_miss():
    m = _StubManager()
    assert m.get(256, 32, wait_s=0.1) is None
    m.futures[0].set_result(lambda *a, **k: "fn")
    assert m.get(256, 32)(None) == "fn"


def test_hard_abandon_degrades_without_memo_write(monkeypatch):
    monkeypatch.setenv("LOFREQ_TPU_COMPILE_DEADLINE", "0.05")
    writes = []
    monkeypatch.setattr(S, "_mode_memo_write", lambda r: writes.append(r))
    m = _StubManager(modes=["stub-a", "stub-b"])
    m.HARD_ABANDON_S = 0.05
    assert m.get(256, 32, wait_s=0.01) is None
    time.sleep(0.1)
    # next poll hard-abandons the stuck compile: rank advances in this
    # process (and the next rung is submitted), but the machine-wide
    # memo must NOT record a compile that might still succeed
    m.get(256, 32)
    assert m._mode_rank >= 1
    assert writes == []


def test_failed_compile_degrades_and_memoizes(monkeypatch):
    writes = []
    monkeypatch.setattr(S, "_mode_memo_write", lambda r: writes.append(r))
    m = _StubManager(modes=["stub-a", "stub-b"])
    fut_holder = m.get(256, 32, wait_s=0.05)
    assert fut_holder is None
    m.futures[0].set_exception(RuntimeError("boom"))
    m.get(256, 32)  # adopts the failure, degrades, resubmits rung 2
    assert m._mode_rank >= 1
    assert writes == [1]


def test_screen_mode_env_forces_ladder(monkeypatch):
    jax = pytest.importorskip("jax")
    m = S._ScreenManager()
    if jax.default_backend() == "cpu":
        assert m._modes() == ["xla"]  # env can't add pallas on cpu
        return
    monkeypatch.setenv("LOFREQ_TPU_SCREEN_MODE", "xla")
    assert m._modes() == ["xla"]
    monkeypatch.setenv("LOFREQ_TPU_SCREEN_MODE", "pallas")
    assert m._modes() == ["pallas", "xla"]
    monkeypatch.setenv("LOFREQ_TPU_SCREEN_MODE", "off")
    assert m._modes() == []
