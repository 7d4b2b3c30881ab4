"""Device-health watchdog (runtime/watchdog.py + engine integration).

VERDICT r4 next #2: CLAUDE.md documents the TPU tunnel dying for hours;
these tests inject hanging/failing fake probes and a hanging fake
dispatch and assert the server degrades to fast 503s + an honest,
non-blocking /health, then auto-recovers. No reference analog — its
/health is a static dict (reference server.py:172-180)."""

import json
import threading
import time
import urllib.error
import urllib.request

import pytest

from qwen_image_edit_streamdiffusion_tpu.runtime.engine import (
    InferenceEngine,
)
from qwen_image_edit_streamdiffusion_tpu.runtime.watchdog import (
    DeviceUnavailable,
    DeviceWatchdog,
    default_probe,
)
from qwen_image_edit_streamdiffusion_tpu.serving.server import make_server


def _wait_until(cond, timeout=10.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if cond():
            return True
        time.sleep(0.02)
    return False


def test_default_probe_runs_on_cpu():
    info = default_probe()
    assert "bytes_in_use" in info  # may be None on CPU backend


def test_probe_deadline_marks_unhealthy_then_recovers():
    gate = threading.Event()
    calls = []

    def probe():
        calls.append(time.monotonic())
        gate.wait(30)  # simulate a wedged tunnel until released
        return {"bytes_in_use": 123}

    wd = DeviceWatchdog(interval=600, deadline=0.2, probe_fn=probe).start()
    try:
        assert wd.probe_now() is False
        assert wd.ok is False
        assert "deadline" in wd.reason
        with pytest.raises(DeviceUnavailable):
            wd.require_healthy()
        # a second probe while the first is stuck does NOT stack another
        # probe; it keeps observing the stuckness
        assert wd.probe_now() is False
        assert len(calls) == 1
        gate.set()  # link recovers: stuck probe finishes
        assert _wait_until(lambda: wd._probe_done.is_set())
        assert wd.probe_now() is True
        assert wd.ok and wd.reason is None
        assert wd.memory_stats == {"bytes_in_use": 123}
        wd.require_healthy()  # no raise
    finally:
        gate.set()
        wd.stop()


def test_probe_exception_marks_unhealthy():
    state = {"fail": True}

    def probe():
        if state["fail"]:
            raise RuntimeError("UNAVAILABLE: socket closed")
        return {}

    wd = DeviceWatchdog(interval=600, deadline=1.0, probe_fn=probe).start()
    try:
        assert wd.probe_now() is False
        assert "UNAVAILABLE" in wd.reason
        st = wd.status()
        assert st["device_ok"] is False and st["probe_failures"] == 1
        state["fail"] = False
        assert wd.probe_now() is True
        assert wd.status()["probe_failures"] == 0
    finally:
        wd.stop()


class _HangingPipeline:
    """Fake pipeline whose dispatch blocks until released — the injected
    'device wedged mid-request' from VERDICT r4 next #2."""

    def __init__(self):
        self.gate = threading.Event()
        self.calls = 0

    def __call__(self, *a, **kw):
        self.calls += 1
        if not self.gate.wait(30):
            raise RuntimeError("test hang never released")
        import types

        from qwen_image_edit_streamdiffusion_tpu.core import imaging

        return types.SimpleNamespace(
            images=[imaging.make_test_image(8, 8, "gray")])


def _wedged_engine():
    """Engine with a hanging pipeline + a watchdog whose probe also hangs
    while the 'device' is wedged (single accelerator: a real probe would
    queue behind the hung dispatch)."""
    pipe = _HangingPipeline()

    def probe():
        if not pipe.gate.wait(30):
            raise RuntimeError("probe hang never released")
        return {"bytes_in_use": 7}

    eng = InferenceEngine(pipeline=pipe, input_size=8, default_steps=2)
    eng.watchdog = DeviceWatchdog(
        interval=0.1, deadline=0.3, dispatch_deadline=0.5,
        probe_fn=probe, busy_since=lambda: eng._dispatch_start,
    ).start()
    return eng, pipe


def _b64_image():
    from qwen_image_edit_streamdiffusion_tpu.core import imaging

    return imaging.pil_to_base64(imaging.make_test_image(8, 8, "gradient"))


def test_wedged_dispatch_degrades_then_recovers():
    eng, pipe = _wedged_engine()
    try:
        req = {"image": _b64_image(), "prompt": "x"}
        t = threading.Thread(target=lambda: eng.edit(dict(req)),
                             daemon=True)
        t.start()
        assert _wait_until(lambda: pipe.calls == 1)
        # dispatch overruns its deadline → watchdog flips unhealthy fast
        assert _wait_until(lambda: not eng.watchdog.ok, timeout=5)
        # either detection path is correct: the overrun check or the
        # probe hanging behind the wedged dispatch — whichever fired first
        assert ("dispatch" in eng.watchdog.reason
                or "deadline" in eng.watchdog.reason)
        # new requests fast-fail instead of 429/hanging
        t0 = time.monotonic()
        with pytest.raises(DeviceUnavailable):
            eng.edit(dict(req))
        assert time.monotonic() - t0 < 1.0
        # health() answers instantly and honestly, without a device query
        t0 = time.monotonic()
        h = eng.health()
        assert time.monotonic() - t0 < 0.5
        assert h["status"] == "degraded" and h["device_ok"] is False
        # device recovers: hung dispatch completes, probe succeeds
        pipe.gate.set()
        t.join(10)
        assert _wait_until(lambda: eng.watchdog.ok, timeout=5)
        resp = eng.edit(dict(req))
        assert resp["status"] == "success"
        assert eng.health()["status"] == "ok"
        assert eng.health()["device_ok"] is True
    finally:
        pipe.gate.set()
        eng.watchdog.stop()


def test_queued_request_unblocks_when_device_wedges():
    """A request already BLOCKED on the lock (queue semantics) must bail
    out with 503 when the watchdog flips — not wait forever behind the
    wedged dispatch (the round-4 failure mode)."""
    eng, pipe = _wedged_engine()
    eng.queue_requests = True
    errs = []
    try:
        req = {"image": _b64_image(), "prompt": "x"}
        t1 = threading.Thread(target=lambda: eng.edit(dict(req)),
                              daemon=True)
        t1.start()
        assert _wait_until(lambda: pipe.calls == 1)

        def second():
            try:
                eng.edit(dict(req))
            except BaseException as e:  # noqa: BLE001
                errs.append(e)

        t2 = threading.Thread(target=second, daemon=True)
        t2.start()
        t2.join(10)
        assert not t2.is_alive(), "queued request stayed wedged"
        assert errs and isinstance(errs[0], DeviceUnavailable)
    finally:
        pipe.gate.set()
        eng.watchdog.stop()


def test_http_503_and_health_while_wedged():
    eng, pipe = _wedged_engine()
    srv = make_server(eng, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}"
    try:
        req = {"image": _b64_image(), "prompt": "x"}

        def post():
            data = json.dumps(req).encode()
            r = urllib.request.Request(
                url + "/edit", data=data,
                headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(r, timeout=30).read()
            except Exception:  # noqa: BLE001 — hung/failed is fine here
                pass

        threading.Thread(target=post, daemon=True).start()
        assert _wait_until(lambda: pipe.calls == 1)
        assert _wait_until(lambda: not eng.watchdog.ok, timeout=5)
        # /health stays responsive and honest
        with urllib.request.urlopen(url + "/health", timeout=2) as r:
            h = json.loads(r.read())
        assert h["status"] == "degraded" and h["device_ok"] is False
        assert h["last_probe_ms"] is None or h["last_probe_ms"] >= 0
        # new /edit → fast 503
        data = json.dumps(req).encode()
        r2 = urllib.request.Request(
            url + "/edit", data=data,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(r2, timeout=5)
        assert ei.value.code == 503
        assert "unhealthy" in json.loads(ei.value.read())["detail"]
    finally:
        pipe.gate.set()
        eng.watchdog.stop()
        srv.shutdown()


def test_dynamic_batch_queue_unblocks_when_device_wedges():
    """Same guarantee under --dynamic-batch: queued followers must not
    strand behind a wedged leader."""
    from qwen_image_edit_streamdiffusion_tpu.core import imaging

    pipe = _HangingPipeline()

    def edit_many(items, **kw):
        pipe.calls += 1
        if not pipe.gate.wait(30):
            raise RuntimeError("never released")
        import types

        return [types.SimpleNamespace(
            images=[imaging.make_test_image(8, 8, "gray")])
            for _ in items]

    pipe.edit_many = edit_many
    eng = InferenceEngine(pipeline=pipe, input_size=8, default_steps=2,
                          dynamic_batch=4)
    eng.watchdog = DeviceWatchdog(
        interval=0.1, deadline=0.3, dispatch_deadline=0.5,
        probe_fn=lambda: (pipe.gate.wait(30) and {}) or {},
        busy_since=lambda: eng._dispatch_start,
    ).start()
    errs = []
    try:
        req = {"image": _b64_image(), "prompt": "x"}
        t1 = threading.Thread(target=lambda: eng.edit(dict(req)),
                              daemon=True)
        t1.start()
        assert _wait_until(lambda: pipe.calls == 1)

        def second():
            try:
                eng.edit(dict(req))
            except BaseException as e:  # noqa: BLE001
                errs.append(e)

        t2 = threading.Thread(target=second, daemon=True)
        t2.start()
        t2.join(10)
        assert not t2.is_alive(), "dynamic-batch follower stayed wedged"
        assert errs and isinstance(errs[0], DeviceUnavailable)
        # queue must not retain the abandoned entry
        assert eng._batch_queue == []
    finally:
        pipe.gate.set()
        eng.watchdog.stop()
