"""Engine single-flight semantics under real thread races + bench suite
smoke."""

import threading

import pytest

from qwen_image_edit_streamdiffusion_tpu.core import imaging
from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import EditPipeline
from qwen_image_edit_streamdiffusion_tpu.runtime.engine import (
    EngineBusy,
    InferenceEngine,
)

TINY_STREAM = StreamConfig(
    width=64, height=64, vae_image_area=64 * 64, vl_image_area=32 * 32,
    num_inference_steps=1, model_preset="tiny",
)


def test_concurrent_edits_exactly_one_winner():
    pipe = EditPipeline.create("tiny", config=TINY_STREAM, seed=0)
    engine = InferenceEngine(pipeline=pipe, input_size=64, default_steps=1)
    b64 = imaging.pil_to_base64(imaging.make_test_image(64, 64, "gray"))
    engine.edit({"image": b64})  # compile first

    n = 6
    barrier = threading.Barrier(n)
    results = []

    def worker():
        barrier.wait()
        try:
            engine.edit({"image": b64, "prompt": "race"})
            results.append("ok")
        except EngineBusy:
            results.append("busy")

    threads = [threading.Thread(target=worker) for _ in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # the atomic claim admits at least one winner and rejects the rest
    # (no corrupted state, no double execution)
    assert results.count("ok") >= 1
    assert results.count("ok") + results.count("busy") == n
    assert engine.total_requests == 1 + results.count("ok")


def test_bench_suite_entrypoints_run():
    from qwen_image_edit_streamdiffusion_tpu.benchmarks import suite

    suite.main(["compiled", "--preset", "tiny", "--size", "64",
                "--steps", "1", "--runs", "1"])
    suite.main(["cache", "--preset", "tiny", "--size", "64",
                "--steps", "1", "--runs", "1"])


def test_queue_mode_serializes_all():
    pipe = EditPipeline.create("tiny", config=TINY_STREAM, seed=0)
    engine = InferenceEngine(pipeline=pipe, input_size=64, default_steps=1,
                             queue_requests=True)
    b64 = imaging.pil_to_base64(imaging.make_test_image(64, 64, "gray"))
    engine.edit({"image": b64})

    n = 4
    results = []

    def worker():
        engine.edit({"image": b64})
        results.append("ok")

    threads = [threading.Thread(target=worker) for _ in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results.count("ok") == n  # nobody got a 429
    assert engine.total_requests == n + 1


def test_bench_suite_lightning_and_cfg_paths():
    from qwen_image_edit_streamdiffusion_tpu.benchmarks import suite

    args = ["--preset", "tiny", "--size", "64", "--steps", "1", "--runs", "1"]
    suite.main(["lightning_compile"] + args)
    suite.main(["batched_cfg"] + args)
    suite.main(["cfg_quality"] + args)
    import os

    for f in ("cfg_on.png", "cfg_off.png"):
        assert os.path.exists(f)
        os.remove(f)


def test_bench_suite_stream_path():
    from qwen_image_edit_streamdiffusion_tpu.benchmarks import suite

    suite.main(["stream", "--preset", "tiny", "--size", "64",
                "--steps", "1", "--runs", "1"])
    import os

    if os.path.exists("benchmark_output.png"):
        os.remove("benchmark_output.png")


def test_bench_suite_serve_path(capsys):
    """`suite serve` drives the real HTTP wire path (reference field names:
    steps/use_cfg, server.py:43-50) and reports p50/p90 for both modes."""
    from qwen_image_edit_streamdiffusion_tpu.benchmarks import suite

    suite.main(["serve", "--preset", "tiny", "--size", "64",
                "--steps", "1", "--runs", "1"])
    out = capsys.readouterr().out
    # fast + cfg + stream session + pipelined stream session
    assert out.count("p50") == 4
    assert "fast" in out and "cfg" in out
    assert "session" in out and "pipelined" in out


def test_bench_suite_realtime_path(capsys):
    from qwen_image_edit_streamdiffusion_tpu.benchmarks import suite

    suite.main(["realtime", "--preset", "tiny", "--size", "64",
                "--steps", "1", "--runs", "3"])
    out = capsys.readouterr().out
    assert "realtime loop:" in out


def test_warmup_stream_precompiles_session_graphs():
    """warmup_stream compiles the stream-session fused graphs (keyframe +
    temporal) at startup: a session's first requests then add NO new
    jit-cache entries (the cold path measured 168 s of compiles through
    the tunnel)."""
    engine = InferenceEngine.create("tiny", config=TINY_STREAM,
                                    warmup_runs=1, warmup_cfg=False,
                                    warmup_stream=True, input_size=64)
    cache = engine.pipeline._jit_cache
    kinds = {k[1] for k in cache if k[0] == "stream_fused"}
    assert kinds == {"key", "temporal"}
    n_before = len(cache)

    b64 = imaging.pil_to_base64(imaging.make_test_image(64, 64, "gradient"))
    for _ in range(2):  # keyframe, then temporal refine
        resp = engine.edit({"image": b64, "prompt": "warm session",
                            "steps": 1, "stream_session": "s1"})
        assert resp["status"] == "success"
    assert len(cache) == n_before  # both frames hit the warmed graphs


def test_engine_create_input_size_env(monkeypatch):
    """input_size plumbs through create() / QIE_INPUT_SIZE (VERDICT r2
    next #7: the serving input-size convention is configurable, not
    hardcoded)."""
    monkeypatch.setenv("QIE_INPUT_SIZE", "64")
    e1 = InferenceEngine.create("tiny", config=TINY_STREAM, warmup_runs=0,
                                warmup_cfg=False)
    assert e1.input_size == 64  # factory reads the env
    e2 = InferenceEngine.create("tiny", config=TINY_STREAM, warmup_runs=0,
                                warmup_cfg=False, input_size=128)
    assert e2.input_size == 128  # explicit arg wins


def _wait_queue(engine, n, tries=2000):
    import time

    for _ in range(tries):
        with engine._bq_lock:
            if len(engine._batch_queue) >= n:
                return True
        time.sleep(0.005)
    return False


def test_dynamic_batching_coalesces_concurrent_requests():
    """dynamic_batch>1: requests queued behind a busy device coalesce into
    ONE edit_many dispatch (leader/follower). Deterministic: hold the
    device lock while all three enqueue, then release — the first waker
    leads the whole queue."""
    import numpy as np

    from qwen_image_edit_streamdiffusion_tpu.core.imaging import (
        base64_to_pil,
        make_test_image,
        pil_to_base64,
    )

    pipe = EditPipeline.create("tiny", config=TINY_STREAM, seed=0)
    engine = InferenceEngine(pipeline=pipe, input_size=64, default_steps=1,
                             dynamic_batch=4)
    imgs = [pil_to_base64(make_test_image(64, 64, p))
            for p in ("gray", "gradient", "circle")]

    engine._lock.acquire()
    results = {}

    def worker(i):
        results[i] = engine.edit(
            {"image": imgs[i], "prompt": f"style {i}", "seed": i})

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    assert _wait_queue(engine, 3)
    engine._lock.release()
    for t in threads:
        t.join()

    assert all(results[i]["status"] == "success" for i in range(3))
    # exact-bucket selection: 3 queued single-row requests dispatch as
    # 2 coalesced (the 2-bucket) + 1 alone — never padded to the 4-bucket
    bw = sorted(results[i].get("batched_with", 1) for i in range(3))
    assert bw == [1, 2, 2]
    assert engine.total_requests == 3
    arrs = [np.asarray(base64_to_pil(results[i]["image"]), np.int16)
            for i in range(3)]
    assert np.abs(arrs[0] - arrs[1]).max() > 0  # per-row conditioning
    assert np.abs(arrs[1] - arrs[2]).max() > 0


def test_dynamic_batching_stream_frames_queue_not_429():
    """With dynamic batching on, the wire has queue semantics — a
    stream_session frame arriving while the device is busy must wait for
    the lock like the coalesced plain edits do, not bounce with 429."""
    from qwen_image_edit_streamdiffusion_tpu.core.imaging import (
        make_test_image,
        pil_to_base64,
    )

    pipe = EditPipeline.create("tiny", config=TINY_STREAM, seed=0)
    engine = InferenceEngine(pipeline=pipe, input_size=64, default_steps=1,
                             dynamic_batch=4)
    b64 = pil_to_base64(make_test_image(64, 64, "gray"))

    engine._lock.acquire()
    results = {}

    def worker():
        try:
            results["r"] = engine.edit(
                {"image": b64, "stream_session": "s1", "steps": 1})
        except EngineBusy as exc:
            results["r"] = exc

    t = threading.Thread(target=worker)
    t.start()
    t.join(timeout=0.3)
    assert t.is_alive(), "stream frame should be queued on the busy lock"
    engine._lock.release()
    t.join()
    assert isinstance(results["r"], dict)
    assert results["r"]["status"] == "success"
    assert results["r"]["stream_session"] == "s1"


def test_dynamic_batching_incompatible_keys_split():
    """Requests with different compatibility keys (here: steps) never share
    a dispatch — the mismatched follower becomes its own leader."""
    from qwen_image_edit_streamdiffusion_tpu.core.imaging import (
        make_test_image,
        pil_to_base64,
    )

    pipe = EditPipeline.create("tiny", config=TINY_STREAM, seed=0)
    engine = InferenceEngine(pipeline=pipe, input_size=64, default_steps=1,
                             dynamic_batch=4)
    b64 = pil_to_base64(make_test_image(64, 64, "gray"))

    engine._lock.acquire()
    results = {}

    def worker(i, steps):
        results[i] = engine.edit({"image": b64, "steps": steps, "seed": i})

    threads = [threading.Thread(target=worker, args=(0, 1)),
               threading.Thread(target=worker, args=(1, 1)),
               threading.Thread(target=worker, args=(2, 2))]
    for t in threads:
        t.start()
    assert _wait_queue(engine, 3)
    engine._lock.release()
    for t in threads:
        t.join()

    assert all(results[i]["status"] == "success" for i in range(3))
    assert results[0].get("batched_with") == 2
    assert results[1].get("batched_with") == 2
    assert "batched_with" not in results[2]  # ran alone
    assert engine.total_requests == 3
