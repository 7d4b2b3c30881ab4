"""Cross-session batched streaming: concurrent stream sessions' compatible
temporal frames coalesce into ONE multi-row fused dispatch
(pipeline.stream.submit_frames_batched + the engine's stream leader).

The reference serializes every frame of every user on one GPU and
429-rejects concurrency outright (server.py:39-40, 190-194); its realtime
pipeline is single-user by construction (qwen_realtime.py:92-387). Here N
webcam users cost one dispatch per frame-time, with per-row conditioning,
and row r is verified identical to session r dispatching alone.
"""

import dataclasses
import threading
import time

import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.core import imaging
from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import EditPipeline
from qwen_image_edit_streamdiffusion_tpu.pipeline.stream import (
    BatchPixels,
    RealtimePipeline,
    submit_frames_batched,
)
from qwen_image_edit_streamdiffusion_tpu.runtime.engine import InferenceEngine

TINY_STREAM = StreamConfig(
    width=64, height=64, vae_image_area=64 * 64, vl_image_area=32 * 32,
    num_inference_steps=1, model_preset="tiny",
)


@pytest.fixture(scope="module")
def tiny_pipe():
    return EditPipeline.create("tiny", config=TINY_STREAM, seed=0)


def _session(pipe):
    # engine construction convention: sessions share params + jit cache
    return RealtimePipeline(pipe=dataclasses.replace(pipe))


def _frames():
    return [imaging.make_test_image(64, 64, p)
            for p in ("gray", "gradient", "circle")]


def test_batched_rows_match_individual_sessions(tiny_pipe):
    """Row r of a 2-session batched temporal dispatch equals session r
    dispatching alone (same frozen prompts, prev latents, frame keys)."""
    f_kf1, f_kf2, f_t = _frames()

    def prime_pair():
        a, b = _session(tiny_pipe), _session(tiny_pipe)
        a.precompute_conditions("oil painting")
        b.precompute_conditions("watercolor sketch")
        a.process_frame(f_kf1)
        b.process_frame(f_kf2)
        return a, b

    ref_a, ref_b = prime_pair()
    out_a = np.asarray(ref_a.process_frame(f_t))
    out_b = np.asarray(ref_b.process_frame(f_t))

    bat_a, bat_b = prime_pair()
    handles = submit_frames_batched([bat_a, bat_b], [f_t, f_t])
    got_a = np.asarray(bat_a._collect(handles[0]))
    got_b = np.asarray(bat_b._collect(handles[1]))

    # same per-row noise keys + row-independent math: identical outputs
    # (uint8 after the decode epilogue — allow a 1-code rounding wobble)
    assert np.abs(got_a.astype(np.int16) - out_a.astype(np.int16)).max() <= 1
    assert np.abs(got_b.astype(np.int16) - out_b.astype(np.int16)).max() <= 1
    # per-row conditioning is real: the two rows differ from each other
    assert np.abs(got_a.astype(np.int16) - got_b.astype(np.int16)).max() > 1
    # temporal state advanced exactly as the individual path's
    assert bat_a.frame_count == ref_a.frame_count == 2
    assert not bat_a.is_keyframe and not bat_b.is_keyframe
    assert bat_a.prev_latent.shape == ref_a.prev_latent.shape


def test_batched_fetches_host_copy_once(tiny_pipe, monkeypatch):
    """All rows of a coalesced dispatch share ONE device→host transfer
    (BatchPixels caches the fetched batch)."""
    a, b = _session(tiny_pipe), _session(tiny_pipe)
    for s, f in zip((a, b), _frames()):
        s.precompute_conditions("style")
        s.process_frame(f)
    handles = submit_frames_batched([a, b], _frames()[:2])
    bp = handles[0][0]
    assert isinstance(bp, BatchPixels) and handles[1][0] is bp

    calls = []
    real = EditPipeline._fetch_images

    def counting(self, pixels):
        calls.append(1)
        return real(self, pixels)

    monkeypatch.setattr(EditPipeline, "_fetch_images", counting)
    img_a = a._collect(handles[0])
    img_b = b._collect(handles[1])
    assert len(calls) == 1
    assert img_a.size == img_b.size == (64, 64)


def test_batched_kind_or_config_mismatch_raises(tiny_pipe):
    """A keyframe row can't share a fori_loop with a temporal row, and
    sessions must agree on geometry/steps — loud ValueError, never a
    silently different edit."""
    a, b = _session(tiny_pipe), _session(tiny_pipe)
    a.precompute_conditions("style")
    b.precompute_conditions("style")
    a.process_frame(_frames()[0])  # a: temporal next; b: keyframe next
    with pytest.raises(ValueError, match="incompatible"):
        submit_frames_batched([a, b], _frames()[:2])
    b.process_frame(_frames()[1])
    b.pipe.config = b.config.replace(num_inference_steps=2)
    with pytest.raises(ValueError, match="incompatible"):
        submit_frames_batched([a, b], _frames()[:2])


def test_engine_coalesces_sessions_and_matches_serial(tiny_pipe):
    """Two sessions' temporal frames queued behind a held device lock
    coalesce into one dispatch (batched_with=2) and produce the same
    images as the serial non-dynamic engine."""
    b64s = [imaging.pil_to_base64(f) for f in _frames()]

    def run(dynamic):
        pipe = dataclasses.replace(tiny_pipe, _jit_cache=tiny_pipe._jit_cache)
        engine = InferenceEngine(pipeline=pipe, input_size=64,
                                 default_steps=1,
                                 dynamic_batch=4 if dynamic else 0,
                                 queue_requests=not dynamic)
        out = {}
        out["a0"] = engine.edit({"image": b64s[0], "stream_session": "a",
                                 "steps": 1})
        out["b0"] = engine.edit({"image": b64s[1], "stream_session": "b",
                                 "steps": 1})
        if dynamic:
            engine._lock.acquire()
            results = {}

            def worker(i, sid):
                results[sid] = engine.edit(
                    {"image": b64s[i], "stream_session": sid, "steps": 1})

            ts = [threading.Thread(target=worker, args=(2, "a")),
                  threading.Thread(target=worker, args=(2, "b"))]
            for t in ts:
                t.start()
            for _ in range(2000):
                with engine._bq_lock:
                    if len(engine._batch_queue) >= 2:
                        break
                time.sleep(0.005)
            engine._lock.release()
            for t in ts:
                t.join()
            out["a1"], out["b1"] = results["a"], results["b"]
        else:
            out["a1"] = engine.edit({"image": b64s[2], "stream_session": "a",
                                     "steps": 1})
            out["b1"] = engine.edit({"image": b64s[2], "stream_session": "b",
                                     "steps": 1})
        return out

    serial = run(dynamic=False)
    dyn = run(dynamic=True)
    assert dyn["a1"].get("batched_with") == 2
    assert dyn["b1"].get("batched_with") == 2
    assert not dyn["a1"]["keyframe"] and dyn["a1"]["frame"] == 2
    for k in ("a1", "b1"):
        got = np.asarray(imaging.base64_to_pil(dyn[k]["image"]), np.float32)
        want = np.asarray(imaging.base64_to_pil(serial[k]["image"]),
                          np.float32)
        # identical rows modulo uint8 rounding + JPEG re-encode of the wire
        assert np.abs(got - want).mean() < 2.0


def test_engine_batched_pipelined_lag_semantics(tiny_pipe):
    """stream_pipeline=true frames coalesced into a batched dispatch keep
    the lag contract: prime returns lag 0, steady-state returns the
    previous frame with lag 1."""
    b64s = [imaging.pil_to_base64(f) for f in _frames()]
    pipe = dataclasses.replace(tiny_pipe, _jit_cache=tiny_pipe._jit_cache)
    engine = InferenceEngine(pipeline=pipe, input_size=64, default_steps=1,
                             dynamic_batch=4)
    # prime both sessions (keyframes, lag 0)
    for sid, b in (("a", b64s[0]), ("b", b64s[1])):
        r = engine.edit({"image": b, "stream_session": sid, "steps": 1,
                         "stream_pipeline": True})
        assert r["lag"] == 0 and r["keyframe"]

    engine._lock.acquire()
    results = {}

    def worker(i, sid):
        results[sid] = engine.edit(
            {"image": b64s[i], "stream_session": sid, "steps": 1,
             "stream_pipeline": True})

    ts = [threading.Thread(target=worker, args=(2, "a")),
          threading.Thread(target=worker, args=(2, "b"))]
    for t in ts:
        t.start()
    for _ in range(2000):
        with engine._bq_lock:
            if len(engine._batch_queue) >= 2:
                break
        time.sleep(0.005)
    engine._lock.release()
    for t in ts:
        t.join()
    for sid in ("a", "b"):
        r = results[sid]
        assert r["status"] == "success"
        assert r["lag"] == 1  # returns the pending keyframe
        assert r.get("batched_with") == 2
        assert engine._session_pending[sid] is not None


def test_same_session_frames_never_share_a_dispatch(tiny_pipe):
    """Two queued frames of ONE session must serve in order across two
    waves (frame N+1 re-noises frame N's latent) — never as two rows of
    one dispatch."""
    b64s = [imaging.pil_to_base64(f) for f in _frames()]
    pipe = dataclasses.replace(tiny_pipe, _jit_cache=tiny_pipe._jit_cache)
    engine = InferenceEngine(pipeline=pipe, input_size=64, default_steps=1,
                             dynamic_batch=4)
    engine.edit({"image": b64s[0], "stream_session": "a", "steps": 1})

    engine._lock.acquire()
    results = []

    def worker(i):
        results.append(engine.edit(
            {"image": b64s[i], "stream_session": "a", "steps": 1}))

    ts = [threading.Thread(target=worker, args=(i,)) for i in (1, 2)]
    for t in ts:
        t.start()
    for _ in range(2000):
        with engine._bq_lock:
            if len(engine._batch_queue) >= 2:
                break
        time.sleep(0.005)
    engine._lock.release()
    for t in ts:
        t.join()
    frames = sorted(r["frame"] for r in results)
    assert frames == [2, 3]  # strictly ordered, both served
    assert all("batched_with" not in r for r in results)
