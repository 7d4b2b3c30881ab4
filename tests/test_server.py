"""Live HTTP server tests: wire contract parity with the reference server
(endpoints, field names, status codes 200/404/422/429/500/503)."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.core import imaging
from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import EditPipeline
from qwen_image_edit_streamdiffusion_tpu.runtime.engine import (
    EngineBusy,
    InferenceEngine,
    ModelNotLoaded,
)
from qwen_image_edit_streamdiffusion_tpu.serving.server import make_server

TINY_STREAM = StreamConfig(
    width=64, height=64,
    vae_image_area=64 * 64, vl_image_area=32 * 32,
    num_inference_steps=2,
    model_preset="tiny",
)


@pytest.fixture(scope="module")
def server_url():
    pipe = EditPipeline.create("tiny", config=TINY_STREAM, seed=0)
    engine = InferenceEngine(pipeline=pipe, input_size=64, default_steps=2)
    srv = make_server(engine, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{port}", engine
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=300) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_root_endpoint(server_url):
    url, _ = server_url
    code, body = _get(url + "/")
    assert code == 200
    assert body["status"] == "running"
    assert "/edit" in body["endpoints"] and "/health" in body["endpoints"]


def test_health_endpoint(server_url):
    url, _ = server_url
    code, body = _get(url + "/health")
    assert code == 200
    assert body["status"] == "ok"
    assert body["model_loaded"] is True
    assert "gpu_memory" in body  # wire-compat field name


def test_edit_roundtrip(server_url):
    url, _ = server_url
    img = imaging.make_test_image(64, 64, "circle")
    code, body = _post(url + "/edit", {
        "image": imaging.pil_to_base64(img),
        "prompt": "oil painting",
        "steps": 2,
    })
    assert code == 200, body
    assert body["status"] == "success"
    assert body["elapsed"] > 0
    out = imaging.base64_to_pil(body["image"])
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_edit_with_composite(server_url):
    url, _ = server_url
    a = imaging.pil_to_base64(imaging.make_test_image(64, 64, "circle"))
    b = imaging.pil_to_base64(imaging.make_test_image(64, 64, "gradient"))
    code, body = _post(url + "/edit", {
        "image": a, "ref_image": b, "blend_ratio": 0.5, "prompt": "mix",
    })
    assert code == 200, body


def test_edit_with_cfg(server_url):
    url, _ = server_url
    img = imaging.pil_to_base64(imaging.make_test_image(64, 64, "gray"))
    code, body = _post(url + "/edit", {"image": img, "use_cfg": True})
    assert code == 200, body


def test_missing_image_field_422(server_url):
    url, _ = server_url
    code, body = _post(url + "/edit", {"prompt": "x"})
    assert code == 422


def test_bad_base64_500(server_url):
    url, _ = server_url
    code, body = _post(url + "/edit", {"image": "!!!not-base64!!!"})
    assert code == 500
    assert "detail" in body


def test_unknown_ref_mode_422(server_url):
    """A typo'd ref_mode must fail loudly, not silently fall back to
    blend (a different edit with HTTP 200)."""
    url, _ = server_url
    img = imaging.pil_to_base64(imaging.make_test_image(64, 64, "gray"))
    code, body = _post(url + "/edit",
                       {"image": img, "ref_image": img,
                        "ref_mode": "conditon"})
    assert code == 422
    assert "ref_mode" in body["detail"]


def test_busy_429(server_url):
    url, engine = server_url
    img = imaging.pil_to_base64(imaging.make_test_image(64, 64, "gray"))
    engine._lock.acquire()
    try:
        code, body = _post(url + "/edit", {"image": img})
        assert code == 429
        assert "busy" in body["detail"].lower()
    finally:
        engine._lock.release()


def test_model_not_loaded_503():
    engine = InferenceEngine(pipeline=None)
    with pytest.raises(ModelNotLoaded):
        engine.edit({"image": "x"})


def test_unknown_route_404(server_url):
    url, _ = server_url
    try:
        with urllib.request.urlopen(url + "/nope", timeout=30) as r:
            code = r.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 404


def test_ui_served(server_url):
    url, _ = server_url
    with urllib.request.urlopen(url + "/ui", timeout=30) as r:
        html = r.read().decode()
    assert r.status == 200 and "/edit" in html and "webcam" in html.lower()


def test_warmup_compiles_cfg_bucket_matrix():
    """Engine warmup must compile BOTH CFG variants of the serving bucket
    (SURVEY §7.1 item 4 / VERDICT r2 next #3): a cold server's first
    use_cfg=true request replays a warm graph instead of stalling on a
    tunnel-scale compile."""
    pipe = EditPipeline.create("tiny", config=TINY_STREAM, seed=0)
    engine = InferenceEngine(pipeline=pipe, input_size=64, default_steps=1,
                             warmup_cfg=True)
    engine.warmup()
    modes = {k[5] for k in pipe._jit_cache if k[0] == "denoise"}
    assert "none" in modes
    assert TINY_STREAM.cfg_mode in modes  # the use_cfg variant


def test_ref_mode_condition_two_image_edit(server_url):
    """ref_mode="condition" routes the ref image through the upstream
    multi-image signature instead of PIL-blending (VERDICT r2 next #4)."""
    url, engine = server_url
    img = imaging.pil_to_base64(imaging.make_test_image(64, 64, "circle"))
    ref = imaging.pil_to_base64(imaging.make_test_image(64, 64, "gradient"))
    code, body = _post(url + "/edit", {
        "image": img, "ref_image": ref, "ref_mode": "condition",
        "prompt": "apply the reference style", "steps": 1,
    })
    assert code == 200 and body["status"] == "success"
    out = imaging.base64_to_pil(body["image"])
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # the pipeline saw TWO condition images (3 img_shapes in the bucket)
    assert any(k[0] == "denoise" and len(k[2]) == 3
               for k in engine.pipeline._jit_cache)


def test_stream_session_over_http(server_url):
    """A `stream_session` id turns /edit into temporal-latent streaming:
    the first frame is a keyframe (full schedule from noise), subsequent
    frames re-noise the previous latent and run only the tail refine steps
    — all over the unchanged wire contract."""
    url, engine = server_url
    g1 = imaging.pil_to_base64(imaging.make_test_image(64, 64, "gradient"))
    g2 = imaging.pil_to_base64(imaging.make_test_image(64, 64, "circle"))
    code, b1 = _post(url + "/edit", {
        "image": g1, "prompt": "watercolor", "stream_session": "cam-1",
    })
    assert code == 200, b1
    assert b1["status"] == "success"
    assert b1["stream_session"] == "cam-1"
    assert b1["keyframe"] is True and b1["frame"] == 1
    out = imaging.base64_to_pil(b1["image"])
    assert out.size == (64, 64)  # stream output = input_size² img2img
    assert np.isfinite(np.asarray(out, np.float32)).all()

    code, b2 = _post(url + "/edit", {
        "image": g2, "prompt": "watercolor", "stream_session": "cam-1",
    })
    assert code == 200, b2
    assert b2["keyframe"] is False and b2["frame"] == 2
    assert np.isfinite(
        np.asarray(imaging.base64_to_pil(b2["image"]), np.float32)
    ).all()
    # session state lives in the engine, bounded table
    assert "cam-1" in engine._sessions


def test_stream_session_prompt_switch_keeps_latent(server_url):
    """Changing the prompt mid-session re-freezes conditioning (one VL
    encode) but keeps the temporal latent — live prompt editing."""
    url, engine = server_url
    img = imaging.pil_to_base64(imaging.make_test_image(64, 64, "gray"))
    _post(url + "/edit", {"image": img, "prompt": "a",
                          "stream_session": "cam-2"})
    sess = engine._sessions["cam-2"]
    latent_before = sess.prev_latent
    code, body = _post(url + "/edit", {"image": img, "prompt": "b",
                                       "stream_session": "cam-2"})
    assert code == 200 and body["frame"] == 2
    assert sess.prompt == "b"
    assert latent_before is not None  # frame 1 left a latent behind
    assert body["keyframe"] is False  # prompt switch did NOT reset cadence


def test_stream_session_lru_eviction(server_url):
    url, engine = server_url
    img = imaging.pil_to_base64(imaging.make_test_image(64, 64, "gray"))
    engine.max_stream_sessions = 2
    engine._sessions.clear()
    for sid in ("s1", "s2", "s3"):  # s3 evicts s1 (oldest)
        code, _ = _post(url + "/edit",
                        {"image": img, "stream_session": sid})
        assert code == 200
    assert set(engine._sessions) == {"s2", "s3"}
    engine.max_stream_sessions = 4


def test_stream_session_rejects_ref_mode_condition(server_url):
    url, _ = server_url
    img = imaging.pil_to_base64(imaging.make_test_image(64, 64, "gray"))
    code, body = _post(url + "/edit", {
        "image": img, "ref_image": img, "ref_mode": "condition",
        "stream_session": "cam-3",
    })
    assert code == 422
    assert "stream_session" in body["detail"]


def test_stream_session_pipelined_lag(server_url):
    """stream_pipeline=true: each request dispatches its frame and returns
    the PREVIOUS frame's pixels (lag 1); the prime request returns its own
    frame (lag 0) and request 2 re-serves it once."""
    url, engine = server_url
    imgs = [imaging.pil_to_base64(imaging.make_test_image(64, 64, k))
            for k in ("gradient", "circle", "gray")]
    bodies = []
    for b64 in imgs:
        code, body = _post(url + "/edit", {
            "image": b64, "prompt": "sketch",
            "stream_session": "pipe-1", "stream_pipeline": True,
        })
        assert code == 200, body
        bodies.append(body)
    assert [b["lag"] for b in bodies] == [0, 1, 1]
    assert [b["frame"] for b in bodies] == [1, 2, 3]
    # request 2 re-serves the prime frame's pixels exactly once
    assert bodies[1]["image"] == bodies[0]["image"]
    assert bodies[2]["image"] != bodies[1]["image"]
    # sync request on the same session drains the in-flight handle
    code, body = _post(url + "/edit", {
        "image": imgs[0], "prompt": "sketch", "stream_session": "pipe-1",
    })
    assert code == 200 and "lag" not in body
    assert "pipe-1" not in engine._session_pending or \
        engine._session_pending["pipe-1"] is None


def test_edit_request_extensions_seed_negative_cfgscale(server_url):
    """Extension fields beyond the reference wire: per-request seed,
    negative_prompt (with use_cfg) and cfg_scale. Same seed → identical
    output; different seed → different output."""
    url, _ = server_url
    img = imaging.pil_to_base64(imaging.make_test_image(64, 64, "circle"))
    def run(extra):
        code, body = _post(url + "/edit",
                           {"image": img, "prompt": "sketch", **extra})
        assert code == 200, body
        return body["image"]
    a = run({"seed": 7})
    b = run({"seed": 7})
    c = run({"seed": 8})
    assert a == b and a != c
    # custom negative prompt + scale run the CFG path without error
    run({"use_cfg": True, "negative_prompt": "blurry, low quality",
         "cfg_scale": 3.0})


def test_edit_num_images(server_url):
    """num_images=N returns N variations in one denoise dispatch: the
    reference-compatible "image" field stays variation 0 and variations
    1..N-1 ride in an additive "images" list (absent at N=1; extras only —
    repeating variation 0 would ship the same bytes twice)."""
    url, _ = server_url
    img = imaging.make_test_image(64, 64, "circle")
    code, body = _post(url + "/edit", {
        "image": imaging.pil_to_base64(img),
        "prompt": "oil painting",
        "steps": 1,
        "num_images": 2,
    })
    assert code == 200, body
    assert body["status"] == "success"
    assert len(body["images"]) == 1
    a = np.asarray(imaging.base64_to_pil(body["image"]), np.int16)
    b = np.asarray(imaging.base64_to_pil(body["images"][0]), np.int16)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).max() > 0

    code, single = _post(url + "/edit", {
        "image": imaging.pil_to_base64(img),
        "prompt": "oil painting", "steps": 1,
    })
    assert code == 200 and "images" not in single


def test_dynamic_batch_over_http(server_url):
    """--dynamic-batch on the wire: concurrent compatible /edit requests
    coalesce into one dispatch instead of 429-rejecting; responses carry
    the additive batched_with field."""
    import time

    url, engine = server_url
    engine.dynamic_batch = 4
    try:
        b64 = imaging.pil_to_base64(imaging.make_test_image(64, 64,
                                                            "gradient"))
        engine._lock.acquire()
        out = {}

        def post(i):
            out[i] = _post(url + "/edit", {"image": b64, "prompt": f"p{i}",
                                           "steps": 1, "seed": i})

        ths = [threading.Thread(target=post, args=(i,)) for i in range(2)]
        for t in ths:
            t.start()
        for _ in range(2000):
            with engine._bq_lock:
                if len(engine._batch_queue) == 2:
                    break
            time.sleep(0.005)
        engine._lock.release()
        for t in ths:
            t.join()
        for i in range(2):
            code, body = out[i]
            assert code == 200, body
            assert body["status"] == "success"
            assert body["batched_with"] == 2
    finally:
        engine.dynamic_batch = 0


def test_fastapi_factory_contract(server_url, monkeypatch):
    """Execute create_fastapi_app under a stub fastapi module (pydantic is
    real in this image): the endpoint coroutines run against the real
    engine, and every field the engine returns must be representable in
    the declared response model — FastAPI's response_model filtering
    would otherwise silently strip wire features (the caught bug class:
    images/batched_with dropped, num_images ignored)."""
    import asyncio
    import sys
    import types

    _, engine = server_url

    fastapi = types.ModuleType("fastapi")

    class FastAPI:
        def __init__(self, **k):
            self.routes = {}
            self.response_models = {}

        def add_middleware(self, *a, **k):
            pass

        def get(self, path, **k):
            def deco(fn):
                self.routes[("GET", path)] = fn
                return fn
            return deco

        def post(self, path, response_model=None, **k):
            def deco(fn):
                self.routes[("POST", path)] = fn
                self.response_models[("POST", path)] = response_model
                return fn
            return deco

    class HTTPException(Exception):
        def __init__(self, status_code, detail=""):
            super().__init__(detail)
            self.status_code = status_code
            self.detail = detail

    fastapi.FastAPI, fastapi.HTTPException = FastAPI, HTTPException
    mw = types.ModuleType("fastapi.middleware")
    cors = types.ModuleType("fastapi.middleware.cors")
    cors.CORSMiddleware = object
    mw.cors = cors
    fastapi.middleware = mw
    monkeypatch.setitem(sys.modules, "fastapi", fastapi)
    monkeypatch.setitem(sys.modules, "fastapi.middleware", mw)
    monkeypatch.setitem(sys.modules, "fastapi.middleware.cors", cors)

    from qwen_image_edit_streamdiffusion_tpu.serving.server import (
        create_fastapi_app,
    )

    app = create_fastapi_app(engine)
    assert asyncio.run(app.routes[("GET", "/")]())["status"] == "running"
    assert asyncio.run(app.routes[("GET", "/health")]())["model_loaded"]

    edit = app.routes[("POST", "/edit")]
    req_model = app.edit_request_model
    resp_model = app.response_models[("POST", "/edit")]
    assert resp_model is app.edit_response_model
    img = imaging.pil_to_base64(imaging.make_test_image(64, 64, "circle"))
    resp = asyncio.run(edit(req_model(
        image=img, prompt="stylize", steps=1, num_images=2)))
    stripped = set(resp) - set(resp_model.model_fields)
    assert not stripped, f"response model strips wire fields: {stripped}"
    v = resp_model.model_validate(resp)
    assert v.status == "success"
    assert v.images is not None and len(v.images) == 1  # extras only

    # error translation: a busy engine surfaces as HTTPException(429)
    engine._lock.acquire()
    try:
        with pytest.raises(HTTPException) as exc:
            asyncio.run(edit(req_model(image=img, prompt="x", steps=1)))
        assert exc.value.status_code == 429
    finally:
        engine._lock.release()
