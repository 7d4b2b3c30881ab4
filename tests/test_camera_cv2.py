"""Exercise run_camera_loop's cv2 branch with a stub cv2 module.

cv2 isn't in this image, so the webcam half of the camera loop (capture,
BGR↔RGB, stats overlay, dual imshow windows, 'q' quit — reference
qwen_realtime.py:304-387) only ever ran its synthetic fallback. A minimal
fake capturing the calls executes the real branch end-to-end on the tiny
pipeline.
"""

import sys
import types

import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
from qwen_image_edit_streamdiffusion_tpu.pipeline.stream import RealtimePipeline

_SHOWN = []
_TEXTS = []


class _FakeCapture:
    def __init__(self, cam_id):
        self.frames_left = 10

    def isOpened(self):
        return True

    def read(self):
        self.frames_left -= 1
        frame = np.random.default_rng(self.frames_left).integers(
            0, 255, (64, 64, 3), np.uint8
        )
        return self.frames_left >= 0, frame

    def release(self):
        pass


def _fake_cv2():
    cv2 = types.ModuleType("cv2")
    cv2.VideoCapture = _FakeCapture
    cv2.FONT_HERSHEY_SIMPLEX = 0
    cv2.putText = lambda img, text, *a, **k: _TEXTS.append(text)
    cv2.imshow = lambda name, img: _SHOWN.append((name, img.shape))
    cv2.waitKey = lambda ms: 0
    cv2.destroyAllWindows = lambda: None
    return cv2


@pytest.mark.parametrize("pipelined", [True, False])
def test_camera_loop_cv2_branch(monkeypatch, pipelined):
    monkeypatch.setitem(sys.modules, "cv2", _fake_cv2())
    _SHOWN.clear()
    _TEXTS.clear()

    cfg = StreamConfig(width=64, height=64, vae_image_area=64 * 64,
                       vl_image_area=32 * 32, num_inference_steps=1,
                       keyframe_interval=3, model_preset="tiny")
    rt = RealtimePipeline.create("tiny", config=cfg, seed=0)
    rt.precompute_conditions("oil painting style")
    rt.run_camera_loop(max_frames=3, pipelined=pipelined)

    # dual windows per displayed frame (Original + edited), edited is HWC
    names = {n for n, _ in _SHOWN}
    assert names == {"Original", "Qwen Real-time Edit (TPU)"}
    assert len(_SHOWN) == 2 * 3
    shapes = [s for n, s in _SHOWN if n == "Original"]
    assert all(s == (64, 64, 3) for s in shapes)
    # stats overlay rendered (FPS/Steps/Frame lines per frame)
    assert any(t.startswith("FPS:") for t in _TEXTS)
    assert rt.frame_count == 3


def test_camera_loop_q_quits(monkeypatch):
    cv2 = _fake_cv2()
    cv2.waitKey = lambda ms: ord("q")
    monkeypatch.setitem(sys.modules, "cv2", cv2)
    _SHOWN.clear()

    cfg = StreamConfig(width=64, height=64, vae_image_area=64 * 64,
                       vl_image_area=32 * 32, num_inference_steps=1,
                       model_preset="tiny")
    rt = RealtimePipeline.create("tiny", config=cfg, seed=0)
    rt.precompute_conditions("oil painting style")
    rt.run_camera_loop(max_frames=5, pipelined=False)
    # 'q' pressed on the first displayed frame → loop exits immediately
    assert len([n for n, _ in _SHOWN if n == "Original"]) == 1
