"""Imaging round-trip and geometry tests (parity surface of reference
server.py:99-120/132/201-205 and frontend/src/App.js:117-135)."""

import numpy as np
import pytest
from PIL import Image

from qwen_image_edit_streamdiffusion_tpu.core import imaging


def test_base64_roundtrip():
    img = imaging.make_test_image(64, 64, "gradient")
    b64 = imaging.pil_to_base64(img)
    back = imaging.base64_to_pil(b64)
    assert back.size == (64, 64)
    assert back.mode == "RGB"
    # JPEG is lossy; require close, not equal.
    a, b = np.asarray(img, np.int16), np.asarray(back, np.int16)
    assert np.abs(a - b).mean() < 8


def test_base64_dataurl_prefix():
    img = imaging.make_test_image(32, 32, "gray")
    b64 = "data:image/jpeg;base64," + imaging.pil_to_base64(img)
    assert imaging.base64_to_pil(b64).size == (32, 32)


def test_center_crop_square():
    img = imaging.make_test_image(640, 480, "gradient")
    out = imaging.center_crop_square(img, 512)
    assert out.size == (512, 512)


def test_blend_mismatched_sizes():
    a = imaging.make_test_image(64, 64, "gray")
    b = imaging.make_test_image(32, 32, "gradient")
    out = imaging.blend(a, b, 0.5)
    assert out.size == (64, 64)


@pytest.mark.parametrize(
    "area,aspect,exp",
    [
        (1024 * 1024, 1.0, (1024, 1024)),
        (1024 * 1024, 16 / 9, (1376, 768)),
        (384 * 384, 1.0, (384, 384)),
        (384 * 384, 2.0, (544, 256)),
    ],
)
def test_calculate_dimensions(area, aspect, exp):
    w, h = imaging.calculate_dimensions(area, aspect)
    assert (w, h) == exp
    assert w % 32 == 0 and h % 32 == 0


def test_array_pil_roundtrip():
    img = imaging.make_test_image(48, 48, "circle")
    arr = imaging.pil_to_array(img)
    assert arr.shape == (48, 48, 3)
    assert arr.min() >= -1.0 and arr.max() <= 1.0
    back = imaging.array_to_pil(arr)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(img))


def test_test_image_kinds():
    for kind in ("gray", "gradient", "circle", "sine"):
        assert imaging.make_test_image(40, 40, kind).size == (40, 40)
