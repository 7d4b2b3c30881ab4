"""Native C++ image ops vs PIL/numpy reference semantics."""

import numpy as np
import pytest
from PIL import Image

from qwen_image_edit_streamdiffusion_tpu.runtime import native_ops


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native_ops.available():
        pytest.skip("native lib unavailable (no compiler)")


def _img(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 255, (h, w, 3)).astype(np.uint8)


def test_resize_matches_pil_downscale():
    img = _img(128, 96)
    ours = native_ops.resize_lanczos(img, 64, 48)
    pil = np.asarray(Image.fromarray(img).resize((48, 64), Image.LANCZOS),
                     np.int16)
    diff = np.abs(ours.astype(np.int16) - pil)
    assert diff.mean() < 2.0 and np.percentile(diff, 99) <= 6


def test_resize_matches_pil_upscale():
    img = _img(32, 32, seed=1)
    ours = native_ops.resize_lanczos(img, 96, 64)
    pil = np.asarray(Image.fromarray(img).resize((64, 96), Image.LANCZOS),
                     np.int16)
    diff = np.abs(ours.astype(np.int16) - pil)
    assert diff.mean() < 2.0


def test_resize_identity():
    img = _img(40, 40)
    np.testing.assert_array_equal(native_ops.resize_lanczos(img, 40, 40), img)


def test_blend_matches_pil():
    a, b = _img(50, 50, 2), _img(50, 50, 3)
    ours = native_ops.blend(a, b, 0.3)
    pil = np.asarray(
        Image.blend(Image.fromarray(a), Image.fromarray(b), 0.3), np.int16
    )
    assert np.abs(ours.astype(np.int16) - pil).max() <= 1


def test_float_roundtrip():
    img = _img(16, 16, 4)
    f = native_ops.to_model_array(img)
    assert f.dtype == np.float32 and f.min() >= -1.0 and f.max() <= 1.0
    back = native_ops.from_model_array(f)
    np.testing.assert_array_equal(back, img)


def test_yuv420_pack_unpack_matches_pil_path():
    """Native 4:2:0 pack/unpack ≈ the PIL+numpy fallback (±1 code) and
    round-trips smooth images closely."""
    if not native_ops.available():
        import pytest

        pytest.skip("native lib unavailable")
    img = _img(32, 48, seed=7)
    packed = native_ops.yuv420_pack(img)
    assert packed.shape == (16, 24, 6)

    ycc = np.asarray(Image.fromarray(img).convert("YCbCr"))
    h, w = img.shape[:2]
    y_blk = (ycc[..., 0].reshape(h // 2, 2, w // 2, 2)
             .transpose(0, 2, 1, 3).reshape(h // 2, w // 2, 4))
    c = ycc[..., 1:].astype(np.uint16)
    cavg = ((c[0::2, 0::2] + c[1::2, 0::2] + c[0::2, 1::2]
             + c[1::2, 1::2] + 2) >> 2).astype(np.uint8)
    ref = np.concatenate([y_blk, cavg], axis=-1)
    assert np.abs(packed.astype(int) - ref.astype(int)).max() <= 1

    rgb = native_ops.yuv420_unpack(packed)
    assert rgb.shape == img.shape
    up = np.repeat(np.repeat(packed[..., 4:], 2, 0), 2, 1)
    yv = (packed[..., :4].reshape(h // 2, w // 2, 2, 2)
          .transpose(0, 2, 1, 3).reshape(h, w))
    ref_rgb = np.asarray(Image.fromarray(
        np.concatenate([yv[..., None], up], -1), "YCbCr").convert("RGB"))
    assert np.abs(rgb.astype(int) - ref_rgb.astype(int)).max() <= 1
