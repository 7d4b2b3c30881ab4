"""YCbCr 4:2:0 transfer-format tests (ops/colorspace.py).

The yuv420 path halves device→host image bytes for the server/stream
entry points; it must stay visually equivalent to the exact RGB path
(it is lossless relative to the JPEG-q90 wire format the reference
serves — reference server.py:116-120).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.ops import colorspace


def _smooth_rgb(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(30, 220, (3,), np.int32)
    yy = np.linspace(0, 35, h)[:, None]
    xx = np.linspace(0, 35, w)[None, :]
    img = np.stack([base[0] + yy + xx, base[1] + yy - 0.5 * xx,
                    base[2] - yy + 0.7 * xx], axis=-1)
    return np.clip(img, 0, 255).astype(np.float32)


def test_roundtrip_close_on_smooth_images():
    x = _smooth_rgb(64, 48)
    packed = colorspace.rgb_to_yuv420(jnp.asarray(x)[None])
    assert packed.shape == (1, 32, 24, 6) and packed.dtype == jnp.uint8
    out = colorspace.yuv420_to_rgb_image(np.asarray(packed[0]))
    diff = np.abs(np.asarray(out, np.float32) - x)
    # luma exact to rounding; chroma subsampling on a smooth field ≤ a few
    # codes (same error class as the JPEG encoder's own 4:2:0 pass)
    assert diff.mean() < 1.5 and diff.max() <= 8


def test_gray_is_exact():
    x = np.full((16, 16, 3), 137.0, np.float32)
    packed = colorspace.rgb_to_yuv420(jnp.asarray(x)[None])
    out = np.asarray(colorspace.yuv420_to_rgb_image(np.asarray(packed[0])),
                     np.float32)
    assert np.abs(out - x).max() <= 1  # neutral chroma: Y-only, exact ±1


def test_luma_block_packing_is_lossless():
    """The 2×2 luma blocks must reassemble in exact row-major order."""
    x = np.arange(8 * 6 * 3, dtype=np.float32).reshape(8, 6, 3) % 251
    packed = colorspace.rgb_to_yuv420(jnp.asarray(x)[None])
    out = colorspace.yuv420_to_rgb_image(np.asarray(packed[0]))
    y_ref = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    ycc = np.asarray(out.convert("YCbCr"), np.float32)
    assert np.abs(ycc[..., 0] - y_ref).max() <= 1.0


def test_upload_roundtrip_host_pack_device_unpack():
    """Host pack → device unpack (the upload direction) ≈ identity on
    smooth images, and exactly consistent with the device encoder's
    layout."""
    x = _smooth_rgb(32, 40, seed=3).astype(np.uint8)
    packed = colorspace.pack_yuv420_host(x)
    assert packed.shape == (16, 20, 6) and packed.dtype == np.uint8
    rgb = np.asarray(colorspace.yuv420_to_rgb(jnp.asarray(packed)[None]))[0]
    diff = np.abs(rgb - x.astype(np.float32))
    assert diff.mean() < 2.0 and diff.max() <= 10

    # host pack and device pack agree (PIL's C matrix vs ours, ±1 code)
    dev = np.asarray(
        colorspace.rgb_to_yuv420(jnp.asarray(x, jnp.float32)[None])
    )[0]
    assert np.abs(dev.astype(np.int32) - packed.astype(np.int32)).max() <= 2


def test_encode_fn_upload_formats_agree():
    """Tiny-pipeline VAE cond tokens from a yuv420 upload ≈ rgb upload."""
    from qwen_image_edit_streamdiffusion_tpu.core import imaging
    from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
    from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
        EditPipeline,
    )

    cfg = StreamConfig(width=64, height=64, vae_image_area=64 * 64,
                       vl_image_area=32 * 32, num_inference_steps=1,
                       model_preset="tiny")
    pipe = EditPipeline.create("tiny", config=cfg, seed=0)
    arr = np.asarray(imaging.make_test_image(64, 64, "gradient"), np.uint8)
    t_rgb, _ = pipe.encode_condition_latents([arr])
    pipe.config = cfg.replace(transfer_format="yuv420")
    t_yuv, _ = pipe.encode_condition_latents([arr])
    a, b = np.asarray(t_rgb, np.float32), np.asarray(t_yuv, np.float32)
    scale = np.abs(a).mean() + 1e-6
    assert np.abs(a - b).mean() / scale < 0.15


def test_pipeline_transfer_formats_agree():
    """End-to-end: the tiny pipeline's yuv420 output ≈ its rgb output
    (same weights, same seed — only the transfer format differs)."""
    from qwen_image_edit_streamdiffusion_tpu.core import imaging
    from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
    from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
        EditPipeline,
    )

    cfg = StreamConfig(width=64, height=64, vae_image_area=64 * 64,
                       vl_image_area=32 * 32, num_inference_steps=1,
                       model_preset="tiny")
    pipe = EditPipeline.create("tiny", config=cfg, seed=0)
    img = imaging.make_test_image(64, 64, "gradient")
    rgb = np.asarray(
        pipe(img, "test", num_inference_steps=1, seed=7).images[0],
        np.float32,
    )
    pipe.config = cfg.replace(transfer_format="yuv420")
    out = np.asarray(
        pipe(img, "test", num_inference_steps=1, seed=7).images[0],
        np.float32,
    )

    # Random-weight tiny outputs are noise-like, so raw RGB diffs are
    # dominated by legitimate chroma subsampling (JPEG q90 costs the same
    # on noise). Assert on what the format preserves: luma exactly (it is
    # never subsampled) and 2×2-averaged chroma closely.
    def yc(a):
        y = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
        cb = 128 - 0.168736 * a[..., 0] - 0.331264 * a[..., 1] + 0.5 * a[..., 2]
        cr = 128 + 0.5 * a[..., 0] - 0.418688 * a[..., 1] - 0.081312 * a[..., 2]
        h, w = y.shape
        box = lambda c: c.reshape(h // 2, 2, w // 2, 2).mean((1, 3))
        return y, box(cb), box(cr)

    y0, cb0, cr0 = yc(rgb)
    y1, cb1, cr1 = yc(out)
    assert np.abs(y1 - y0).mean() < 2.5, "luma must survive the transfer"
    assert np.abs(cb1 - cb0).mean() < 3.0
    assert np.abs(cr1 - cr0).mean() < 3.0
