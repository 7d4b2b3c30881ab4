"""Device-side RGB → YCbCr 4:2:0 for cheap device→host image transfer.

The axon-tunneled device→host link moves ~14-35 MB/s (runtime/fetch.py), so
the 3 bytes/px RGB frame costs 50-105 ms per request/stream-frame at
512²-1024². Every consumer of these pixels is chroma-subsampled anyway:
the `/edit` wire format is JPEG q=90 (reference server.py:116-120 — Pillow
encodes q<95 as 4:2:0) and the realtime webcam stream is video. Converting
to YCbCr on-device and shipping 4:2:0 planes (1.5 bytes/px) halves the
transfer with no loss relative to the delivered format.

Conversion uses the JPEG/BT.601 full-range matrix (what libjpeg applies to
RGB input), so host-side reconstruction + JPEG re-encode round-trips the
same color space. Opt-in via StreamConfig.transfer_format="yuv420"; the
library default stays exact RGB.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rgb_to_yuv420(x32: jnp.ndarray) -> jnp.ndarray:
    """f32 RGB in [0, 255] (B, H, W, 3), H/W even → ONE packed uint8
    buffer (B, H/2, W/2, 6): channels [0:4] = the 2×2 luma block
    (row-major), [4:6] = 2×2 box-averaged Cb, Cr (the JPEG encoder's own
    subsampling filter). A single buffer ⇒ a single device→host transfer
    (two separate plane fetches pay two tunnel round-trips, which at 512²
    costs more than the bandwidth the format saves)."""
    r = x32[..., 0]
    g = x32[..., 1]
    b = x32[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    bsz, h, w = y.shape
    y_blk = y.reshape(bsz, h // 2, 2, w // 2, 2).transpose(0, 1, 3, 2, 4)
    y_blk = y_blk.reshape(bsz, h // 2, w // 2, 4)
    cbcr = jnp.stack([cb, cr], axis=-1)  # (B, H, W, 2)
    cbcr = cbcr.reshape(bsz, h // 2, 2, w // 2, 2, 2).mean(axis=(2, 4))
    packed = jnp.concatenate([y_blk, cbcr], axis=-1)
    return jnp.clip(packed + 0.5, 0.0, 255.0).astype(jnp.uint8)


def yuv420_to_rgb(packed: jnp.ndarray) -> jnp.ndarray:
    """Device-side inverse of :func:`rgb_to_yuv420` for the UPLOAD
    direction: uint8 (B, H/2, W/2, 6) → f32 RGB (B, H, W, 3) in [0, 255].

    Host→device frames pay the same ~14-35 MB/s tunnel as fetches, so the
    realtime stream ships camera frames as 4:2:0 too (half the bytes; the
    camera/JPEG source was 4:2:0 subsampled to begin with). Chroma is
    nearest-upsampled, mirroring the host decode path.
    """
    p = packed.astype(jnp.float32)
    bsz, h2, w2, _ = packed.shape
    y = p[..., :4].reshape(bsz, h2, w2, 2, 2).transpose(0, 1, 3, 2, 4)
    y = y.reshape(bsz, 2 * h2, 2 * w2)
    cb = jnp.repeat(jnp.repeat(p[..., 4], 2, axis=1), 2, axis=2) - 128.0
    cr = jnp.repeat(jnp.repeat(p[..., 5], 2, axis=1), 2, axis=2) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def pack_yuv420_host(arr: np.ndarray) -> np.ndarray:
    """Host-side RGB uint8 (H, W, 3), H/W even → packed uint8
    (H/2, W/2, 6) in :func:`rgb_to_yuv420` layout. Native C++ when built
    (~6× the PIL+numpy fallback on one core — this runs per stream frame);
    fallback: Pillow's C YCbCr converter + uint16 2×2 box-averaged chroma
    (the device encoder's filter)."""
    from qwen_image_edit_streamdiffusion_tpu.runtime import native_ops

    native = native_ops.yuv420_pack(arr)
    if native is not None:
        return native
    from PIL import Image

    ycc = np.asarray(Image.fromarray(arr).convert("YCbCr"))
    h, w = ycc.shape[:2]
    y = ycc[..., 0]
    y_blk = (y.reshape(h // 2, 2, w // 2, 2).transpose(0, 2, 1, 3)
             .reshape(h // 2, w // 2, 4))
    c = ycc[..., 1:].astype(np.uint16)
    cavg = ((c[0::2, 0::2] + c[1::2, 0::2] + c[0::2, 1::2] + c[1::2, 1::2]
             + 2) >> 2).astype(np.uint8)
    return np.concatenate([y_blk, cavg], axis=-1)


def yuv420_to_rgb_image(packed: np.ndarray):
    """Host-side reconstruction: uint8 (H/2, W/2, 6) → RGB PIL image.

    Native C++ when built; fallback: nearest chroma upsample (what libjpeg
    does on decode) + Pillow's C YCbCr→RGB converter.
    """
    from PIL import Image

    from qwen_image_edit_streamdiffusion_tpu.runtime import native_ops

    native = native_ops.yuv420_unpack(np.ascontiguousarray(packed))
    if native is not None:
        return Image.fromarray(native)
    h2, w2, _ = packed.shape
    h, w = 2 * h2, 2 * w2
    y = (packed[..., :4].reshape(h2, w2, 2, 2)
         .transpose(0, 2, 1, 3).reshape(h, w))
    up = np.repeat(np.repeat(packed[..., 4:], 2, axis=0), 2, axis=1)
    ycc = np.concatenate([y[..., None], up], axis=-1)
    return Image.fromarray(ycc, mode="YCbCr").convert("RGB")
