"""Host-side image I/O and geometry.

Parity surface (SURVEY.md §7.1 core/): base64⇄PIL with EXIF transpose
(reference: server.py:99-120), LANCZOS resize + blend compositing
(server.py:132, 201-205; webui_realtime.py:136-154), client-style center
crop (frontend/src/App.js:117-135), and the pipeline's area-preserving
dimension calculation for conditioning images.

A native C++ fast path for resize/blend lives in runtime/native and is used
automatically when built (see runtime.native_ops); these PIL/numpy versions
are the always-available fallback and the reference semantics.
"""

from __future__ import annotations

import base64
import io
import math
from typing import Tuple

import numpy as np
from PIL import Image, ImageOps


def base64_to_pil(b64_string: str) -> Image.Image:
    """Decode a (possibly dataURL-prefixed) base64 image, apply EXIF
    orientation, convert to RGB. Mirrors reference server.py:99-113."""
    if "," in b64_string:
        b64_string = b64_string.split(",", 1)[1]
    img = Image.open(io.BytesIO(base64.b64decode(b64_string)))
    img = ImageOps.exif_transpose(img)
    return img.convert("RGB")


def open_rgb(path: str) -> Image.Image:
    """Open an image file with the serving input convention: EXIF
    orientation applied, RGB (the file-path twin of base64_to_pil —
    training datasets load through this)."""
    img = Image.open(path)
    img = ImageOps.exif_transpose(img)
    return img.convert("RGB")


def to_pil(x) -> Image.Image:
    """Accept either an already-decoded PIL image (binary transports —
    the WebSocket stream endpoint, serving/ws.py — hand the engine PIL
    directly, skipping base64) or a base64 string (the reference HTTP
    wire). PIL inputs pass through untouched: the binary transport applies
    EXIF/RGB normalization at its own decode boundary."""
    if isinstance(x, Image.Image):
        return x
    return base64_to_pil(x)


def bytes_to_pil(data: bytes) -> Image.Image:
    """Decode raw image bytes (JPEG/PNG/...) with the serving input
    convention: EXIF orientation applied, RGB — the binary-transport twin
    of base64_to_pil."""
    img = Image.open(io.BytesIO(data))
    img = ImageOps.exif_transpose(img)
    return img.convert("RGB")


def pil_to_jpeg(img: Image.Image, quality: int = 90) -> bytes:
    """Encode PIL image as JPEG bytes (q=90, the reference's wire quality
    — server.py:116-120). Binary transports ship these bytes directly;
    the HTTP path base64-wraps them (pil_to_base64)."""
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def pil_to_base64(img: Image.Image, quality: int = 90) -> str:
    """Encode PIL image as base64 JPEG (q=90 — reference server.py:116-120)."""
    return base64.b64encode(pil_to_jpeg(img, quality)).decode()


def resize(img: Image.Image, width: int, height: int) -> Image.Image:
    """LANCZOS resize (reference server.py:132)."""
    if img.size == (width, height):
        return img
    return img.resize((width, height), Image.LANCZOS)


def blend(a: Image.Image, b: Image.Image, ratio: float) -> Image.Image:
    """Composite two images (reference server.py:201-205)."""
    if a.size != b.size:
        b = b.resize(a.size, Image.LANCZOS)
    return Image.blend(a, b, ratio)


def center_crop_square(img: Image.Image, size: int = 512) -> Image.Image:
    """Center-crop to square then resize — server-side equivalent of the
    React client's canvas crop (frontend/src/App.js:117-135)."""
    w, h = img.size
    s = min(w, h)
    left, top = (w - s) // 2, (h - s) // 2
    return img.crop((left, top, left + s, top + s)).resize(
        (size, size), Image.LANCZOS
    )


def calculate_dimensions(
    target_area: int, aspect_ratio: float, multiple: int = 32
) -> Tuple[int, int]:
    """(width, height) with w*h ≈ target_area, w/h ≈ aspect_ratio, both
    rounded to a multiple of ``multiple`` (latent/patch alignment). This is
    the edit pipeline's sizing rule for conditioning images (VL-encoder
    images → 384² area, VAE conditioning images and default output → 1024²
    area; SURVEY.md §2.2)."""
    width = math.sqrt(target_area * aspect_ratio)
    height = width / aspect_ratio
    width = max(multiple, round(width / multiple) * multiple)
    height = max(multiple, round(height / multiple) * multiple)
    return int(width), int(height)


def pil_to_array(img: Image.Image) -> np.ndarray:
    """PIL → float32 NHWC array in [-1, 1] (VAE input convention;
    reference encode path qwen_realtime.py:174-179)."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr * 2.0 - 1.0


def array_to_pil(arr: np.ndarray) -> Image.Image:
    """float NHWC/HWC array in [-1, 1] → PIL (reference decode path
    qwen_realtime.py:195-199)."""
    arr = np.asarray(arr, dtype=np.float32)
    if arr.ndim == 4:
        arr = arr[0]
    arr = np.clip(arr / 2.0 + 0.5, 0.0, 1.0)
    return Image.fromarray((arr * 255.0).round().astype(np.uint8))


def make_test_image(
    width: int = 512, height: int = 512, kind: str = "gradient",
    phase: float = 0.0,
) -> Image.Image:
    """Synthetic fixtures matching the reference's test images
    (SURVEY.md §4: gradient qwen_realtime.py:395-403, gray server.py:84,
    gradient+circle test_qwen_edit.py:13-36, animated sine pattern
    qwen_realtime.py:334-346). ``phase`` animates the "sine" kind —
    stepping it per frame reproduces the reference's moving headless test
    pattern (used by the stream temporal-coherence metric)."""
    if kind == "gray":
        return Image.new("RGB", (width, height), "gray")
    y = np.linspace(0, 1, height)[:, None]
    x = np.linspace(0, 1, width)[None, :]
    if kind == "gradient":
        img = np.stack(
            [100 + 100 * np.broadcast_to(y, (height, width)),
             100 + 100 * np.broadcast_to(x, (height, width)),
             np.full((height, width), 150.0)],
            axis=-1,
        )
    elif kind == "circle":
        img = np.stack(
            [255 * np.broadcast_to(y, (height, width)),
             255 * np.broadcast_to(x, (height, width)),
             np.full((height, width), 128.0)],
            axis=-1,
        )
        yy = (np.arange(height)[:, None] - height / 2) ** 2
        xx = (np.arange(width)[None, :] - width / 2) ** 2
        mask = yy + xx < (min(width, height) / 5) ** 2
        img[mask] = [255.0, 32.0, 32.0]
    elif kind == "sine":
        t = float(phase)
        img = np.stack(
            [127 + 127 * np.sin(np.broadcast_to(x * width / 50, (height, width)) + t),
             127 + 127 * np.sin(np.broadcast_to(y * height / 50, (height, width)) + t),
             127 + 127 * np.sin((x * width + y * height) / 70 + t)],
            axis=-1,
        )
    else:
        raise ValueError(f"unknown test image kind {kind!r}")
    return Image.fromarray(img.astype(np.uint8))
