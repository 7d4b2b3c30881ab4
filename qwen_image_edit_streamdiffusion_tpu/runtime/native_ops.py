"""ctypes bindings for the native C++ image ops (runtime/native/).

Auto-builds the shared library on first use when a compiler is available
(``make -C runtime/native``); every function has a PIL/numpy fallback with
identical semantics, so the framework never *requires* the native path —
it's a host-side throughput optimization for the stream loop.

Use :func:`available` to check, :func:`resize_lanczos` / :func:`blend` /
:func:`to_model_array` / :func:`from_model_array` as the API.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_LIB_PATH = os.path.join(_DIR, "libqie_image_ops.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    _lib = _try_load(rebuild=not os.path.exists(_LIB_PATH))
    if _lib is None and os.path.exists(_LIB_PATH):
        # stale prebuilt library (e.g. missing a newly added symbol, which
        # ctypes raises as AttributeError): rebuild once and retry
        _lib = _try_load(rebuild=True)
    return _lib


def _try_load(rebuild: bool) -> Optional[ctypes.CDLL]:
    if rebuild:
        try:
            subprocess.run(
                ["make", "-B", "-C", _DIR],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        u8 = ctypes.POINTER(ctypes.c_uint8)
        f32 = ctypes.POINTER(ctypes.c_float)
        lib.qie_resize_lanczos.argtypes = [u8, ctypes.c_int, ctypes.c_int,
                                           u8, ctypes.c_int, ctypes.c_int,
                                           ctypes.c_int]
        lib.qie_blend.argtypes = [u8, u8, u8, ctypes.c_long, ctypes.c_float]
        lib.qie_u8_to_f32_norm.argtypes = [u8, f32, ctypes.c_long]
        lib.qie_f32_to_u8.argtypes = [f32, u8, ctypes.c_long]
        lib.qie_yuv420_pack.argtypes = [u8, ctypes.c_int, ctypes.c_int, u8]
        lib.qie_yuv420_unpack.argtypes = [u8, ctypes.c_int, ctypes.c_int, u8]
        return lib
    except (OSError, AttributeError):
        return None


def available() -> bool:
    return _load() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_lanczos(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """HWC uint8 → (height, width, C) uint8, Lanczos-3 (PIL-equivalent)."""
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    if (h, w) == (height, width):
        return img
    lib = _load()
    if lib is None:
        from PIL import Image

        return np.asarray(
            Image.fromarray(img).resize((width, height), Image.LANCZOS)
        )
    out = np.empty((height, width, c), np.uint8)
    lib.qie_resize_lanczos(_u8ptr(img), h, w, _u8ptr(out), height, width, c)
    return out


def blend(a: np.ndarray, b: np.ndarray, ratio: float) -> np.ndarray:
    """uint8 blend: a·(1−ratio) + b·ratio (PIL.Image.blend parity)."""
    a = np.ascontiguousarray(a, np.uint8)
    b = np.ascontiguousarray(b, np.uint8)
    assert a.shape == b.shape
    lib = _load()
    if lib is None:
        return np.clip(
            np.rint(a.astype(np.float32) * (1 - ratio)
                    + b.astype(np.float32) * ratio), 0, 255
        ).astype(np.uint8)
    out = np.empty_like(a)
    lib.qie_blend(_u8ptr(a), _u8ptr(b), _u8ptr(out), a.size, float(ratio))
    return out


def to_model_array(img: np.ndarray) -> np.ndarray:
    """HWC uint8 → float32 in [-1, 1]."""
    img = np.ascontiguousarray(img, np.uint8)
    lib = _load()
    if lib is None:
        return img.astype(np.float32) / 255.0 * 2.0 - 1.0
    out = np.empty(img.shape, np.float32)
    lib.qie_u8_to_f32_norm(_u8ptr(img), _f32ptr(out), img.size)
    return out


def yuv420_pack(img: np.ndarray) -> "np.ndarray | None":
    """RGB uint8 (H, W, 3), H/W even → packed 4:2:0 uint8 (H/2, W/2, 6)
    in the ops/colorspace.py layout. None when the library isn't built
    (caller falls back to the PIL+numpy path)."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w, _ = img.shape
    out = np.empty((h // 2, w // 2, 6), np.uint8)
    lib.qie_yuv420_pack(_u8ptr(img), h, w, _u8ptr(out))
    return out


def yuv420_unpack(packed: np.ndarray) -> "np.ndarray | None":
    """Packed 4:2:0 uint8 (H/2, W/2, 6) → RGB uint8 (H, W, 3); None when
    the library isn't built."""
    lib = _load()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, np.uint8)
    h2, w2, _ = packed.shape
    out = np.empty((2 * h2, 2 * w2, 3), np.uint8)
    lib.qie_yuv420_unpack(_u8ptr(packed), h2, w2, _u8ptr(out))
    return out


def from_model_array(arr: np.ndarray) -> np.ndarray:
    """float32 [-1, 1] → HWC uint8."""
    arr = np.ascontiguousarray(arr, np.float32)
    lib = _load()
    if lib is None:
        return np.clip(
            np.rint((arr * 0.5 + 0.5) * 255.0), 0, 255
        ).astype(np.uint8)
    out = np.empty(arr.shape, np.uint8)
    lib.qie_f32_to_u8(_f32ptr(arr), _u8ptr(out), arr.size)
    return out
