"""Perceptual quality metrics for the mechanism-proof benches.

PSNR alone can flatter blurry reconstructions; SSIM (Wang et al. 2004)
adds a structure-aware number to `suite distill` / `tiny_decoder` /
`cfg_quality` (VERDICT r4 next #8 — the reference eyeballs saved images,
compare_cfg_quality.py). Pure numpy, gaussian-windowed (11×11, σ=1.5 —
the standard parameterization), luma-domain for RGB inputs.

`temporal_flicker` quantifies stream coherence: the mean absolute
inter-frame pixel delta of consecutive outputs, reported by the stream
benches with vs without temporal-latent reuse. Lower = steadier video
under identical input motion (the StreamDiffusion temporal-consistency
claim, made checkable).

All numbers on random-init weights prove mechanisms, not product
quality — the callers print the standing banner.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def _luma(img: np.ndarray) -> np.ndarray:
    """HWC RGB (or HW already-gray) float → Rec. 601 luma, float64."""
    a = np.asarray(img, np.float64)
    if a.ndim == 3:
        a = a @ np.array([0.299, 0.587, 0.114])
    return a


def _gaussian_filter2d(img: np.ndarray, sigma: float, radius: int
                       ) -> np.ndarray:
    """Separable 'valid' gaussian blur (no edge effects enter the SSIM
    statistics — matches the skimage/reference implementations' crop)."""
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    # rows then columns via sliding windows (the window axis lands last,
    # so `@ g` contracts it and the (H', W') orientation is preserved)
    win = np.lib.stride_tricks.sliding_window_view
    out = win(img, 2 * radius + 1, axis=1) @ g
    return win(out, 2 * radius + 1, axis=0) @ g


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 255.0,
         sigma: float = 1.5, radius: int = 5) -> float:
    """Mean SSIM of two images (HWC RGB or HW gray, same shape), in the
    luma domain. 1.0 = identical; >0.97 is typically visually
    indistinguishable; <0.9 clearly visible differences."""
    ya, yb = _luma(a), _luma(b)
    if ya.shape != yb.shape:
        raise ValueError(f"shape mismatch {ya.shape} vs {yb.shape}")
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    f = lambda im: _gaussian_filter2d(im, sigma, radius)
    mu_a, mu_b = f(ya), f(yb)
    var_a = f(ya * ya) - mu_a * mu_a
    var_b = f(yb * yb) - mu_b * mu_b
    cov = f(ya * yb) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2)
    return float((num / den).mean())


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    mse = float(((np.asarray(a, np.float64)
                  - np.asarray(b, np.float64)) ** 2).mean())
    return float("inf") if mse == 0 else float(
        10 * np.log10(data_range ** 2 / mse))


def temporal_flicker(frames: Sequence[np.ndarray]) -> float:
    """Mean |frame_t − frame_{t−1}| over a sequence of outputs (uint8
    scale). 0 = perfectly steady; higher = more frame-to-frame churn for
    the same input motion."""
    if len(frames) < 2:
        raise ValueError("need ≥2 frames")
    arrs = [np.asarray(f, np.float64) for f in frames]
    return float(np.mean([np.abs(x - y).mean()
                          for x, y in zip(arrs[1:], arrs[:-1])]))
