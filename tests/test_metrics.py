"""SSIM / PSNR / temporal-flicker metrics (benchmarks/metrics.py) used by
the quality benches (suite distill / tiny_decoder / cfg_quality / stream
coherence, VERDICT r4 next #8)."""

import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.benchmarks import metrics


def _img(seed=0, shape=(48, 48, 3)):
    return np.random.default_rng(seed).integers(0, 255, shape).astype(
        np.uint8)


def test_ssim_identity_is_one():
    a = _img()
    assert metrics.ssim(a, a) == pytest.approx(1.0)


def test_ssim_monotone_under_increasing_noise():
    rng = np.random.default_rng(1)
    base = np.tile(np.linspace(0, 255, 64)[None, :, None], (64, 1, 3))
    vals = []
    for sigma in (2, 10, 40):
        noisy = np.clip(base + rng.normal(0, sigma, base.shape), 0, 255)
        vals.append(metrics.ssim(base, noisy))
    assert vals[0] > vals[1] > vals[2]
    assert all(0.0 < v < 1.0 for v in vals)


def test_ssim_grayscale_and_rgb_accepted():
    a = _img(2, (32, 32))
    b = _img(3, (32, 32))
    assert -1.0 <= metrics.ssim(a, b) <= 1.0
    with pytest.raises(ValueError):
        metrics.ssim(_img(0, (32, 32, 3)), _img(0, (48, 48, 3)))


def test_ssim_structure_sensitivity_vs_psnr_blindspot():
    """A constant brightness offset barely moves SSIM (structure intact)
    while PSNR drops hard — the reason the quality benches print both."""
    base = np.tile(np.linspace(20, 235, 64)[None, :, None], (64, 1, 3))
    shifted = np.clip(base + 12.0, 0, 255)
    assert metrics.psnr(base, shifted) < 30
    assert metrics.ssim(base, shifted) > 0.95


def test_psnr_identity_inf_and_known_value():
    a = _img(4)
    assert metrics.psnr(a, a) == float("inf")
    b = np.clip(a.astype(np.float64) + 1.0, 0, 255)
    # |delta| ≈ 1 → PSNR ≈ 20·log10(255) ≈ 48.1 dB
    assert 47.0 < metrics.psnr(a, b) < 48.2


def test_temporal_flicker():
    a = _img(5)
    assert metrics.temporal_flicker([a, a, a]) == 0.0
    seq = [_img(i) for i in range(4)]
    assert metrics.temporal_flicker(seq) > 50
    with pytest.raises(ValueError):
        metrics.temporal_flicker([a])


def test_animated_sine_phase_moves_the_pattern():
    from qwen_image_edit_streamdiffusion_tpu.core import imaging

    f0 = np.asarray(imaging.make_test_image(32, 32, "sine", phase=0.0))
    f1 = np.asarray(imaging.make_test_image(32, 32, "sine", phase=0.5))
    assert np.abs(f0.astype(float) - f1.astype(float)).mean() > 1.0
    # default stays the historical static pattern
    f_default = np.asarray(imaging.make_test_image(32, 32, "sine"))
    assert np.array_equal(f0, f_default)
