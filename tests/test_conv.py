"""Pallas small-channel conv kernel vs the XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.ops.conv import (
    conv3x3,
    supported,
    _pick_tiles,
)


def _ref(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b


@pytest.mark.parametrize("shape", [
    (1, 16, 128, 8, 16),
    (2, 32, 256, 16, 8),    # batch > 1, tw=256 tile path
    (1, 24, 64, 32, 32),    # th=8 fallback, tw=64
    (1, 16, 128, 64, 64),   # the decode hot shape (scaled down spatially)
])
def test_conv3x3_matches_xla(shape):
    bsz, h, w, c, f = shape
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (bsz, h, w, c), jnp.float32)
    wt = jax.random.normal(key, (3, 3, c, f), jnp.float32) * 0.1
    b = jax.random.normal(key, (f,), jnp.float32)
    assert supported(x, wt, 1, "SAME")
    got = conv3x3(x, wt, b, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_ref(x, wt, b)), atol=2e-4, rtol=1e-4
    )


def test_supported_gates():
    x = jnp.zeros((1, 16, 128, 64), jnp.bfloat16)
    w = jnp.zeros((3, 3, 64, 64), jnp.bfloat16)
    assert supported(x, w, 1, "SAME")
    assert not supported(x, w, 2, "SAME")          # strided
    assert not supported(x, w, 1, "VALID")          # padding
    assert not supported(x, jnp.zeros((1, 1, 64, 64), jnp.bfloat16), 1, "SAME")
    big = jnp.zeros((1, 16, 128, 256), jnp.bfloat16)
    assert not supported(big, jnp.zeros((3, 3, 256, 256)), 1, "SAME")  # C>128
    odd = jnp.zeros((1, 10, 100, 64), jnp.bfloat16)  # non-tileable extent
    assert not supported(odd, w, 1, "SAME")


def test_pick_tiles():
    assert _pick_tiles(1024, 1024) == (16, 256)
    assert _pick_tiles(512, 512) == (16, 256)
    assert _pick_tiles(64, 64) == (16, 64)
    assert _pick_tiles(24, 192) == (8, 64)
    assert _pick_tiles(10, 100) == (None, None)


def test_conv2d_dispatch_off_tpu():
    # on CPU the dispatcher must fall through to XLA (platform gate)
    from qwen_image_edit_streamdiffusion_tpu.models.common import conv2d

    p = {"w": jnp.ones((3, 3, 8, 8), jnp.float32) * 0.1,
         "b": jnp.zeros((8,), jnp.float32)}
    x = jnp.ones((1, 16, 128, 8), jnp.float32)
    out = conv2d(p, x)
    ref = _ref(x, p["w"], p["b"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
