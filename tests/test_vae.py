"""VAE shape/determinism/jit tests (tiny preset)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.models import vae


@pytest.fixture(scope="module")
def tiny_vae(tiny_preset):
    cfg = tiny_preset.vae
    params = vae.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_encode_decode_shapes(tiny_vae):
    cfg, params = tiny_vae
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    z = vae.encode(params, cfg, img)
    assert z.shape == (1, 8, 8, cfg.latent_channels)
    out = vae.decode(params, cfg, z)
    assert out.shape == (1, 64, 64, 3)
    assert np.asarray(out).min() >= -1.0 and np.asarray(out).max() <= 1.0


def test_encode_deterministic_mode(tiny_vae):
    cfg, params = tiny_vae
    img = jnp.ones((1, 32, 32, 3)) * 0.25
    z1 = vae.encode(params, cfg, img)
    z2 = vae.encode(params, cfg, img)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


def test_encode_sampling_differs_by_key(tiny_vae):
    cfg, params = tiny_vae
    img = jnp.ones((1, 32, 32, 3)) * 0.25
    z1 = vae.encode(params, cfg, img, key=jax.random.PRNGKey(1))
    z2 = vae.encode(params, cfg, img, key=jax.random.PRNGKey(2))
    assert np.abs(np.asarray(z1) - np.asarray(z2)).max() > 0


def test_non_square_and_batch(tiny_vae):
    cfg, params = tiny_vae
    img = jnp.zeros((2, 32, 64, 3), jnp.float32)
    z = vae.encode(params, cfg, img)
    assert z.shape == (2, 4, 8, cfg.latent_channels)
    out = vae.decode(params, cfg, z)
    assert out.shape == (2, 32, 64, 3)


def test_jit_and_finite(tiny_vae):
    cfg, params = tiny_vae
    enc = jax.jit(lambda p, x: vae.encode(p, cfg, x))
    dec = jax.jit(lambda p, z: vae.decode(p, cfg, z))
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 3)) * 2 - 1
    z = enc(params, img)
    out = dec(params, z)
    assert np.all(np.isfinite(np.asarray(z)))
    assert np.all(np.isfinite(np.asarray(out)))


def test_normalization_roundtrip(tiny_vae):
    cfg, _ = tiny_vae
    z = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 4, cfg.latent_channels))
    back = vae._normalize(cfg, vae._denormalize(cfg, z))
    np.testing.assert_allclose(np.asarray(back), np.asarray(z), atol=1e-5)
