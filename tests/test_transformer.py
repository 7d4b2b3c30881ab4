"""MMDiT transformer unit tests (tiny preset): packing round-trip, RoPE
properties, forward shapes, masking semantics, jit, timestep sensitivity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.models import transformer as tfm
from qwen_image_edit_streamdiffusion_tpu.ops import rope as rope_ops


@pytest.fixture(scope="module")
def tiny_tfm(tiny_preset):
    cfg = tiny_preset.model
    params = tfm.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_pack_unpack_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 12, 16))
    tokens = tfm.pack_latents(x)
    assert tokens.shape == (2, 4 * 6, 64)
    back = tfm.unpack_latents(tokens, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_pack_channel_major_order():
    # Token features must be (C, 2, 2)-flattened: feature index c*4 + dy*2 + dx.
    h = w = 2
    c = 3
    x = jnp.arange(h * w * c, dtype=jnp.float32).reshape(1, h, w, c)
    tok = np.asarray(tfm.pack_latents(x))[0, 0]
    expect = np.asarray(
        [x[0, dy, dx, ch] for ch in range(c) for dy in range(2) for dx in range(2)]
    )
    np.testing.assert_array_equal(tok, expect)


def test_rope_rotation_preserves_norm():
    cos, sin = rope_ops.cos_sin(
        rope_ops.image_angles([(1, 4, 4)], (8, 12, 12))
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 16, 32))
    y = rope_ops.apply_rope(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(y), axis=-1),
        rtol=1e-5,
    )


def test_rope_zero_angle_is_identity():
    angles = np.zeros((5, 16), np.float32)
    cos, sin = rope_ops.cos_sin(angles)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 5, 32))
    np.testing.assert_allclose(
        np.asarray(rope_ops.apply_rope(x, cos, sin)), np.asarray(x), rtol=1e-6
    )


def test_text_positions_clear_image_range():
    shapes = [(1, 8, 6), (1, 4, 4)]
    ia = rope_ops.image_angles(shapes, (2, 2, 2), theta=10.0)
    ta = rope_ops.text_angles(3, shapes, (2, 2, 2), theta=10.0)
    assert ia.shape == (8 * 6 + 4 * 4, 3)
    assert ta.shape == (3, 3)
    # text starts at max(h//2, w//2) = 4
    np.testing.assert_allclose(ta[0], rope_ops._axis_angles(np.array([4]), 2, 10.0)[0].repeat(3)[:3].astype(np.float32))


def test_forward_shapes_and_finite(tiny_tfm):
    cfg, params = tiny_tfm
    b, h, w, lt = 2, 8, 8, 10
    img_shapes = [(1, h // 2, w // 2)]
    li = (h // 2) * (w // 2)
    img = jax.random.normal(jax.random.PRNGKey(4), (b, li, cfg.in_channels), jnp.bfloat16)
    txt = jax.random.normal(jax.random.PRNGKey(5), (b, lt, cfg.joint_dim), jnp.bfloat16)
    ropes = tfm.make_rope(cfg, img_shapes, lt)
    t = jnp.full((b,), 1000.0)
    out = tfm.forward(params, cfg, img, txt, t, ropes, use_flash=False)
    assert out.shape == (b, li, cfg.out_channels)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_padded_text_does_not_change_output(tiny_tfm):
    # Masked-out (padded) text keys must not affect image-token outputs.
    cfg, params = tiny_tfm
    b, li, lt = 1, 16, 6
    img_shapes = [(1, 4, 4)]
    img = jax.random.normal(jax.random.PRNGKey(6), (b, li, cfg.in_channels))
    txt = jax.random.normal(jax.random.PRNGKey(7), (b, lt, cfg.joint_dim))
    t = jnp.full((b,), 500.0)

    pad = 4
    txt_padded = jnp.concatenate(
        [txt, 100.0 * jnp.ones((b, pad, cfg.joint_dim))], axis=1
    )
    mask = jnp.concatenate(
        [jnp.ones((b, lt), bool), jnp.zeros((b, pad), bool)], axis=1
    )
    ropes_a = tfm.make_rope(cfg, img_shapes, lt)
    ropes_b = tfm.make_rope(cfg, img_shapes, lt + pad)
    out_a = tfm.forward(params, cfg, img, txt, t, ropes_a,
                        txt_mask=jnp.ones((b, lt), bool), use_flash=False)
    out_b = tfm.forward(params, cfg, img, txt_padded, t, ropes_b,
                        txt_mask=mask, use_flash=False)
    np.testing.assert_allclose(
        np.asarray(out_a, np.float32), np.asarray(out_b, np.float32),
        atol=2e-5, rtol=1e-4,
    )


def test_timestep_changes_output(tiny_tfm):
    cfg, params = tiny_tfm
    img = jnp.ones((1, 16, cfg.in_channels))
    txt = jnp.ones((1, 4, cfg.joint_dim))
    ropes = tfm.make_rope(cfg, [(1, 4, 4)], 4)
    o1 = tfm.forward(params, cfg, img, txt, jnp.array([1000.0]), ropes, use_flash=False)
    o2 = tfm.forward(params, cfg, img, txt, jnp.array([2.0]), ropes, use_flash=False)
    assert np.abs(np.asarray(o1, np.float32) - np.asarray(o2, np.float32)).max() > 1e-4


def test_jit_forward(tiny_tfm):
    cfg, params = tiny_tfm
    ropes = tfm.make_rope(cfg, [(1, 4, 4)], 4)
    f = jax.jit(
        lambda p, i, x, t: tfm.forward(p, cfg, i, x, t, ropes, use_flash=False)
    )
    img = jnp.ones((1, 16, cfg.in_channels))
    txt = jnp.ones((1, 4, cfg.joint_dim))
    out = f(params, img, txt, jnp.array([500.0]))
    assert out.shape == (1, 16, cfg.out_channels)


def test_multi_image_sequence(tiny_tfm):
    # Target image + one conditioning image concatenated along the sequence.
    cfg, params = tiny_tfm
    shapes = [(1, 4, 4), (1, 2, 2)]
    li = 16 + 4
    img = jnp.ones((1, li, cfg.in_channels))
    txt = jnp.ones((1, 4, cfg.joint_dim))
    ropes = tfm.make_rope(cfg, shapes, 4)
    out = tfm.forward(params, cfg, img, txt, jnp.array([800.0]), ropes, use_flash=False)
    assert out.shape == (1, li, cfg.out_channels)


def test_fused_qkv_matches_unfused(tiny_tfm):
    from qwen_image_edit_streamdiffusion_tpu.models.optimize import fuse_qkv

    cfg, params = tiny_tfm
    fused = fuse_qkv(params)
    assert "img_qkv" in fused["blocks"][0]["attn"]
    assert "img_q" not in fused["blocks"][0]["attn"]
    img = jax.random.normal(jax.random.PRNGKey(11), (1, 16, cfg.in_channels))
    txt = jax.random.normal(jax.random.PRNGKey(12), (1, 4, cfg.joint_dim))
    ropes = tfm.make_rope(cfg, [(1, 4, 4)], 4)
    t = jnp.array([500.0])
    a = tfm.forward(params, cfg, img, txt, t, ropes, use_flash=False)
    b = tfm.forward(fused, cfg, img, txt, t, ropes, use_flash=False)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32),
                               atol=1e-5, rtol=1e-4)
