"""Checkpoint conversion round-trips and LoRA fusion semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.models import (
    convert,
    lora,
    transformer as tfm,
    vae as vae_mod,
)


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32),
            atol=1e-3, rtol=1e-2,
        )


def test_transformer_roundtrip(tiny_preset):
    cfg = tiny_preset.model
    params = tfm.init(jax.random.PRNGKey(0), cfg)
    state = convert.export_transformer(params, cfg)
    # torch layout sanity: linear weights are (out, in)
    assert state["img_in.weight"].shape == (cfg.inner_dim, cfg.in_channels)
    back = convert.convert_transformer(state, cfg)
    _tree_equal(params, back)


def test_transformer_missing_key_raises(tiny_preset):
    cfg = tiny_preset.model
    params = tfm.init(jax.random.PRNGKey(0), cfg)
    state = convert.export_transformer(params, cfg)
    state.pop("proj_out.bias")
    state["bogus.key"] = np.zeros(3)
    with pytest.raises(ValueError, match="missing"):
        convert.convert_transformer(state, cfg)


def test_vae_roundtrip(tiny_preset):
    cfg = tiny_preset.vae
    params = vae_mod.init(jax.random.PRNGKey(1), cfg)
    state = convert.export_vae(params, cfg)
    back = convert.convert_vae(state, cfg)
    _tree_equal(params, back)


def test_vae_causal3d_temporal_slice(tiny_preset):
    # A 3D-causal conv checkpoint converts by taking the last temporal slice.
    cfg = tiny_preset.vae
    params = vae_mod.init(jax.random.PRNGKey(1), cfg)
    state = convert.export_vae(params, cfg)
    k = "encoder.conv_in.weight"
    w2d = state[k]  # (out, in, kh, kw)
    w3d = np.stack([np.zeros_like(w2d), np.zeros_like(w2d), w2d], axis=2)
    state[k] = w3d  # (out, in, t=3, kh, kw)
    back = convert.convert_vae(state, cfg)
    np.testing.assert_allclose(
        np.asarray(back["encoder"]["conv_in"]["w"], np.float32),
        np.asarray(params["encoder"]["conv_in"]["w"], np.float32),
        atol=1e-3, rtol=1e-2,
    )


def _mk_lora_state(cfg, rank=4, blocks=(0,), module="attn.to_q", seed=0):
    rng = np.random.default_rng(seed)
    d = cfg.inner_dim
    state = {}
    for i in blocks:
        state[f"transformer_blocks.{i}.{module}.lora_A.weight"] = (
            rng.standard_normal((rank, d)).astype(np.float32) * 0.1
        )
        state[f"transformer_blocks.{i}.{module}.lora_B.weight"] = (
            rng.standard_normal((d, rank)).astype(np.float32) * 0.1
        )
    return state


def test_lora_fusion_changes_only_target(tiny_preset):
    cfg = tiny_preset.model
    params = tfm.init(jax.random.PRNGKey(0), cfg)
    state = _mk_lora_state(cfg, blocks=(0,))
    fused = lora.fuse_lora(params, state)
    a = state["transformer_blocks.0.attn.to_q.lora_A.weight"]
    b = state["transformer_blocks.0.attn.to_q.lora_B.weight"]
    expect = np.asarray(params["blocks"][0]["attn"]["img_q"]["w"], np.float32) + a.T @ b.T
    np.testing.assert_allclose(
        np.asarray(fused["blocks"][0]["attn"]["img_q"]["w"], np.float32),
        expect, atol=0.05, rtol=0.02,  # bf16 storage
    )
    # untouched leaves identical
    np.testing.assert_array_equal(
        np.asarray(fused["blocks"][1]["attn"]["img_q"]["w"], np.float32),
        np.asarray(params["blocks"][1]["attn"]["img_q"]["w"], np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(fused["blocks"][0]["attn"]["img_k"]["w"], np.float32),
        np.asarray(params["blocks"][0]["attn"]["img_k"]["w"], np.float32),
    )


def test_lora_alpha_scaling(tiny_preset):
    cfg = tiny_preset.model
    params = tfm.init(jax.random.PRNGKey(0), cfg)
    state = _mk_lora_state(cfg, rank=4)
    state["transformer_blocks.0.attn.to_q.alpha"] = np.float32(2.0)
    fused = lora.fuse_lora(params, state)
    a = state["transformer_blocks.0.attn.to_q.lora_A.weight"]
    b = state["transformer_blocks.0.attn.to_q.lora_B.weight"]
    expect = np.asarray(params["blocks"][0]["attn"]["img_q"]["w"], np.float32) \
        + (2.0 / 4.0) * (a.T @ b.T)
    np.testing.assert_allclose(
        np.asarray(fused["blocks"][0]["attn"]["img_q"]["w"], np.float32),
        expect, atol=0.05, rtol=0.02,
    )


def test_lora_unknown_key_raises(tiny_preset):
    cfg = tiny_preset.model
    params = tfm.init(jax.random.PRNGKey(0), cfg)
    state = _mk_lora_state(cfg)
    state["transformer_blocks.0.attn.nonexistent.lora_A.weight"] = np.zeros((4, 8))
    with pytest.raises(ValueError, match="unrecognized"):
        lora.fuse_lora(params, state)


def test_lora_fusion_changes_forward(tiny_preset):
    cfg = tiny_preset.model
    params = tfm.init(jax.random.PRNGKey(0), cfg)
    fused = lora.fuse_lora(params, _mk_lora_state(cfg, blocks=(0, 1)))
    img = jnp.ones((1, 16, cfg.in_channels))
    txt = jnp.ones((1, 4, cfg.joint_dim))
    ropes = tfm.make_rope(cfg, [(1, 4, 4)], 4)
    t = jnp.array([500.0])
    o1 = tfm.forward(params, cfg, img, txt, t, ropes, use_flash=False)
    o2 = tfm.forward(fused, cfg, img, txt, t, ropes, use_flash=False)
    assert np.abs(np.asarray(o1, np.float32) - np.asarray(o2, np.float32)).max() > 1e-5


def test_vl_roundtrip(tiny_preset):
    import jax
    from qwen_image_edit_streamdiffusion_tpu.models import qwen_vl

    cfg = tiny_preset.vl
    kv, kl = jax.random.split(jax.random.PRNGKey(3))
    params = {"vision": qwen_vl.vision_init(kv, cfg),
              "lm": qwen_vl.lm_init(kl, cfg)}
    state = convert.export_vl(params, cfg)
    # hf-style outer prefixes must be normalized away by convert_vl
    state = {
        ("model.language_model." + k[len("model."):]
         if k.startswith("model.") else k): v
        for k, v in state.items()
    }
    back = convert.convert_vl(state, cfg)
    _tree_equal(params, back)


def test_lora_fusion_onto_fused_qkv(tiny_preset):
    from qwen_image_edit_streamdiffusion_tpu.models.optimize import fuse_qkv

    cfg = tiny_preset.model
    params = tfm.init(jax.random.PRNGKey(0), cfg)
    state = _mk_lora_state(cfg, module="attn.to_k")
    # fusing LoRA into an unfused tree then fusing qkv must equal
    # fusing qkv first then LoRA onto the fused leaf
    a = fuse_qkv(lora.fuse_lora(params, state))
    b = lora.fuse_lora(fuse_qkv(params), state)
    np.testing.assert_allclose(
        np.asarray(a["blocks"][0]["attn"]["img_qkv"]["w"], np.float32),
        np.asarray(b["blocks"][0]["attn"]["img_qkv"]["w"], np.float32),
        atol=1e-3, rtol=1e-2,
    )
