"""MMDiT diffusion transformer — TPU-native QwenImageTransformer2DModel.

The ~20B double-stream DiT the reference runs through diffusers (compiled at
test_compiled.py:39-43, quantized at benchmark_int8.py:75; architecture
notes in SURVEY.md §2.2): joint attention over a text stream (Qwen2.5-VL
hidden states) and a packed image-latent stream, per-stream AdaLN timestep
modulation, QK RMSNorm, 3D RoPE over the (frame, h, w) patch grid, and
2×2-packed 16-channel latents (64-ch tokens).

TPU-first design choices:
- pure function over an explicit param pytree → shards with NamedSharding,
  jits once per shape bucket, and LoRA fuses into the weights before trace
  (resolving the reference's torch.compile-vs-LoRA conflict, README.md:108);
- bf16 weights/activations (MXU-native), f32 for norms/softmax/modulation;
- one fused joint attention ([txt ⊕ img] concat) per block via
  ops.attention → Pallas flash kernel on TPU;
- RoPE tables are pure functions of static shapes (ops.rope) and fold into
  the compiled graph.

Layout convention: sequences are (batch, seq, dim); attention uses
(batch, heads, seq, head_dim).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from qwen_image_edit_streamdiffusion_tpu.core.rng import split_keys

from qwen_image_edit_streamdiffusion_tpu.core.config import ModelConfig
from qwen_image_edit_streamdiffusion_tpu.models.common import (
    Params,
    gelu_tanh,
    layer_norm,
    linear,
    linear_init,
    rms_norm,
    rms_norm_init,
    timestep_embedding,
)
from qwen_image_edit_streamdiffusion_tpu.ops import rope as rope_ops
from qwen_image_edit_streamdiffusion_tpu.ops.attention import attention


# ---------------------------------------------------------------------------
# Latent packing (2×2 patchify, channel-major token features — matches the
# upstream pipeline's pack/unpack so converted checkpoints see identical
# token layouts)
# ---------------------------------------------------------------------------


def pack_latents(latents: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w, C) NHWC latents → (B, (h/2)(w/2), 4C) tokens.

    Token feature order is channel-major over the 2×2 patch: (C, 2, 2)
    flattened — the upstream ``_pack_latents`` convention.
    """
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, h/2, w/2, C, 2, 2
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(tokens: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, (h/2)(w/2), 4C) tokens → (B, h, w, C) NHWC latents."""
    b, n, d = tokens.shape
    c = d // 4
    x = tokens.reshape(b, h // 2, w // 2, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, h/2, 2, w/2, 2, C
    return x.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _block_init(key, cfg: ModelConfig, dtype) -> Params:
    d = cfg.inner_dim
    ks = iter(split_keys(key, 16))
    attn = {
        "img_q": linear_init(next(ks), d, d, dtype),
        "img_k": linear_init(next(ks), d, d, dtype),
        "img_v": linear_init(next(ks), d, d, dtype),
        "txt_q": linear_init(next(ks), d, d, dtype),
        "txt_k": linear_init(next(ks), d, d, dtype),
        "txt_v": linear_init(next(ks), d, d, dtype),
        "img_norm_q": rms_norm_init(cfg.head_dim, dtype),
        "img_norm_k": rms_norm_init(cfg.head_dim, dtype),
        "txt_norm_q": rms_norm_init(cfg.head_dim, dtype),
        "txt_norm_k": rms_norm_init(cfg.head_dim, dtype),
        "img_out": linear_init(next(ks), d, d, dtype),
        "txt_out": linear_init(next(ks), d, d, dtype),
    }
    return {
        "img_mod": linear_init(next(ks), d, 6 * d, dtype),
        "txt_mod": linear_init(next(ks), d, 6 * d, dtype),
        "attn": attn,
        "img_mlp": {
            "fc1": linear_init(next(ks), d, cfg.mlp_dim, dtype),
            "fc2": linear_init(next(ks), cfg.mlp_dim, d, dtype),
        },
        "txt_mlp": {
            "fc1": linear_init(next(ks), d, cfg.mlp_dim, dtype),
            "fc2": linear_init(next(ks), cfg.mlp_dim, d, dtype),
        },
    }


def init(key: jax.Array, cfg: ModelConfig) -> Params:
    dtype = jnp.dtype(cfg.dtype)
    d = cfg.inner_dim
    n_top = 8
    keys = jax.random.split(key, cfg.num_layers + n_top)
    return {
        "img_in": linear_init(keys[0], cfg.in_channels, d, dtype),
        "txt_norm": rms_norm_init(cfg.joint_dim, dtype),
        "txt_in": linear_init(keys[1], cfg.joint_dim, d, dtype),
        "time_mlp": {
            "fc1": linear_init(keys[2], cfg.time_freq_dim, d, dtype),
            "fc2": linear_init(keys[3], d, d, dtype),
        },
        "blocks": [
            _block_init(keys[n_top + i], cfg, dtype)
            for i in range(cfg.num_layers)
        ],
        # AdaLayerNormContinuous: silu(temb) @ linear → (scale, shift)
        "norm_out": {"linear": linear_init(keys[4], d, 2 * d, dtype)},
        "proj_out": linear_init(keys[5], d, cfg.out_channels, dtype),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


class RopeTables(NamedTuple):
    img_cos: jnp.ndarray  # (L_img, head_dim/2)
    img_sin: jnp.ndarray
    txt_cos: jnp.ndarray  # (L_txt, head_dim/2)
    txt_sin: jnp.ndarray


def make_rope(
    cfg: ModelConfig,
    img_shapes: Sequence[Tuple[int, int, int]],
    txt_len: int,
) -> RopeTables:
    """Build RoPE cos/sin tables for a (img_shapes, txt_len) bucket.

    Pure function of static shapes — call outside jit or let it constant-fold.
    """
    ia = rope_ops.image_angles(tuple(img_shapes), cfg.axes_dims_rope, cfg.rope_theta)
    ta = rope_ops.text_angles(txt_len, tuple(img_shapes), cfg.axes_dims_rope, cfg.rope_theta)
    ic, is_ = rope_ops.cos_sin(ia)
    tc, ts = rope_ops.cos_sin(ta)
    return RopeTables(ic, is_, tc, ts)


def _heads(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """(B, L, H*D) → (B, H, L, D)."""
    b, l, hd = x.shape
    return x.reshape(b, l, n, hd // n).transpose(0, 2, 1, 3)


def _unheads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def _modulate(x: jnp.ndarray, mod: jnp.ndarray, eps: float):
    """Affine-free LayerNorm then (1+scale)·x + shift; returns (y, gate)."""
    shift, scale, gate = jnp.split(mod, 3, axis=-1)
    y = layer_norm(x, eps)
    y = y * (1.0 + scale[:, None, :].astype(jnp.float32)).astype(y.dtype) \
        + shift[:, None, :].astype(y.dtype)
    return y, gate[:, None, :]


def _joint_attention(
    p: Params,
    cfg: ModelConfig,
    img: jnp.ndarray,
    txt: jnp.ndarray,
    ropes: RopeTables,
    txt_mask: Optional[jnp.ndarray],
    use_flash: bool,
    mesh=None,
):
    nh = cfg.num_heads
    if "img_qkv" in p:  # fused projections (models.optimize.fuse_qkv)
        iqkv = linear(p["img_qkv"], img)
        tqkv = linear(p["txt_qkv"], txt)
        iq_, ik_, iv_ = jnp.split(iqkv, 3, axis=-1)
        tq_, tk_, tv_ = jnp.split(tqkv, 3, axis=-1)
        iq, ik, iv = _heads(iq_, nh), _heads(ik_, nh), _heads(iv_, nh)
        tq, tk, tv = _heads(tq_, nh), _heads(tk_, nh), _heads(tv_, nh)
    else:
        iq = _heads(linear(p["img_q"], img), nh)
        ik = _heads(linear(p["img_k"], img), nh)
        iv = _heads(linear(p["img_v"], img), nh)
        tq = _heads(linear(p["txt_q"], txt), nh)
        tk = _heads(linear(p["txt_k"], txt), nh)
        tv = _heads(linear(p["txt_v"], txt), nh)

    iq = rms_norm(p["img_norm_q"], iq, cfg.eps)
    ik = rms_norm(p["img_norm_k"], ik, cfg.eps)
    tq = rms_norm(p["txt_norm_q"], tq, cfg.eps)
    tk = rms_norm(p["txt_norm_k"], tk, cfg.eps)

    iq = rope_ops.apply_rope(iq, ropes.img_cos, ropes.img_sin)
    ik = rope_ops.apply_rope(ik, ropes.img_cos, ropes.img_sin)
    tq = rope_ops.apply_rope(tq, ropes.txt_cos, ropes.txt_sin)
    tk = rope_ops.apply_rope(tk, ropes.txt_cos, ropes.txt_sin)

    # Joint sequence: text first, then image (upstream convention).
    q = jnp.concatenate([tq, iq], axis=2)
    k = jnp.concatenate([tk, ik], axis=2)
    v = jnp.concatenate([tv, iv], axis=2)

    kv_mask = None
    if txt_mask is not None:
        b = img.shape[0]
        img_ones = jnp.ones((b, img.shape[1]), dtype=bool)
        kv_mask = jnp.concatenate([txt_mask.astype(bool), img_ones], axis=1)

    # only the bucketed text prefix can hold padded keys — the flash
    # kernel skips mask work on all image k-blocks
    out = attention(q, k, v, kv_mask=kv_mask, use_flash=use_flash,
                    mesh=mesh, mask_len=txt.shape[1])
    out = _unheads(out)
    lt = txt.shape[1]
    txt_attn = linear(p["txt_out"], out[:, :lt])
    img_attn = linear(p["img_out"], out[:, lt:])
    return img_attn, txt_attn


def _block(
    p: Params,
    cfg: ModelConfig,
    img: jnp.ndarray,
    txt: jnp.ndarray,
    temb_act: jnp.ndarray,
    ropes: RopeTables,
    txt_mask: Optional[jnp.ndarray],
    use_flash: bool,
    mesh=None,
):
    img_mod = linear(p["img_mod"], temb_act)  # (B, 6D)
    txt_mod = linear(p["txt_mod"], temb_act)
    img_mod1, img_mod2 = jnp.split(img_mod, 2, axis=-1)
    txt_mod1, txt_mod2 = jnp.split(txt_mod, 2, axis=-1)

    img_n, img_gate1 = _modulate(img, img_mod1, cfg.eps)
    txt_n, txt_gate1 = _modulate(txt, txt_mod1, cfg.eps)
    img_attn, txt_attn = _joint_attention(
        p["attn"], cfg, img_n, txt_n, ropes, txt_mask, use_flash, mesh
    )
    img = img + img_gate1.astype(img.dtype) * img_attn
    txt = txt + txt_gate1.astype(txt.dtype) * txt_attn

    img_n, img_gate2 = _modulate(img, img_mod2, cfg.eps)
    txt_n, txt_gate2 = _modulate(txt, txt_mod2, cfg.eps)
    img = img + img_gate2.astype(img.dtype) * linear(
        p["img_mlp"]["fc2"], gelu_tanh(linear(p["img_mlp"]["fc1"], img_n))
    )
    txt = txt + txt_gate2.astype(txt.dtype) * linear(
        p["txt_mlp"]["fc2"], gelu_tanh(linear(p["txt_mlp"]["fc1"], txt_n))
    )
    return img, txt


def forward(
    params: Params,
    cfg: ModelConfig,
    img_tokens: jnp.ndarray,  # (B, L_img, in_channels) packed latents
    txt_embeds: jnp.ndarray,  # (B, L_txt, joint_dim) VL hidden states
    timesteps: jnp.ndarray,  # (B,) in train-timestep units (0..1000)
    ropes: RopeTables,
    txt_mask: Optional[jnp.ndarray] = None,  # (B, L_txt) bool
    use_flash: bool = True,
    mesh=None,  # tensor-parallel mesh: shard_maps the flash kernel over heads
    remat: bool = False,  # checkpoint each block (training memory profile)
    blocks_extra: Optional[Sequence] = None,  # per-block side input (LoRA)
    block_map=None,  # (block_params, extra) -> effective block params
) -> jnp.ndarray:
    """Velocity prediction for every image token: (B, L_img, out_channels).

    Callers slice off the target-image positions (conditioning-image tokens
    ride along in the sequence but their predictions are discarded).

    remat=True wraps each block in jax.checkpoint so the backward saves
    only the block-boundary residual streams and recomputes within-block
    activations — the training memory profile. block_map/blocks_extra let
    a caller derive each block's effective params from a side input
    (LoRA adapters) INSIDE the checkpointed region: the derived weights
    (w + scale·aᵢ@bᵢ) are then rematerialized in the backward instead of
    being saved as residuals, which would otherwise keep a second full
    parameter copy resident (training/lora_train.py).
    """
    img = linear(params["img_in"], img_tokens)
    txt = linear(params["txt_in"], rms_norm(params["txt_norm"], txt_embeds, cfg.eps))

    t_feat = timestep_embedding(timesteps, cfg.time_freq_dim, scale=1.0)
    temb = linear(params["time_mlp"]["fc2"],
                  jax.nn.silu(linear(params["time_mlp"]["fc1"],
                                     t_feat.astype(img.dtype))))
    temb_act = jax.nn.silu(temb.astype(jnp.float32)).astype(img.dtype)

    def apply(blk, extra, img, txt):
        if block_map is not None:
            blk = block_map(blk, extra)
        return _block(blk, cfg, img, txt, temb_act, ropes, txt_mask,
                      use_flash, mesh)

    if remat:
        # closed-over tracers (temb_act, ropes, mask) are tiny; the big
        # within-block activations are recomputed in the backward
        apply = jax.checkpoint(apply)

    extras = (blocks_extra if blocks_extra is not None
              else [None] * len(params["blocks"]))
    for blk, extra in zip(params["blocks"], extras):
        img, txt = apply(blk, extra, img, txt)

    # AdaLayerNormContinuous head: scale first, then shift.
    cond = linear(params["norm_out"]["linear"], temb_act)
    scale, shift = jnp.split(cond, 2, axis=-1)
    out = layer_norm(img, cfg.eps)
    out = out * (1.0 + scale[:, None, :]).astype(out.dtype) \
        + shift[:, None, :].astype(out.dtype)
    return linear(params["proj_out"], out)


# One-dispatch init: the eager path issues one tiny device op per parameter
# tensor, each paying the remote-accelerator per-op overhead (hundreds of
# ops per model). The jitted wrapper collapses a whole model's init into a
# single executable, and the persistent compile cache makes warm restarts a
# disk read. Same keys -> bit-identical params either way.
init_jit = jax.jit(init, static_argnums=1)
