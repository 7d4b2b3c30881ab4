"""KL image VAE — TPU-native implementation of AutoencoderKLQwenImage.

The reference reaches this through ``pipeline.vae.encode/.decode``
(qwen_realtime.py:183-192) and it is a Wan2.1-style 3D *causal* video VAE
(SURVEY.md §2.2). For single-frame image editing, a causal temporal conv
degenerates exactly to a 2D conv over the last temporal kernel slice (the
two causal pad frames are zeros), so this build is natively 2D:

- NHWC activations + HWIO weights (XLA:TPU's preferred conv layout),
- channel-wise RMS norms (the Wan "RMS_norm" — f32 accumulate),
- stage layout identical to Wan2.1 so torch checkpoints convert 1:1
  (encoder: num_res_blocks per stage, 3 stride-2 downsamples with
  asymmetric (0,1) padding; decoder: num_res_blocks+1 per stage, nearest-2×
  upsample convs that halve channels; single-head attention mid-block),
- latents normalized per-channel with (latents_mean, latents_std) instead
  of a scalar scaling factor.

Structure source: Wan2.1 VAE as vendored by diffusers' AutoencoderKLQwenImage
(not copied — re-derived for 2D NHWC; torch→JAX converter in convert.py
slices ``weight[:, :, -1]`` of each temporal kernel).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from qwen_image_edit_streamdiffusion_tpu.core.rng import split_keys

from qwen_image_edit_streamdiffusion_tpu.core.config import VAEConfig
from qwen_image_edit_streamdiffusion_tpu.models.common import (
    Params,
    conv2d,
    conv2d_init,
    rms_norm,
)


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def _channel_rms(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Wan RMS_norm over channels; NHWC → last axis."""
    return rms_norm(p, x, eps=1e-12)


def _resblock_init(key, in_ch: int, out_ch: int, dtype) -> Params:
    ks = jax.random.split(key, 3)
    p = {
        "norm1": {"scale": jnp.ones((in_ch,), dtype)},
        "conv1": conv2d_init(ks[0], in_ch, out_ch, 3, dtype),
        "norm2": {"scale": jnp.ones((out_ch,), dtype)},
        "conv2": conv2d_init(ks[1], out_ch, out_ch, 3, dtype),
    }
    if in_ch != out_ch:
        p["shortcut"] = conv2d_init(ks[2], in_ch, out_ch, 1, dtype)
    return p


def _resblock(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.silu(_channel_rms(p["norm1"], x))
    h = conv2d(p["conv1"], h)
    h = jax.nn.silu(_channel_rms(p["norm2"], h))
    h = conv2d(p["conv2"], h)
    if "shortcut" in p:
        x = conv2d(p["shortcut"], x)
    return x + h


def _attnblock_init(key, ch: int, dtype) -> Params:
    k1, k2 = split_keys(key)
    return {
        "norm": {"scale": jnp.ones((ch,), dtype)},
        "qkv": conv2d_init(k1, ch, 3 * ch, 1, dtype),
        "proj": conv2d_init(k2, ch, ch, 1, dtype),
    }


def _attnblock(p: Params, x: jnp.ndarray, q_chunk: int = 4096) -> jnp.ndarray:
    """Single-head spatial self-attention (mid-block only).

    Query-chunked so the score matrix never exceeds q_chunk × HW — at 1024²
    input the bottleneck grid is 128×128 = 16k tokens and a full 16k² f32
    score matrix would burn ~1 GB of HBM for no speedup.
    """
    b, h, w, c = x.shape
    n = h * w
    qkv = conv2d(p["qkv"], _channel_rms(p["norm"], x)).reshape(b, n, 3, c)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = c ** -0.5

    def one_chunk(q_blk):
        s = jnp.einsum("bqc,bkc->bqk", q_blk, k,
                       preferred_element_type=jnp.float32) * scale
        a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bqk,bkc->bqc", a, v)

    if n <= q_chunk:
        out = one_chunk(q)
    else:
        pad = (-n) % q_chunk
        qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        blocks = qp.reshape(b, -1, q_chunk, c).transpose(1, 0, 2, 3)
        out = jax.lax.map(one_chunk, blocks)
        out = out.transpose(1, 0, 2, 3).reshape(b, -1, c)[:, :n]
    out = out.reshape(b, h, w, c)
    return x + conv2d(p["proj"], out)


def _downsample(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad (0,1)×(0,1) then 3×3 stride-2 VALID conv (Wan downsample2d)."""
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(p, x, stride=2, padding="VALID")


def _upsample(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2× then 3×3 conv halving channels (Wan upsample2d)."""
    b, h, w, c = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv2d(p, x)


# ---------------------------------------------------------------------------
# Encoder / decoder
# ---------------------------------------------------------------------------


def _stage_dims(cfg: VAEConfig) -> Tuple[int, ...]:
    return tuple(cfg.base_channels * m for m in (1,) + tuple(cfg.channel_multipliers))


def init(key: jax.Array, cfg: VAEConfig) -> Params:
    dtype = jnp.dtype(cfg.dtype)
    dims = _stage_dims(cfg)  # e.g. (96, 96, 192, 384, 384)
    z = cfg.latent_channels
    keys = iter(split_keys(key, 256))

    # --- encoder ---
    enc: Params = {"conv_in": conv2d_init(next(keys), 3, dims[0], 3, dtype)}
    down = []
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        stage: Params = {"res": []}
        c = cin
        for _ in range(cfg.num_res_blocks):
            stage["res"].append(_resblock_init(next(keys), c, cout, dtype))
            c = cout
        if i != len(cfg.channel_multipliers) - 1:
            stage["downsample"] = conv2d_init(next(keys), cout, cout, 3, dtype)
        down.append(stage)
    enc["down"] = down
    mid_ch = dims[-1]
    enc["mid"] = {
        "res1": _resblock_init(next(keys), mid_ch, mid_ch, dtype),
        "attn": _attnblock_init(next(keys), mid_ch, dtype),
        "res2": _resblock_init(next(keys), mid_ch, mid_ch, dtype),
    }
    enc["norm_out"] = {"scale": jnp.ones((mid_ch,), dtype)}
    enc["conv_out"] = conv2d_init(next(keys), mid_ch, 2 * z, 3, dtype)

    # --- decoder ---
    rdims = dims[::-1]  # (384, 384, 192, 96, 96)
    dec: Params = {"conv_in": conv2d_init(next(keys), z, rdims[0], 3, dtype)}
    dec["mid"] = {
        "res1": _resblock_init(next(keys), rdims[0], rdims[0], dtype),
        "attn": _attnblock_init(next(keys), rdims[0], dtype),
        "res2": _resblock_init(next(keys), rdims[0], rdims[0], dtype),
    }
    up = []
    for i, (cin, cout) in enumerate(zip(rdims[:-1], rdims[1:])):
        stage = {"res": []}
        c = cin if i == 0 else cin // 2  # upsample convs halve channels
        for _ in range(cfg.num_res_blocks + 1):
            stage["res"].append(_resblock_init(next(keys), c, cout, dtype))
            c = cout
        if i != len(cfg.channel_multipliers) - 1:
            stage["upsample"] = conv2d_init(next(keys), cout, cout // 2, 3, dtype)
        up.append(stage)
    dec["up"] = up
    dec["norm_out"] = {"scale": jnp.ones((rdims[-1],), dtype)}
    dec["conv_out"] = conv2d_init(next(keys), rdims[-1], 3, 3, dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": conv2d_init(next(keys), 2 * z, 2 * z, 1, dtype),
        "post_quant_conv": conv2d_init(next(keys), z, z, 1, dtype),
    }


def encode_moments(params: Params, cfg: VAEConfig, images: jnp.ndarray) -> jnp.ndarray:
    """images NHWC in [-1,1] → (B, H/8, W/8, 2z) posterior moments."""
    p = params["encoder"]
    x = conv2d(p["conv_in"], images)
    for stage in p["down"]:
        for rb in stage["res"]:
            x = _resblock(rb, x)
        if "downsample" in stage:
            x = _downsample(stage["downsample"], x)
    x = _resblock(p["mid"]["res1"], x)
    x = _attnblock(p["mid"]["attn"], x)
    x = _resblock(p["mid"]["res2"], x)
    x = jax.nn.silu(_channel_rms(p["norm_out"], x))
    x = conv2d(p["conv_out"], x)
    return conv2d(params["quant_conv"], x)


def _normalize(cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(cfg.latents_mean, z.dtype)
    std = jnp.asarray(cfg.latents_std, z.dtype)
    return (z - mean) / std


def _denormalize(cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(cfg.latents_mean, z.dtype)
    std = jnp.asarray(cfg.latents_std, z.dtype)
    return z * std + mean


def encode(
    params: Params,
    cfg: VAEConfig,
    images: jnp.ndarray,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Encode to normalized latents (B, H/8, W/8, z).

    key=None → posterior mode (deterministic; what the edit pipeline uses
    for conditioning latents); otherwise sample mu + sigma·eps.
    """
    moments = encode_moments(params, cfg, images)
    z = cfg.latent_channels
    mu, logvar = moments[..., :z], moments[..., z:]
    if key is not None:
        logvar = jnp.clip(logvar, -30.0, 20.0)
        mu = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
            key, mu.shape, mu.dtype
        )
    return _normalize(cfg, mu)


def decode(params: Params, cfg: VAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """Normalized latents (B, h, w, z) → images NHWC in [-1, 1]."""
    z = _denormalize(cfg, latents)
    z = conv2d(params["post_quant_conv"], z)
    p = params["decoder"]
    x = conv2d(p["conv_in"], z)
    x = _resblock(p["mid"]["res1"], x)
    x = _attnblock(p["mid"]["attn"], x)
    x = _resblock(p["mid"]["res2"], x)
    for stage in p["up"]:
        for rb in stage["res"]:
            x = _resblock(rb, x)
        if "upsample" in stage:
            x = _upsample(stage["upsample"], x)
    x = jax.nn.silu(_channel_rms(p["norm_out"], x))
    x = conv2d(p["conv_out"], x)
    return jnp.clip(x, -1.0, 1.0)


# single-dispatch init (see models/transformer.py init_jit)
init_jit = jax.jit(init, static_argnums=1)
