"""Tiny latent decoder — the TAESD analog, distilled in-framework.

StreamDiffusion (the system the reference is "inspired by",
/root/reference/README.md:186-191) pairs its pipeline with the Tiny
AutoencoderKL ("TAESD") so realtime frames skip the full VAE decoder;
the reference never wired an equivalent for Qwen-Image's Wan-style VAE
(its decode rides `pipeline.vae.decode`, qwen_realtime.py:188-199, and
no tiny decoder exists for that latent space to download). This build
closes the loop the same way it closes the Lightning-LoRA loop: the
architecture lives here, `training/tiny_vae.py` distills it from the
full decoder, and `StreamConfig.decoder="tiny"` serves it.

TPU-first design notes:

- NHWC + HWIO throughout (XLA:TPU's native conv layout); every conv is
  a stride-1 SAME 3×3 at a fixed ``width`` channels, run through XLA's
  conv lowering, NOT the small-C Pallas kernel (ops/conv.py): in this
  pure relu→conv→conv→residual chain XLA fuses the whole block and
  beats the kernel 1.7× (measured 2026-08-19 @1024², bench-2b: 17.0 ms
  per decode XLA vs 29.3 Pallas), while inside the full VAE — where
  norms break up the chain — the kernel still wins (55.3 vs 59.1 ms).
- One uniform ``width`` (default 64 = one TPU lane register of
  channels) instead of the full decoder's 384→96 pyramid: no channel
  reshuffles, every matmul tile identical, XLA fuses the ReLUs into the
  convs.
- MEASURED at 1024² output (width 64, 2 blocks/stage, v5e via tunnel):
  **17.0 ms** per decode vs the full VAE's 55.3 ms device time — a
  3.25× decode-stage win. The ~30× FLOP ratio (0.5 vs ~15 TFLOP) does
  not all materialize because 64-lane convs half-fill the MXU and the
  F=3 output conv is overhead-bound; the remaining decode time is
  bandwidth/underfill, not FLOPs.
- Consumes the pipeline's **normalized** latents (the denoise loop's
  output domain) directly: the per-channel (mean, std) affine the full
  path applies in ``vae._denormalize`` is learnable by the first conv,
  so the tiny path skips it.

Weights are float-dtype leaves in a plain nested dict (same convention
as the other models), saved/loaded as flat safetensors — the artifact
`training/tiny_vae.py` writes and `--tiny-decoder` serves.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from qwen_image_edit_streamdiffusion_tpu.core.config import VAEConfig
from qwen_image_edit_streamdiffusion_tpu.core.rng import split_keys
from qwen_image_edit_streamdiffusion_tpu.models.common import (
    Params,
    conv2d,
    conv2d_init,
)


@dataclasses.dataclass(frozen=True)
class TinyDecoderConfig:
    """Architecture of the tiny decoder. ``spatial_upsample`` must match
    the paired VAE's ``spatial_downsample`` (the latent grid it reads)."""

    latent_channels: int = 16
    width: int = 64
    blocks_per_stage: int = 2
    spatial_upsample: int = 8
    dtype: str = "bfloat16"

    @classmethod
    def from_vae(cls, vae_cfg: VAEConfig, width: int = 64,
                 blocks_per_stage: int = 2,
                 dtype: str | None = None) -> "TinyDecoderConfig":
        return cls(latent_channels=vae_cfg.latent_channels, width=width,
                   blocks_per_stage=blocks_per_stage,
                   spatial_upsample=vae_cfg.spatial_downsample,
                   dtype=dtype or vae_cfg.dtype)

    @property
    def num_upsamples(self) -> int:
        n = self.spatial_upsample.bit_length() - 1
        if 1 << n != self.spatial_upsample:
            raise ValueError(
                f"spatial_upsample must be a power of 2, got "
                f"{self.spatial_upsample}")
        return n


def _block_init(key, width: int, dtype) -> Params:
    k1, k2 = split_keys(key)
    return {
        "conv1": conv2d_init(k1, width, width, 3, dtype),
        "conv2": conv2d_init(k2, width, width, 3, dtype),
    }


def _block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = conv2d(p["conv1"], jax.nn.relu(x), use_pallas=False)
    h = conv2d(p["conv2"], jax.nn.relu(h), use_pallas=False)
    return x + h


def init(key: jax.Array, cfg: TinyDecoderConfig) -> Params:
    dtype = jnp.dtype(cfg.dtype)
    w = cfg.width
    keys = iter(split_keys(key, 64))
    stages = []
    for i in range(cfg.num_upsamples + 1):
        stage: Params = {}
        if i > 0:
            stage["up"] = conv2d_init(next(keys), w, w, 3, dtype)
        stage["blocks"] = [
            _block_init(next(keys), w, dtype)
            for _ in range(cfg.blocks_per_stage)
        ]
        stages.append(stage)
    return {
        "conv_in": conv2d_init(next(keys), cfg.latent_channels, w, 3, dtype),
        "stages": stages,
        "conv_out": conv2d_init(next(keys), w, 3, 3, dtype),
    }


def decode(params: Params, cfg: TinyDecoderConfig,
           latents: jnp.ndarray) -> jnp.ndarray:
    """Normalized latents (B, h, w, z) → images NHWC in [-1, 1].

    Drop-in for :func:`models.vae.decode` (same contract: clipped [-1,1]
    pixels in the param dtype) at ~1/3 the device time (measured 17.0 vs
    55.3 ms @1024²; see the module docstring for why not the ~30× FLOP
    ratio). use_pallas=False throughout: XLA's fused lowering beats the
    small-C Pallas conv kernel on this norm-free conv chain.
    """
    x = conv2d(params["conv_in"], latents.astype(jnp.dtype(cfg.dtype)),
               use_pallas=False)
    for stage in params["stages"]:
        if "up" in stage:
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = conv2d(stage["up"], x, use_pallas=False)
        for blk in stage["blocks"]:
            x = _block(blk, x)
    x = conv2d(params["conv_out"], jax.nn.relu(x), use_pallas=False)
    return jnp.clip(x, -1.0, 1.0)


# single-dispatch init (see models/transformer.py init_jit)
init_jit = jax.jit(init, static_argnums=1)


# ---------------------------------------------------------------------------
# Tiny ENCODER — the other half of the TAESD pair (VERDICT r3 next #4).
#
# The stream's fused temporal frame graph runs the FULL VAE encode on
# every frame (~10 of ~51 ms device budget @512²); TAESD is an
# encoder+decoder pair, and the same distillation recipe transfers:
# target = full `vae.encode` posterior mode (the conditioning path's
# deterministic domain). Architecture mirrors the decoder reversed —
# conv_in → [blocks → stride-2 conv] × log2(downsample) → blocks →
# conv_out — one uniform `width`, XLA-fused relu→conv chains, stride-2
# convs instead of nearest-upsample+conv.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TinyEncoderConfig:
    """Architecture of the tiny encoder. ``spatial_downsample`` must match
    the paired VAE's (the latent grid it writes)."""

    latent_channels: int = 16
    width: int = 64
    blocks_per_stage: int = 2
    spatial_downsample: int = 8
    dtype: str = "bfloat16"

    @classmethod
    def from_vae(cls, vae_cfg: VAEConfig, width: int = 64,
                 blocks_per_stage: int = 2,
                 dtype: str | None = None) -> "TinyEncoderConfig":
        return cls(latent_channels=vae_cfg.latent_channels, width=width,
                   blocks_per_stage=blocks_per_stage,
                   spatial_downsample=vae_cfg.spatial_downsample,
                   dtype=dtype or vae_cfg.dtype)

    @property
    def num_downsamples(self) -> int:
        n = self.spatial_downsample.bit_length() - 1
        if 1 << n != self.spatial_downsample:
            raise ValueError(
                f"spatial_downsample must be a power of 2, got "
                f"{self.spatial_downsample}")
        return n


def encoder_init(key: jax.Array, cfg: TinyEncoderConfig) -> Params:
    dtype = jnp.dtype(cfg.dtype)
    w = cfg.width
    keys = iter(split_keys(key, 64))
    stages = []
    for i in range(cfg.num_downsamples + 1):
        stage: Params = {}
        stage["blocks"] = [
            _block_init(next(keys), w, dtype)
            for _ in range(cfg.blocks_per_stage)
        ]
        if i < cfg.num_downsamples:
            stage["down"] = conv2d_init(next(keys), w, w, 3, dtype)
        stages.append(stage)
    return {
        "conv_in": conv2d_init(next(keys), 3, w, 3, dtype),
        "stages": stages,
        "conv_out": conv2d_init(next(keys), w, cfg.latent_channels, 3,
                                dtype),
    }


def encode(params: Params, cfg: TinyEncoderConfig,
           images: jnp.ndarray) -> jnp.ndarray:
    """Images NHWC in [-1, 1] → NORMALIZED latents (B, h, w, z).

    Drop-in for the deterministic :func:`models.vae.encode` (posterior
    mode, normalized domain — what the denoise loop conditions on); the
    per-channel normalization affine is learnable by the last conv, so
    the tiny path skips `vae._normalize` exactly as the decoder skips
    `_denormalize`. use_pallas=False: same XLA-fuses-the-chain argument
    as :func:`decode` (no norms between convs).
    """
    x = conv2d(params["conv_in"], images.astype(jnp.dtype(cfg.dtype)),
               use_pallas=False)
    for stage in params["stages"]:
        for blk in stage["blocks"]:
            x = _block(blk, x)
        if "down" in stage:
            x = conv2d(stage["down"], jax.nn.relu(x), stride=2,
                       use_pallas=False)
    return conv2d(params["conv_out"], jax.nn.relu(x), use_pallas=False)


encoder_init_jit = jax.jit(encoder_init, static_argnums=1)


# ---------------------------------------------------------------------------
# Artifact format: flat safetensors, nested keys joined with "/"
# ---------------------------------------------------------------------------


def _flatten(params: Params, prefix: str = "") -> Dict[str, Any]:
    flat: Dict[str, Any] = {}
    if isinstance(params, dict):
        for k, v in params.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            flat.update(_flatten(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = params
    return flat


def save(path: str, params: Params) -> None:
    """Write the decoder as flat safetensors (``.npz`` fallback when the
    library is absent, mirroring training.lora_train.save_lora)."""
    import numpy as np

    flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
    try:
        from safetensors.numpy import save_file

        save_file(flat, path)
    except ImportError:
        np.savez(path, **flat)


def _load_tree(path: str) -> Tuple[Params, Dict[str, Any]]:
    """Flat safetensors/npz file → nested param tree (+ the flat dict)."""
    import numpy as np

    if path.endswith(".npz"):
        flat = dict(np.load(path))
    else:
        from safetensors.numpy import load_file

        flat = load_file(path)

    params: Params = {"stages": []}
    for key, arr in flat.items():
        parts = key.split("/")
        node: Any = params
        for i, p in enumerate(parts[:-1]):
            idx = int(p) if p.isdigit() else p
            nxt_is_list = parts[i + 1].isdigit() if i + 1 < len(parts) - 1 \
                else False
            if isinstance(node, list):
                while len(node) <= idx:
                    node.append([] if nxt_is_list else {})
                node = node[idx]
            else:
                if idx not in node:
                    node[idx] = [] if nxt_is_list else {}
                node = node[idx]
        leaf = parts[-1]
        if isinstance(node, list):
            raise ValueError(f"malformed tiny-decoder key {key!r}")
        node[leaf] = jnp.asarray(arr)
    return params, flat


def load(path: str) -> Tuple[Params, TinyDecoderConfig]:
    """Read a saved decoder; the config is inferred from tensor shapes
    (conv_in carries latent_channels/width/dtype; the stage list carries
    depth), so artifacts are self-describing."""
    params, _ = _load_tree(path)
    w_in = params["conv_in"]["w"]
    stages = params["stages"]
    cfg = TinyDecoderConfig(
        latent_channels=int(w_in.shape[2]),
        width=int(w_in.shape[3]),
        blocks_per_stage=len(stages[0]["blocks"]),
        spatial_upsample=1 << sum(1 for s in stages if "up" in s),
        dtype=str(w_in.dtype),
    )
    return params, cfg


def load_encoder(path: str) -> Tuple[Params, TinyEncoderConfig]:
    """Read a saved tiny encoder (same flat format as :func:`save`; the
    config is inferred from shapes — conv_in is (3,3,3,width) here where
    the decoder's is (3,3,z,width), so the artifacts are distinguishable
    and a decoder file fed here fails the RGB-input check loudly)."""
    params, _ = _load_tree(path)
    w_in = params["conv_in"]["w"]
    if int(w_in.shape[2]) != 3:
        raise ValueError(
            f"{path!r} is not a tiny ENCODER artifact: conv_in reads "
            f"{int(w_in.shape[2])} channels, expected 3 (RGB)")
    stages = params["stages"]
    cfg = TinyEncoderConfig(
        latent_channels=int(params["conv_out"]["w"].shape[3]),
        width=int(w_in.shape[3]),
        blocks_per_stage=len(stages[0]["blocks"]),
        spatial_downsample=1 << sum(1 for s in stages if "down" in s),
        dtype=str(w_in.dtype),
    )
    return params, cfg
