#!/usr/bin/env python3
"""Capture reference-implementation goldens for verify_parity (torch side).

Runs WHEREVER torch + diffusers + the real `Qwen/Qwen-Image-Edit-2509`
weights exist (NOT in the TPU image — diffusers is absent there; VERDICT r2
next #5 asked for this two-machine workflow to be one runnable file, not a
docstring recipe). It executes the reference stack (the model the reference
repo drives at server.py:64-79 / test_qwen_edit.py:38-111) on the SAME
seeded synthetic inputs `benchmarks/verify_parity.compute_activations`
uses, and writes an `.npz` whose keys exactly match ``GOLDEN_KEYS`` — the
JAX side then consumes it unmodified:

    # GPU box (torch + diffusers + weights):
    python scripts/capture_reference_goldens.py \
        --pipeline Qwen/Qwen-Image-Edit-2509 --out ref_goldens.npz

    # TPU box (this repo + converted checkpoints):
    python -m qwen_image_edit_streamdiffusion_tpu.benchmarks.verify_parity \
        hf --transformer ... --vae ... --vl ... --goldens ref_goldens.npz

This file is import-safe without torch/diffusers (guarded inside main);
`tests/test_parity_goldens.py` keeps its key table, template strings, and
declared shapes in sync with `compute_activations`.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

# Must equal benchmarks.verify_parity.GOLDEN_KEYS (sync-tested).
GOLDEN_KEYS = (
    "scheduler.sigmas_4step_4096",
    "scheduler.timesteps_4step_4096",
    "pack.packed",
    "pack.unpacked_roundtrip",
    "transformer.velocity",
    "transformer.rope_img_cos",
    "cfg.combined",
    "cfg.rcfg_self_combined",
    "lora.fused_velocity",
    "vae.moments",
    "vae.decoded",
    "tiny_vae.decoded",
    "tiny_vae.encoded",
    "attn.sharded_causal_flash",
    "vl.vision_tokens",
    "vl.hidden",
    "vl.hidden_many",
    "vl.chat_ids",
    "stream.temporal_frame",
)

# Keys that exist only on the JAX side and are NOT written by this
# capture (must equal verify_parity.HF_UNCAPTURED, sync-tested):
# lora.fused_velocity uses jax-PRNG-seeded synthetic adapters (pinned by
# the tiny-preset goldens; with real weights validate LoRA by serving
# outputs instead); the tiny autoencoder pair is the TAESD-analog the
# reference has no counterpart for; attn.sharded_causal_flash and
# vl.hidden_many are TPU-runtime mechanisms (the shard_mapped causal
# kernel, the vmapped batched-LM twin); stream.temporal_frame exercises
# the temporal path the reference left unwired (qwen_realtime.py:259-261).
# cfg.rcfg_self_combined IS written — it is a pure formula (our
# StreamDiffusion §3.2 translation) and the capture documents it
# numerically for the torch side.
UNCAPTURED_KEYS = (
    "lora.fused_velocity",
    "tiny_vae.decoded",
    "tiny_vae.encoded",
    "attn.sharded_causal_flash",
    "vl.hidden_many",
    "stream.temporal_frame",
)

# Must equal models.text_encoder.SYSTEM_PROMPT / models.qwen_vl template
# constants (sync-tested; duplicated here so this script imports without
# jax on the torch box).
SYSTEM_PROMPT = (
    "Describe the key features of the input image (color, shape, size, "
    "texture, objects, background), then explain how the user's text "
    "instruction should alter or modify the image. Generate a new image "
    "that meets the user's requirements while maintaining consistency "
    "with the original input where appropriate."
)
TEMPLATE_PREFIX = (
    "<|im_start|>system\n" + SYSTEM_PROMPT + "<|im_end|>\n<|im_start|>user\n"
)
TEMPLATE_SUFFIX = "<|im_end|>\n<|im_start|>assistant\n"
IMG_LABEL = "Picture {}: "
DROP_IDX = 64  # upstream drops this fixed template-prefix length

# The seeded-input protocol shared with compute_activations: rng stream i
# feeds tensor i (np.random.default_rng(i)).
VL_HIDDEN_BUCKET = 64  # compute_activations uses max_len=64 → fixed L_out


def expected_shapes(preset_cfg) -> dict:
    """Golden array shapes for a given preset (None = data-dependent dim).

    preset_cfg: the package's `Preset` object — only used by the sync test
    on the JAX side; the torch capture never calls this."""
    m, v, vl = preset_cfg.model, preset_cfg.vae, preset_cfg.vl
    z = v.latent_channels
    return {
        "scheduler.sigmas_4step_4096": (5,),
        "scheduler.timesteps_4step_4096": (4,),
        "pack.packed": (1, 16, 4 * z),
        "pack.unpacked_roundtrip": (1, 8, 8, z),
        "transformer.velocity": (1, 32, m.out_channels),
        "transformer.rope_img_cos": (32, sum(m.axes_dims_rope) // 2),
        "cfg.combined": (1, 8, 4),
        "cfg.rcfg_self_combined": (1, 8, 4),
        "lora.fused_velocity": (1, 32, m.out_channels),
        "vae.moments": (1, 4, 4, 2 * z),
        "vae.decoded": (1, 32, 32, 3),
        "tiny_vae.decoded": (1, 32, 32, 3),
        # 32×32 seeded image → 8× downsample → 4×4 normalized latents
        "tiny_vae.encoded": (1, 4, 4, z),
        # causal GQA kernel golden: q (1, 4 heads, L=256, D=128)
        "attn.sharded_causal_flash": (1, 4, 256, 128),
        # 64×64 seeded image → smart-resize 56×56 → 4×4 patch grid → 2×2
        # merge → 4 vision tokens
        "vl.vision_tokens": (4, vl.vision_out_dim),
        "vl.hidden": (VL_HIDDEN_BUCKET, vl.hidden_size),
        "vl.hidden_many": (2, VL_HIDDEN_BUCKET, vl.hidden_size),
        "vl.chat_ids": (None,),
        # composed all-levers temporal stream frame, f32 RGB in [0, 1]
        "stream.temporal_frame": (64, 64, 3),
    }


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def _combine_cfg_np(pos: np.ndarray, neg: np.ndarray, scale: float
                    ) -> np.ndarray:
    """The upstream norm-preserving true-CFG rule, in f64-free numpy."""
    comb = neg + scale * (pos - neg)
    cond_norm = np.linalg.norm(pos, axis=-1, keepdims=True)
    comb_norm = np.linalg.norm(comb, axis=-1, keepdims=True)
    return (comb * (cond_norm / np.maximum(comb_norm, 1e-12))).astype(
        pos.dtype)


def _chat_text(prompt: str, n_merged_per_image) -> str:
    parts = [TEMPLATE_PREFIX]
    for i, n in enumerate(n_merged_per_image):
        parts.append(IMG_LABEL.format(i + 1) + "<|vision_start|>"
                     + "<|image_pad|>" * n + "<|vision_end|>")
    parts.append(prompt + TEMPLATE_SUFFIX)
    return "".join(parts)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--pipeline", default="Qwen/Qwen-Image-Edit-2509",
                    help="HF id or local dir of the reference pipeline")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--device", default="cuda")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args(argv)

    try:
        import torch
        from diffusers import QwenImageEditPlusPipeline
    except ImportError as e:  # this box is the JAX side
        print(f"torch/diffusers unavailable ({e}); run this on the GPU box "
              "that has the reference stack installed", file=sys.stderr)
        return 2

    dt = getattr(torch, args.dtype)
    dev = torch.device(args.device)
    pipe = QwenImageEditPlusPipeline.from_pretrained(
        args.pipeline, torch_dtype=dt)
    pipe.to(dev)
    out: dict = {}

    # --- scheduler: 4-step schedule at 4096 image tokens ----------------
    sched = pipe.scheduler
    sc = sched.config
    m = (sc.max_shift - sc.base_shift) / (
        sc.max_image_seq_len - sc.base_image_seq_len)
    mu = 4096 * m + (sc.base_shift - m * sc.base_image_seq_len)
    sigmas_in = np.linspace(1.0, 1.0 / 4, 4)  # the pipeline's few-step rule
    sched.set_timesteps(sigmas=sigmas_in.tolist(), mu=mu, device="cpu")
    out["scheduler.sigmas_4step_4096"] = (
        sched.sigmas.float().cpu().numpy())
    out["scheduler.timesteps_4step_4096"] = (
        sched.timesteps.float().cpu().numpy())

    # --- latent 2×2 packing order ---------------------------------------
    zc = pipe.vae.config.z_dim if hasattr(pipe.vae.config, "z_dim") else 16
    z_nhwc = _rng(1).standard_normal((1, 8, 8, zc)).astype(np.float32)
    z_t = torch.from_numpy(z_nhwc).permute(0, 3, 1, 2)  # (B, C, H, W)
    packed = pipe._pack_latents(z_t, 1, zc, 8, 8)
    out["pack.packed"] = packed.float().cpu().numpy()
    unpacked = pipe._unpack_latents(
        packed, 8 * pipe.vae_scale_factor, 8 * pipe.vae_scale_factor,
        pipe.vae_scale_factor)
    # _unpack_latents returns (B, C, 1, H, W) video layout → NHWC
    out["pack.unpacked_roundtrip"] = (
        unpacked.float().cpu().numpy().squeeze(2).transpose(0, 2, 3, 1))

    # --- transformer forward (RoPE / AdaLN / joint attention) -----------
    tcfg = pipe.transformer.config
    in_ch = tcfg.in_channels
    x = _rng(2).standard_normal((1, 32, in_ch)).astype(np.float32)
    txt = _rng(3).standard_normal(
        (1, 16, tcfg.joint_attention_dim)).astype(np.float32)
    img_shapes = [[(1, 4, 4), (1, 4, 4)]]
    with torch.no_grad():
        v = pipe.transformer(
            hidden_states=torch.from_numpy(x).to(dev, dt),
            encoder_hidden_states=torch.from_numpy(txt).to(dev, dt),
            encoder_hidden_states_mask=torch.ones(
                (1, 16), dtype=torch.long, device=dev),
            # pipeline convention: flow t in [0,1] = train-timestep/1000
            timestep=torch.tensor([500.0 / 1000.0], device=dev, dtype=dt),
            img_shapes=img_shapes,
            txt_seq_lens=[16],
            return_dict=False,
        )[0]
    out["transformer.velocity"] = v.float().cpu().numpy()

    # image RoPE table: cos of the 3D angles = real part of the complex
    # freqs the upstream QwenEmbedRope produces
    rope = pipe.transformer.pos_embed
    with torch.no_grad():
        img_freqs, _txt_freqs = rope(img_shapes[0], [16], device=dev)
    out["transformer.rope_img_cos"] = (
        img_freqs.real.float().cpu().numpy())

    # --- norm-rescaled CFG combine (pure rule) --------------------------
    pos = _rng(4).standard_normal((1, 8, 4)).astype(np.float32)
    neg = _rng(5).standard_normal((1, 8, 4)).astype(np.float32)
    out["cfg.combined"] = _combine_cfg_np(pos, neg, 4.0)

    # rcfg-self virtual negative (our StreamDiffusion §3.2 flow-matching
    # translation — no reference code path; the capture documents the
    # formula so the torch side can cross-check it numerically):
    # v_neg = (x − anchor)/max(σ, 1e-3), then the same combine as above.
    xs = _rng(9).standard_normal((1, 8, 4)).astype(np.float32)
    anchor = _rng(10).standard_normal((1, 8, 4)).astype(np.float32)
    vneg = (xs - anchor) / max(0.7, 1e-3)
    out["cfg.rcfg_self_combined"] = _combine_cfg_np(pos,
                                                    vneg.astype(np.float32),
                                                    4.0)

    # --- VAE encode moments + decode ------------------------------------
    img = _rng(6).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    # causal 3D video VAE: (B, C, T, H, W) with T=1
    img_t = torch.from_numpy(img).permute(0, 3, 1, 2)[:, :, None].to(dev, dt)
    with torch.no_grad():
        enc = pipe.vae.encode(img_t)
        moments = enc.latent_dist.parameters  # (B, 2z, T, H/8, W/8)
    out["vae.moments"] = (
        moments.float().cpu().numpy().squeeze(2).transpose(0, 2, 3, 1))
    zlat = _rng(7).standard_normal((1, 4, 4, zc)).astype(np.float32)
    z_t = torch.from_numpy(zlat).permute(0, 3, 1, 2)[:, :, None].to(dev, dt)
    with torch.no_grad():
        dec = pipe.vae.decode(z_t).sample  # (B, 3, T, H, W)
    out["vae.decoded"] = (
        dec.float().cpu().numpy().squeeze(2).transpose(0, 2, 3, 1))

    # --- Qwen2.5-VL: vision tower, prompt hidden states, chat ids -------
    from PIL import Image

    vimg = _rng(8).integers(0, 255, (64, 64, 3)).astype(np.uint8)
    pil = Image.fromarray(vimg)
    proc = pipe.processor if hasattr(pipe, "processor") else None
    if proc is None:
        from transformers import AutoProcessor

        proc = AutoProcessor.from_pretrained(args.pipeline,
                                             subfolder="processor")
    vis_in = proc.image_processor(images=[pil], return_tensors="pt")
    with torch.no_grad():
        vt = pipe.text_encoder.visual(
            vis_in.pixel_values.to(dev, dt),
            grid_thw=vis_in.image_grid_thw.to(dev),
        )
    out["vl.vision_tokens"] = vt.float().cpu().numpy()

    with torch.no_grad():
        pe, pe_mask = pipe.encode_prompt(
            image=[pil], prompt=["make it a watercolor painting"],
            device=dev, num_images_per_prompt=1,
        )[:2]
    n = int(pe_mask.sum().item())
    hidden = pe[0, :n].float().cpu().numpy()
    bucket = np.zeros((VL_HIDDEN_BUCKET, hidden.shape[-1]), np.float32)
    bucket[:min(n, VL_HIDDEN_BUCKET)] = hidden[:VL_HIDDEN_BUCKET]
    out["vl.hidden"] = bucket

    tok = pipe.tokenizer
    ids = tok(_chat_text("prompt here", [4, 2]),
              add_special_tokens=False).input_ids
    out["vl.chat_ids"] = np.asarray(ids, np.int64)

    missing = [k for k in GOLDEN_KEYS
               if k not in out and k not in UNCAPTURED_KEYS]
    assert not missing, f"capture incomplete: {missing}"
    np.savez(args.out, **out)
    print(f"wrote {len(out)} reference goldens → {args.out}")
    for k in GOLDEN_KEYS:
        if k in out:
            print(f"  {k:<34} {out[k].shape} {out[k].dtype}")
        else:
            print(f"  {k:<34} (JAX-side only — see UNCAPTURED_KEYS)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
