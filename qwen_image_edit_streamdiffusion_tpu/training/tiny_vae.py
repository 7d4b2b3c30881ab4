"""Distill the tiny output decoder from the full VAE — the TAESD loop.

StreamDiffusion ships with the Tiny AutoencoderKL (TAESD) to cut decode
cost; no such artifact exists for Qwen-Image's Wan-style latent space, so
(exactly like the Lightning-LoRA story in ``training/distill.py``) this
module manufactures one from the base model itself:

    z      = full_encode(image)            # the realistic latent manifold
    target = full_decode(z)                # the serving quality bar
    loss   = MSE(tiny(z), target) + λ·L1   # pure decoder distillation

The target is the full decoder's OUTPUT (not the original image): the
tiny decoder's job in serving is to reproduce what the full path would
have shown, so matching it directly needs no perceptual/GAN losses to be
meaningful and makes eval PSNR(tiny, full) the exact serving-quality
metric. Training is f32 (Adam stability); artifacts are saved in the
serving dtype and loaded with ``--tiny-decoder`` / ``StreamConfig.
decoder="tiny"``.

Reference context: decode rides ``pipeline.vae.decode``
(qwen_realtime.py:188-199); StreamDiffusion credit at README.md:186-191.

``--encoder`` distills the tiny ENCODER instead (the other half of the
TAESD pair, VERDICT r3 next #4): target = full ``vae.encode`` posterior
mode in the latent domain; serving eval decodes both latent sets through
the SAME full decoder so PSNR isolates encoder error. Serve with
``--tiny-encoder`` / ``StreamConfig.encoder="tiny"`` — stream temporal
frames only; keyframes and /edit conditioning keep the full VAE.

CLI::

    python -m qwen_image_edit_streamdiffusion_tpu.training.tiny_vae \\
        --preset bench-2b --size 512 --steps 500 --save tiny_decoder.safetensors
    python -m ... --encoder --save tiny_encoder.safetensors
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from qwen_image_edit_streamdiffusion_tpu.core.rng import key_from_seed
from qwen_image_edit_streamdiffusion_tpu.models import tiny_vae as tv
from qwen_image_edit_streamdiffusion_tpu.models import vae as vae_mod
from qwen_image_edit_streamdiffusion_tpu.models.common import Params


@dataclasses.dataclass(frozen=True)
class TinyVAETrainConfig:
    width: int = 64
    blocks_per_stage: int = 2
    learning_rate: float = 1e-3
    b1: float = 0.9
    b2: float = 0.999
    l1_weight: float = 0.1  # sharpens edges vs pure MSE
    save_dtype: str = "bfloat16"


class TinyVAETrainer:
    """Adam over the tiny decoder against frozen full-VAE targets.

    One jitted step per latent-grid bucket (same never-retrace policy as
    LoRATrainer); batches come from :func:`build_decoder_batch`.
    """

    def __init__(self, vae_params: Params, vae_cfg, cfg: TinyVAETrainConfig,
                 seed: int = 0):
        import optax

        self.cfg = cfg
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        self.tcfg = tv.TinyDecoderConfig.from_vae(
            vae_cfg, width=cfg.width, blocks_per_stage=cfg.blocks_per_stage,
            dtype="float32")
        self.params = tv.init_jit(key_from_seed(seed), self.tcfg)
        self.opt = optax.adam(cfg.learning_rate, b1=cfg.b1, b2=cfg.b2)
        self.opt_state = self.opt.init(self.params)
        self._jit: Dict[Any, Any] = {}

    @classmethod
    def from_pipeline(cls, pipe, cfg: Optional[TinyVAETrainConfig] = None,
                      seed: int = 0) -> "TinyVAETrainer":
        return cls(pipe.vae_params, pipe.preset.vae,
                   cfg or TinyVAETrainConfig(), seed=seed)

    def _step_fn(self, shape):
        if ("step", shape) not in self._jit:
            tcfg, l1w = self.tcfg, self.cfg.l1_weight

            @jax.jit
            def step(params, opt_state, z, target):
                def loss_fn(p):
                    y = tv.decode(p, tcfg, z).astype(jnp.float32)
                    err = y - target
                    return (jnp.mean(err * err)
                            + l1w * jnp.mean(jnp.abs(err)))

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = self.opt.update(grads, opt_state,
                                                     params)
                import optax

                params = optax.apply_updates(params, updates)
                return params, opt_state, loss

            self._jit[("step", shape)] = step
        return self._jit[("step", shape)]

    def step(self, batch: Dict[str, Any]) -> float:
        z, target = batch["latents"], batch["pixels"]
        self.params, self.opt_state, loss = self._step_fn(z.shape)(
            self.params, self.opt_state, z, target)
        return float(loss)

    def eval_psnr(self, batch: Dict[str, Any]) -> float:
        """PSNR (dB, over the [-1,1] pixel range) of tiny(z) vs the full
        decoder's output — the serving-quality metric."""
        if ("psnr",) not in self._jit:
            tcfg = self.tcfg

            @jax.jit
            def psnr(params, z, target):
                y = tv.decode(params, tcfg, z).astype(jnp.float32)
                mse = jnp.mean((y - target) ** 2)
                return 10.0 * jnp.log10(4.0 / jnp.maximum(mse, 1e-12))

            self._jit[("psnr",)] = psnr
        return float(self._jit[("psnr",)](self.params, batch["latents"],
                                          batch["pixels"]))

    def export(self, dtype: Optional[str] = None) -> Params:
        """Params in the serving dtype (what :func:`save` writes)."""
        dt = jnp.dtype(dtype or self.cfg.save_dtype)
        return jax.tree.map(lambda a: a.astype(dt), self.params)

    def save(self, path: str, dtype: Optional[str] = None) -> None:
        tv.save(path, self.export(dtype))


class TinyEncoderTrainer:
    """Adam over the tiny ENCODER against frozen full-VAE latents — the
    other half of the TAESD pair (VERDICT r3 next #4).

        z_target = full_encode(image)        # posterior mode, normalized
        loss     = MSE(tiny_enc(image), z_target) + λ·L1

    The target is the full encoder's *latent* (not a pixel reconstruction):
    in serving, the tiny encoder's job is to hand the denoise loop the
    conditioning the full path would have computed, so latent-domain
    distillation is the exact serving objective. :meth:`eval_psnr` reports
    the serving-quality view — PSNR of full_decode(tiny_latents) vs
    full_decode(target_latents) — pixels through the SAME decoder, so the
    number isolates encoder error."""

    def __init__(self, vae_params: Params, vae_cfg, cfg: TinyVAETrainConfig,
                 seed: int = 0):
        import optax

        self.cfg = cfg
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        self.ecfg = tv.TinyEncoderConfig.from_vae(
            vae_cfg, width=cfg.width, blocks_per_stage=cfg.blocks_per_stage,
            dtype="float32")
        self.params = tv.encoder_init_jit(key_from_seed(seed), self.ecfg)
        self.opt = optax.adam(cfg.learning_rate, b1=cfg.b1, b2=cfg.b2)
        self.opt_state = self.opt.init(self.params)
        self._jit: Dict[Any, Any] = {}

    @classmethod
    def from_pipeline(cls, pipe, cfg: Optional[TinyVAETrainConfig] = None,
                      seed: int = 0) -> "TinyEncoderTrainer":
        return cls(pipe.vae_params, pipe.preset.vae,
                   cfg or TinyVAETrainConfig(), seed=seed)

    def _step_fn(self, shape):
        if ("step", shape) not in self._jit:
            ecfg, l1w = self.ecfg, self.cfg.l1_weight

            @jax.jit
            def step(params, opt_state, pixels, z_target):
                def loss_fn(p):
                    z = tv.encode(p, ecfg, pixels).astype(jnp.float32)
                    err = z - z_target
                    return (jnp.mean(err * err)
                            + l1w * jnp.mean(jnp.abs(err)))

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = self.opt.update(grads, opt_state,
                                                     params)
                import optax

                params = optax.apply_updates(params, updates)
                return params, opt_state, loss

            self._jit[("step", shape)] = step
        return self._jit[("step", shape)]

    def step(self, batch: Dict[str, Any]) -> float:
        pixels, z = batch["pixels_in"], batch["latents"]
        self.params, self.opt_state, loss = self._step_fn(pixels.shape)(
            self.params, self.opt_state, pixels, z)
        return float(loss)

    def eval_psnr(self, batch: Dict[str, Any]) -> float:
        """PSNR (dB, [-1,1] range) of full_decode(tiny_enc(img)) vs
        full_decode(full_enc(img)) — both through the SAME full decoder,
        so the number is the conditioning-quality delta the stream's
        temporal frames would actually see."""
        if ("psnr",) not in self._jit:
            ecfg, vcfg = self.ecfg, self.vae_cfg
            vdt = jnp.dtype(vcfg.dtype)

            @jax.jit
            def psnr(params, vae_params, pixels, z_target):
                z = tv.encode(params, ecfg, pixels).astype(jnp.float32)
                y = vae_mod.decode(vae_params, vcfg,
                                   z.astype(vdt)).astype(jnp.float32)
                ref = vae_mod.decode(vae_params, vcfg,
                                     z_target.astype(vdt)
                                     ).astype(jnp.float32)
                mse = jnp.mean((y - ref) ** 2)
                return 10.0 * jnp.log10(4.0 / jnp.maximum(mse, 1e-12))

            self._jit[("psnr",)] = psnr
        return float(self._jit[("psnr",)](self.params, self.vae_params,
                                          batch["pixels_in"],
                                          batch["latents"]))

    def export(self, dtype: Optional[str] = None) -> Params:
        dt = jnp.dtype(dtype or self.cfg.save_dtype)
        return jax.tree.map(lambda a: a.astype(dt), self.params)

    def save(self, path: str, dtype: Optional[str] = None) -> None:
        tv.save(path, self.export(dtype))


def build_encoder_batch(pipe, images: Sequence) -> Dict[str, Any]:
    """PIL images (uniform size) → {pixels_in, latents}: pixels in [-1,1]
    f32 (the tiny encoder's input domain) and the full encoder's
    normalized posterior-mode latents as the distillation target."""
    arr = np.stack([np.asarray(im.convert("RGB"), np.float32) for im in
                    images])
    key = ("tiny_enc_targets", arr.shape[1:3])
    if key not in pipe._jit_cache:
        vcfg = pipe.preset.vae
        vdt = jnp.dtype(vcfg.dtype)

        @jax.jit
        def run(vae_params, x):
            img = x / 127.5 - 1.0
            z = vae_mod.encode(vae_params, vcfg, img.astype(vdt))
            return img.astype(jnp.float32), z.astype(jnp.float32)

        pipe._jit_cache[key] = run
    pixels, z = pipe._jit_cache[key](pipe.vae_params, jnp.asarray(arr))
    return {"pixels_in": pixels, "latents": z}


def build_decoder_batch(pipe, images: Sequence) -> Dict[str, Any]:
    """PIL images (uniform size) → {latents, pixels}: z = full-encode
    (posterior mode, the conditioning path's determinism) and the full
    decoder's f32 output as the distillation target. One jitted
    encode+decode per image shape, cached on the pipeline."""
    arr = np.stack([np.asarray(im.convert("RGB"), np.float32) for im in
                    images])
    key = ("tiny_vae_targets", arr.shape[1:3])
    if key not in pipe._jit_cache:
        vcfg = pipe.preset.vae
        vdt = jnp.dtype(vcfg.dtype)

        @jax.jit
        def run(vae_params, x):
            img = (x / 127.5 - 1.0).astype(vdt)
            z = vae_mod.encode(vae_params, vcfg, img)
            y = vae_mod.decode(vae_params, vcfg, z.astype(vdt))
            return z.astype(jnp.float32), y.astype(jnp.float32)

        pipe._jit_cache[key] = run
    z, target = pipe._jit_cache[key](pipe.vae_params, jnp.asarray(arr))
    return {"latents": z, "pixels": target}


def _synthetic_images(size: int, n: int, seed: int = 0) -> List:
    """Training images when no dataset is given: the test-image family
    with random tints/noise so batches differ (mechanism demo; distill
    against real photos for a production artifact)."""
    from PIL import Image

    from qwen_image_edit_streamdiffusion_tpu.core import imaging

    rng = np.random.default_rng(seed)
    kinds = ["gradient", "circle", "sine"]
    out = []
    for i in range(n):
        base = np.asarray(
            imaging.make_test_image(size, size, kinds[i % len(kinds)]),
            np.int32)
        tint = rng.integers(0, 64, (3,), np.int32)
        out.append(Image.fromarray(
            np.clip(base + tint[None, None, :], 0, 255).astype(np.uint8)))
    return out


def main(argv=None):
    import argparse
    import time

    from qwen_image_edit_streamdiffusion_tpu.runtime import compile_cache

    compile_cache.honor_platform_env()

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--encoder", action="store_true",
                    help="distill the tiny ENCODER (pixels → latents) "
                    "instead of the decoder — the other half of the "
                    "TAESD pair; serve with --tiny-encoder / "
                    "StreamConfig.encoder='tiny'")
    ap.add_argument("--data", default=None,
                    help="directory of training images (png/jpg); "
                    "default: synthetic test images")
    ap.add_argument("--save", default=None,
                    help="write the distilled artifact (.safetensors)")
    ap.add_argument("--save-dtype", default="bfloat16")
    ap.add_argument("--eval-every", type=int, default=50)
    args = ap.parse_args(argv)

    from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
    from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
        EditPipeline,
    )

    pipe = EditPipeline.create(
        args.preset,
        config=StreamConfig(model_preset=args.preset, use_vl_encoder=False),
        seed=0)
    cfg = TinyVAETrainConfig(width=args.width, blocks_per_stage=args.blocks,
                             learning_rate=args.lr,
                             save_dtype=args.save_dtype)
    if args.encoder:
        trainer = TinyEncoderTrainer.from_pipeline(pipe, cfg)
        build_batch = build_encoder_batch
    else:
        trainer = TinyVAETrainer.from_pipeline(pipe, cfg)
        build_batch = build_decoder_batch

    if args.data:
        import glob

        from PIL import Image

        paths = sorted(
            p for ext in ("png", "jpg", "jpeg")
            for p in glob.glob(f"{args.data}/**/*.{ext}", recursive=True))
        if not paths:
            raise SystemExit(f"no images under {args.data!r}")
        imgs = [Image.open(p).convert("RGB").resize((args.size, args.size))
                for p in paths]
    else:
        imgs = _synthetic_images(args.size, max(args.batch * 8, 16))

    rng = np.random.default_rng(0)
    t0 = time.time()
    for i in range(args.steps):
        pick = rng.choice(len(imgs), size=args.batch, replace=False)
        batch = build_batch(pipe, [imgs[j] for j in pick])
        loss = trainer.step(batch)
        if i == 0:
            print(f"step 1 (compile): {time.time() - t0:.1f}s  "
                  f"loss {loss:.5f}")
        if args.eval_every and (i + 1) % args.eval_every == 0:
            print(f"step {i + 1}: loss {loss:.5f}  "
                  f"PSNR(tiny, full) {trainer.eval_psnr(batch):.2f} dB")
    if args.save:
        trainer.save(args.save)
        print(f"saved {args.save} "
              f"({'encoder' if args.encoder else 'decoder'}, "
              f"width {args.width}, {args.save_dtype})")


if __name__ == "__main__":
    main()
