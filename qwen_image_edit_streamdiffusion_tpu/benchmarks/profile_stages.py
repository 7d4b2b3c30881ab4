"""Per-stage latency breakdown of one edit request.

Times each stage with block_until_ready bracketing (reference methodology,
SURVEY.md §3.5): host preprocess, VAE encode, prompt encode, denoise loop
(per model call), VAE decode, device→host + PIL. Run on the bench preset to
see where the headline seconds go:

  python -m qwen_image_edit_streamdiffusion_tpu.benchmarks.profile_stages \
      --preset bench-2b --size 1024 --steps 2
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from qwen_image_edit_streamdiffusion_tpu.core import imaging
from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
from qwen_image_edit_streamdiffusion_tpu.models import transformer as tfm
from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import EditPipeline


def _fetch(r):
    """Force a real device→host sync. On tunneled/async platforms
    block_until_ready can return before execution completes; fetching a
    leaf is the only reliable barrier."""
    if r is None:
        return
    leaves = jax.tree_util.tree_leaves(r)
    if leaves:
        np.asarray(leaves[0])


def _t(label, fn, n=3):
    _fetch(fn())  # warm
    ts = []
    for _ in range(n):
        t0 = time.time()
        _fetch(fn())
        ts.append(time.time() - t0)
    print(f"  {label:<28} {min(ts) * 1000:8.1f} ms (min of {n}, "
          "incl. result fetch)")
    return min(ts)


def main(argv=None):
    from qwen_image_edit_streamdiffusion_tpu.runtime import compile_cache

    compile_cache.enable()
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default=os.environ.get("QIE_BENCH_PRESET", "bench-2b"))
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--no-flash", action="store_true")
    args = ap.parse_args(argv)

    config = StreamConfig(
        width=args.size, height=args.size, num_inference_steps=args.steps,
        model_preset=args.preset, cfg_mode="none",
        vae_image_area=args.size * args.size,
        vl_image_area=min(384 * 384, args.size * args.size),
        use_flash_attention=not args.no_flash,
    )
    print(f"preset={args.preset} size={args.size} steps={args.steps} "
          f"flash={not args.no_flash} device={jax.devices()[0]}")
    t0 = time.time()
    pipe = EditPipeline.create(args.preset, config=config, seed=0)
    print(f"  init: {time.time() - t0:.1f}s")

    img = imaging.make_test_image(args.size, args.size, "gradient")
    t0 = time.time()
    pipe(img, "warmup")
    print(f"  compile+first request: {time.time() - t0:.1f}s")

    # --- stage timings ---
    out_h, out_w, vae_images, vl_images = pipe._prepare_images([img], None, None)
    _t("host preprocess", lambda: pipe._prepare_images([img], None, None)[2][0])

    x = jnp.asarray(vae_images[0], jnp.uint8)[None]
    enc = pipe._vae_encode_fn(x.shape[1:3])
    _t("VAE encode", lambda: enc(pipe.vae_params, x))

    _t("prompt encode (stub/VL)", lambda: pipe.encoder.encode("p", vl_images))

    cond_tokens, cond_shapes = pipe.encode_condition_latents(vae_images)
    emb = pipe.encoder.encode("p", vl_images)
    mdt = jnp.dtype(pipe.preset.model.dtype)
    txt = jnp.asarray(emb.embeds, mdt)[None]
    mask = jnp.asarray(emb.mask)[None]
    zh, zw = out_h // 8, out_w // 8
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, zh, zw, 16))
    x0 = tfm.pack_latents(noise).astype(mdt)
    img_shapes = tuple([(1, zh // 2, zw // 2)] + cond_shapes)

    run1 = pipe._denoise_fn(1, img_shapes, txt.shape[1], 1, "none")
    runN = pipe._denoise_fn(1, img_shapes, txt.shape[1], args.steps, "none")
    one = jnp.float32(1.0)
    t1 = _t("denoise 1 step", lambda: run1(pipe.tfm_params, x0 + 0, cond_tokens,
                                           txt, mask, txt, mask, one))
    tN = _t(f"denoise {args.steps} steps",
            lambda: runN(pipe.tfm_params, x0 + 0, cond_tokens, txt, mask,
                         txt, mask, one))
    print(f"  {'→ per model call':<28} {(tN - t1) / max(1, args.steps - 1) * 1000:8.1f} ms")

    final = runN(pipe.tfm_params, x0 + 0, cond_tokens, txt, mask, txt, mask,
                 one)
    dec = pipe._vae_decode_fn((zh, zw))

    # device time alone (1-element sync ≈ device + one RTT) vs device +
    # the full pixel fetch — on a tunneled host the fetch dominates, and
    # conflating them misattributes link bytes to VAE compute
    def _dec_device():
        px, _ = dec(pipe._decode_params, final)
        np.asarray(px[0, 0, 0])
    _dec_device()
    ts = []
    for _ in range(3):
        t0 = time.time()
        _dec_device()
        ts.append(time.time() - t0)
    print(f"  {'VAE decode (device+RTT)':<28} {min(ts) * 1000:8.1f} ms "
          "(min of 3, 1-elem sync)")
    _t("VAE decode + pixel fetch", lambda: dec(pipe._decode_params, final))

    from PIL import Image

    def _collect():
        # fresh decode per rep: a fetched jax array caches its host copy,
        # so re-fetching the same handle measures nothing
        px, _ = dec(pipe._decode_params, final)
        return Image.fromarray(np.asarray(px)[0])
    _t("decode+fetch+PIL", _collect)

    _t("TOTAL end-to-end", lambda: pipe(
        img, "Transform into oil painting style",
        num_inference_steps=args.steps, seed=42).images[0])


if __name__ == "__main__":
    main()
