"""StreamDiffusion-style realtime pipeline with temporal latent caching.

Parity target: ``QwenRealtimePipeline`` (reference qwen_realtime.py:92-387).
The reference *built* the stateful-latent machinery (prepare_latent keyframe
vs temporal logic, qwen_realtime.py:201-224) but never wired it into
process_frame — it calls the stock pipeline and leaves intercepting
intermediate latents as future work (qwen_realtime.py:259-261; SURVEY.md
§3.4). Here it is wired for real:

- **keyframes** (every ``keyframe_interval`` frames): full ``num_steps``
  denoise from fresh noise;
- **temporal frames**: the previous frame's *final latent* is re-noised to
  an intermediate sigma (flow-matching forward process, plus the
  reference's additive ``noise_strength`` jitter) and only the tail
  ``refine_steps`` of the schedule run — fewer transformer calls per frame
  and temporally coherent output;
- conditioning (current camera frame → VAE tokens; prompt embeds) flows
  through the same caches as the batch pipeline;
- **similarity filter** (``config.similarity_filter``): StreamDiffusion
  §3.3's Stochastic Similarity Filter — near-identical consecutive frames
  (static webcam scene) skip inference probabilistically and re-serve the
  last output, bounded by ``similarity_max_skip`` so the stream never
  freezes;
- **hybrid resolution** (``config.preview_scale`` > 1): temporal frames
  run the whole fused graph at 1/s the linear resolution and upscale
  host-side, while keyframes re-anchor at full quality — full-res 1024²
  streaming measures ~2 fps, but 512²-preview temporal frames keep the
  stream at ~512² rates with periodic 1024² keyframes. The keyframe's
  final latent average-pools s×s onto the preview grid for the temporal
  handoff.

Every (keyframe, temporal) variant is its own persistent compiled graph —
no retraces once warm.

Not implemented, by design: StreamDiffusion §3.1's Stream Batch (batch
step-k of frame N with step-k+1 of frame N−1 into one model call so each
frame-time costs one call). On GPU that raises utilization because small
batches underfill the SMs; on TPU the 1024²-scale model call is already
MXU-compute-bound at batch 1 (CLAUDE.md roofline: GEMMs ≈89% of bf16
peak), so a batch-2 call costs ~2× a batch-1 call and the technique buys
nothing — and the temporal path above already runs ONE model call per
frame at the default 2-step config (refine_steps = steps//2 = 1), which
is the same per-frame cost Stream Batch would converge to, without the
extra frame of latency per denoise step.
"""

from __future__ import annotations

import time
import warnings
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from qwen_image_edit_streamdiffusion_tpu.core import imaging
from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
from qwen_image_edit_streamdiffusion_tpu.core.rng import (
    frame_key,
    key_from_seed,
    split_keys,
    stream,
)
from qwen_image_edit_streamdiffusion_tpu.models import scheduler as sched
from qwen_image_edit_streamdiffusion_tpu.models import transformer as tfm
from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import EditPipeline


class BatchPixels:
    """Device pixels from a multi-row batched stream dispatch, fetched to
    host ONCE and shared by every row's collector. Concurrent sessions
    whose frames coalesced into one dispatch (see
    :func:`submit_frames_batched`) each hold a ``(BatchPixels, row)``
    handle; whichever collects first pays the single device→host transfer
    (the whole batch in one tunnel fetch), the rest slice the cached host
    copy for free."""

    __slots__ = ("pixels", "_host")

    def __init__(self, pixels):
        self.pixels = pixels
        self._host = None

    def fetch(self, pipe) -> List[Image.Image]:
        if self._host is None:
            self._host = pipe._fetch_images(self.pixels)
            self.pixels = None  # free the device buffer reference
        return self._host


@dataclass
class RealtimePipeline:
    pipe: EditPipeline
    prompt: str = ""
    negative_prompt: Optional[str] = None
    prev_latent: Optional[jnp.ndarray] = None  # (1, zh, zw, z)
    frame_count: int = 0
    is_keyframe: bool = True
    inference_times: List[float] = field(default_factory=list)
    # frozen prompt conditioning (set by precompute_conditions)
    _frozen_txt: Optional[jnp.ndarray] = None
    _frozen_mask: Optional[jnp.ndarray] = None
    _frozen_neg_txt: Optional[jnp.ndarray] = None
    _frozen_neg_mask: Optional[jnp.ndarray] = None
    # Stochastic Similarity Filter state (StreamDiffusion §3.3)
    skipped_frames: int = 0
    _ssf_sig: Optional[np.ndarray] = None  # last processed frame signature
    _ssf_out: Optional[Image.Image] = None  # last output (sequential path)
    _ssf_pixels: Optional[jnp.ndarray] = None  # last handle (pipelined path)
    _ssf_streak: int = 0  # consecutive skips (bounded by similarity_max_skip)
    _ssf_rng: Optional[np.random.Generator] = None

    # ------------------------------------------------------------------

    @property
    def config(self) -> StreamConfig:
        return self.pipe.config

    @classmethod
    def create(cls, preset: str = "qwen-image-edit-2509",
               config: Optional[StreamConfig] = None, seed: int = 0,
               **kw) -> "RealtimePipeline":
        return cls(pipe=EditPipeline.create(preset, config=config, seed=seed,
                                            **kw))

    def precompute_conditions(self, prompt: str,
                              negative_prompt: Optional[str] = None,
                              reference_image: Optional[Image.Image] = None,
                              ) -> None:
        """Compute and FREEZE the prompt conditioning (reference
        CachedConditions semantics, qwen_realtime.py:69-89/140-165: embeds
        are keyed on the prompt, not the live frame — re-encoding the VL
        model per webcam frame is exactly the cost the reference's cache
        was designed to remove). The optional reference image conditions
        the VL encoding; by default text-only."""
        self.prompt = prompt
        self.negative_prompt = negative_prompt
        p = self.pipe
        mdt = jnp.dtype(p.preset.model.dtype)
        vl_images = []
        if reference_image is not None:
            lw, lh = imaging.calculate_dimensions(
                p.config.vl_image_area,
                reference_image.size[0] / reference_image.size[1],
            )
            vl_images = [np.asarray(imaging.resize(reference_image, lw, lh),
                                    dtype=np.uint8)]
        emb = p.encoder.encode(prompt, vl_images)
        txt = jnp.asarray(emb.embeds, mdt)[None]
        mask = jnp.asarray(emb.mask)[None]
        if negative_prompt is not None:
            nemb = p.encoder.encode(negative_prompt, vl_images)
            neg_txt = jnp.asarray(nemb.embeds, mdt)[None]
            neg_mask = jnp.asarray(nemb.mask)[None]
            # bucket-align pos/neg (the VL encoder buckets lengths to
            # multiples of 64, so they can differ): the batched-CFG graph
            # stacks them on the batch axis (edit_pipeline.py does the
            # same for the non-stream path)
            lt, ln = txt.shape[1], neg_txt.shape[1]
            if lt != ln:
                l = max(lt, ln)

                def _pad(a, fill=0):
                    pad = [(0, 0), (0, l - a.shape[1])] + [
                        (0, 0)
                    ] * (a.ndim - 2)
                    return jnp.pad(a, pad, constant_values=fill)

                txt, mask = _pad(txt), _pad(mask, False)
                neg_txt, neg_mask = _pad(neg_txt), _pad(neg_mask, False)
        else:
            neg_txt, neg_mask = txt, mask
        self._frozen_txt, self._frozen_mask = txt, mask
        self._frozen_neg_txt, self._frozen_neg_mask = neg_txt, neg_mask

    # ------------------------------------------------------------------

    def _refine_steps(self) -> int:
        steps = self.config.num_inference_steps
        return max(1, steps // 2)

    def _preview_scale(self) -> int:
        """Validated hybrid-resolution factor (1 = off). Temporal frames
        run the whole pipeline at width/s × height/s; keyframes stay full
        resolution (see StreamConfig.preview_scale). Requires explicit
        width/height divisible by 16·s so the full-res latent grid pools
        exactly s×s onto the preview grid and both pack 2×2."""
        s = int(self.config.preview_scale or 1)
        if s <= 1:
            return 1
        w, h = self.config.width, self.config.height
        if not w or not h or w % (16 * s) or h % (16 * s):
            if not getattr(self, "_preview_warned", False):
                warnings.warn(
                    f"preview_scale={s} requires explicit width/height "
                    f"divisible by {16 * s} (got {w}x{h}); running full "
                    "resolution every frame")
                self._preview_warned = True
            return 1
        return s

    def _fused_frame_fn(self, kind: str, hw_in, zh: int, zw: int,
                        cond_shapes, txt_len: int, steps: int, start: int,
                        use_cfg: bool = False, prev_pool: int = 1):
        """ONE jitted graph per frame: VAE encode → denoise (tail) → decode.

        Per-frame Python overhead and device round-trips collapse to a
        single dispatch — on a tunneled/remote accelerator each extra
        dispatch costs tens of ms, which is exactly the budget the
        reference's 10-20 fps target lives in (qwen_realtime.py:15).
        kind: "key" (fresh noise, full schedule) | "temporal" (re-noise
        prev latent, tail of schedule). use_cfg adds the batched cond+uncond
        pass (the reference realtime path always runs true CFG,
        qwen_realtime.py:250-253). prev_pool > 1 (keyframes under
        preview_scale) additionally average-pools the returned latent s×s
        so it hands off onto the preview-resolution temporal grid."""
        p = self.pipe
        fmt = self.config.transfer_format  # both upload and fetch direction
        dk = p.config.decoder if p.tiny_vae is not None else "full"
        # temporal frames may encode through the tiny encoder (TAESD is a
        # PAIR); keyframes always re-anchor through the exact full VAE
        ek = ("tiny" if (kind == "temporal" and p.config.encoder == "tiny"
                         and p.tiny_encoder is not None) else "full")
        key = ("stream_fused", kind, hw_in, zh, zw, tuple(cond_shapes),
               txt_len, steps, start, use_cfg, fmt, prev_pool, dk, ek)
        if key in p._jit_cache:
            return p._jit_cache[key]

        enc = p._vae_encode_fn(hw_in, "yuv420" if fmt == "yuv420" else "rgb",
                               kind=ek)
        dec = p._vae_decode_fn((zh, zw))
        img_shapes = tuple([(1, zh // 2, zw // 2)] + list(cond_shapes))
        # CFG inside the fused graph is batched (a parallel-CFG bucket
        # would mismatch the fused single-dispatch shape), EXCEPT the
        # Residual-CFG modes, which pass through: "rcfg-self" is the
        # natural stream fit — the condition image IS the current frame,
        # so the virtual negative anchors on reproducing it unedited
        # (StreamDiffusion's self-negative RCFG) at cond-only cost.
        if use_cfg:
            mode = (p.config.cfg_mode
                    if p.config.cfg_mode in ("rcfg", "rcfg-self")
                    else "batched")
        else:
            mode = "none"
        run = p._denoise_fn(1, img_shapes, txt_len, steps, mode,
                            start_step=start)
        schedule = sched.make_schedule(steps, (zh // 2) * (zw // 2),
                                       p.preset.scheduler)
        sigma_start = schedule.sigmas[start]
        mdt = jnp.dtype(p.preset.model.dtype)
        zc = p.preset.vae.latent_channels

        def make_x0_key(rng, prev, ns):
            noise = jax.random.normal(rng, (1, zh, zw, zc), jnp.float32)
            return tfm.pack_latents(noise).astype(mdt)

        def make_x0_temporal(rng, prev, ns):
            k1, k2 = split_keys(rng)
            prev32 = prev.astype(jnp.float32)
            prev32 = prev32 + ns * jax.random.normal(
                k1, prev32.shape, jnp.float32
            )
            eps = jax.random.normal(k2, prev32.shape, jnp.float32)
            x = sched.scale_noise(prev32, eps, sigma_start)
            return tfm.pack_latents(x).astype(mdt)

        make_x0 = make_x0_key if kind == "key" else make_x0_temporal

        @jax.jit
        def fused(tfm_p, enc_p, dec_p, frame_u8, prev, rng, ns, txt, mask,
                  neg_txt, neg_mask, cfg_scale):
            # enc_p: full VAE tree, or the tiny encoder's on temporal
            # frames when config.encoder == "tiny" (_encode_params_for)
            cond = enc(enc_p, frame_u8)
            x0 = make_x0(rng, prev, ns)
            final = run(tfm_p, x0, cond, txt, mask, neg_txt, neg_mask,
                        cfg_scale)
            pix, z = dec(dec_p, final)
            if prev_pool > 1:
                # keyframe→preview handoff: exact s×s average pool onto
                # the temporal frames' latent grid (grids nest evenly by
                # the _preview_scale validation)
                zc = z.shape[-1]
                z = z.reshape(1, zh // prev_pool, prev_pool,
                              zw // prev_pool, prev_pool, zc).mean((2, 4))
            return pix, z

        p._jit_cache[key] = fused
        return fused

    def _fused_frames_fn(self, rows: int, kind: str, hw_in, zh: int,
                         zw: int, cond_shapes, txt_len: int, steps: int,
                         start: int, use_cfg: bool = False):
        """Multi-ROW variant of :meth:`_fused_frame_fn`: one jitted graph
        that runs `rows` independent sessions' frames in a single device
        dispatch (encode → denoise → decode, per-row conditioning, prev
        latents and noise keys). The cross-session analog of
        EditPipeline.edit_many — concurrent stream sessions coalesce their
        compatible temporal frames instead of serializing whole dispatches
        on the device lock. Noise is generated per row with that row's own
        frame key (unrolled — rows is small and static), so row r is
        bit-identical to the same session dispatching alone."""
        p = self.pipe
        fmt = self.config.transfer_format
        dk = p.config.decoder if p.tiny_vae is not None else "full"
        ek = ("tiny" if (kind == "temporal" and p.config.encoder == "tiny"
                         and p.tiny_encoder is not None) else "full")
        key = ("stream_fused_rows", rows, kind, hw_in, zh, zw,
               tuple(cond_shapes), txt_len, steps, start, use_cfg, fmt, dk,
               ek)
        if key in p._jit_cache:
            return p._jit_cache[key]

        enc = p._vae_encode_fn(hw_in, "yuv420" if fmt == "yuv420" else "rgb",
                               kind=ek)
        dec = p._vae_decode_fn((zh, zw))
        img_shapes = tuple([(1, zh // 2, zw // 2)] + list(cond_shapes))
        if use_cfg:
            mode = (p.config.cfg_mode
                    if p.config.cfg_mode in ("rcfg", "rcfg-self")
                    else "batched")
        else:
            mode = "none"
        run = p._denoise_fn(rows, img_shapes, txt_len, steps, mode,
                            start_step=start)
        schedule = sched.make_schedule(steps, (zh // 2) * (zw // 2),
                                       p.preset.scheduler)
        sigma_start = schedule.sigmas[start]
        mdt = jnp.dtype(p.preset.model.dtype)
        zc = p.preset.vae.latent_channels

        def make_x0_key(keys, prev, ns):
            parts = [
                jax.random.normal(keys[r], (1, zh, zw, zc), jnp.float32)
                for r in range(rows)
            ]
            return tfm.pack_latents(jnp.concatenate(parts, 0)).astype(mdt)

        def make_x0_temporal(keys, prev, ns):
            parts = []
            for r in range(rows):
                k1, k2 = split_keys(keys[r])
                pv = prev[r:r + 1].astype(jnp.float32)
                pv = pv + ns * jax.random.normal(k1, pv.shape, jnp.float32)
                eps = jax.random.normal(k2, pv.shape, jnp.float32)
                parts.append(sched.scale_noise(pv, eps, sigma_start))
            return tfm.pack_latents(jnp.concatenate(parts, 0)).astype(mdt)

        make_x0 = make_x0_key if kind == "key" else make_x0_temporal

        @jax.jit
        def fused(tfm_p, enc_p, dec_p, frames_u8, prev, keys, ns, txt, mask,
                  neg_txt, neg_mask, cfg_scale):
            cond = enc(enc_p, frames_u8)  # full VAE, or tiny on temporal
            x0 = make_x0(keys, prev, ns)
            final = run(tfm_p, x0, cond, txt, mask, neg_txt, neg_mask,
                        cfg_scale)
            return dec(dec_p, final)

        p._jit_cache[key] = fused
        return fused

    def process_frame(self, frame: Image.Image) -> Image.Image:
        """Edit one camera frame (reference qwen_realtime.py:226-268).

        Every frame — keyframe or temporal, with or without a negative
        prompt — runs the single-dispatch fused graph; CFG (when a negative
        prompt is set) runs *inside* that graph, never as a separate
        pipeline path: batched cond+uncond by default, or the Residual-CFG
        variants when cfg_mode is "rcfg"/"rcfg-self" (see _fused_frame_fn).
        """
        t0 = time.time()
        cfgc = self.config
        steps = cfgc.num_inference_steps
        if self._ssf_should_skip(frame, self._ssf_out is not None):
            # static scene: re-serve the previous output at zero device
            # cost (Stochastic Similarity Filter; keyframe cadence counts
            # PROCESSED frames, so skips don't consume keyframe slots)
            self.skipped_frames += 1
            return self._ssf_out
        self.is_keyframe = (
            self.frame_count % cfgc.keyframe_interval == 0
            or self.prev_latent is None
        )

        out = self._fused_frame(frame, steps)
        self.frame_count += 1
        self.inference_times.append(time.time() - t0)
        if cfgc.similarity_filter:
            self._ssf_out = out
        return out

    def submit_frame(self, frame: Image.Image):
        """Non-blocking variant for pipelined streaming: dispatches the
        fused graph and returns a device pixel handle to pass to
        :meth:`_collect`. While frame N computes on-device, the host
        preps + dispatches frame N+1 — throughput ≈ 1/compute instead of
        1/(compute + dispatch + host), at one frame of extra latency."""
        cfgc = self.config
        if self._ssf_should_skip(frame, self._ssf_pixels is not None):
            # similarity skip in the pipelined path: hand back the last
            # dispatched pixels handle — _collect re-fetches it for free
            # (the host copy is cached after the first fetch)
            self.skipped_frames += 1
            return self._ssf_pixels
        self.is_keyframe = (
            self.frame_count % cfgc.keyframe_interval == 0
            or self.prev_latent is None
        )
        pixels = self._submit_fused(frame, cfgc.num_inference_steps)
        self.frame_count += 1
        if cfgc.similarity_filter:
            self._ssf_pixels = pixels
        return pixels

    def _submit_fused(self, frame: Image.Image, steps: int):
        """Dispatch one fused frame WITHOUT blocking; returns the device
        pixels array. ``prev_latent`` is updated with the (still
        in-flight) latent array — the next frame's temporal dependency is
        resolved device-side, so frames pipeline with zero host syncs
        between dispatches (JAX async dispatch)."""
        p = self.pipe
        cfgc = self.config
        s = self._preview_scale()
        preview = s > 1 and not self.is_keyframe
        if preview:
            # hybrid-resolution temporal frame: the WHOLE pipeline (cond
            # encode + denoise + decode) runs at width/s × height/s; the
            # condition is the live frame at exactly the preview grid
            # (img2img at the processing resolution — StreamDiffusion's
            # convention). s² fewer pixels everywhere: upload bytes,
            # attention tokens, decode, fetch.
            out_w, out_h = cfgc.width // s, cfgc.height // s
            vae_images = [np.asarray(imaging.resize(frame, out_w, out_h),
                                     dtype=np.uint8)]
        else:
            out_h, out_w, vae_images, vl_images = p._prepare_images(
                [frame], cfgc.height, cfgc.width
            )
        # frozen prompt conditioning (CachedConditions semantics) — no
        # per-frame VL encode; fall back to on-the-fly encoding if the
        # caller never called precompute_conditions
        if getattr(self, "_frozen_txt", None) is None:
            self.precompute_conditions(self.prompt, self.negative_prompt)
        txt, mask = self._frozen_txt, self._frozen_mask
        neg_txt, neg_mask = self._frozen_neg_txt, self._frozen_neg_mask
        use_cfg = (self.negative_prompt is not None
                   and cfgc.true_cfg_scale > 1.0)

        arr = vae_images[0]
        hw_in = arr.shape[:2]
        if cfgc.transfer_format == "yuv420":
            # half the host→device bytes per camera frame (ops/colorspace.py)
            from qwen_image_edit_streamdiffusion_tpu.ops import colorspace

            frame_u8 = jnp.asarray(colorspace.pack_yuv420_host(arr))[None]
        else:
            frame_u8 = jnp.asarray(arr, jnp.uint8)[None]
        czh, czw = arr.shape[0] // 8, arr.shape[1] // 8
        cond_shapes = [(1, czh // 2, czw // 2)]
        zh, zw = out_h // 8, out_w // 8
        key = frame_key(stream(key_from_seed(cfgc.seed), "temporal"),
                        self.frame_count)

        kind = "key" if self.is_keyframe else "temporal"
        start = 0 if self.is_keyframe else steps - self._refine_steps()
        fn = self._fused_frame_fn(kind, hw_in, zh, zw, cond_shapes,
                                  txt.shape[1], steps, start, use_cfg,
                                  prev_pool=s if self.is_keyframe else 1)
        prev = self.prev_latent
        if self.is_keyframe or prev is None:
            # the "key" graph ignores prev; pass a fixed-shape placeholder
            # so the trace signature never depends on what the previous
            # (possibly preview-resolution) frame left behind
            prev = jnp.zeros((1, zh, zw, p.preset.vae.latent_channels),
                             jnp.float32)
        pixels, latents = fn(
            p.tfm_params, p._encode_params_for(kind), p._decode_params,
            frame_u8, prev, key,
            jnp.float32(cfgc.noise_strength), txt, mask, neg_txt, neg_mask,
            jnp.float32(cfgc.true_cfg_scale),
        )
        self.prev_latent = latents
        return pixels

    def _collect(self, pixels) -> Image.Image:
        if isinstance(pixels, tuple) and isinstance(pixels[0], BatchPixels):
            bp, row = pixels  # one fetch for the whole coalesced batch
            img = bp.fetch(self.pipe)[row]
        else:
            img = self.pipe._fetch_images(pixels)[0]
        if self._preview_scale() > 1 and img.size != (self.config.width,
                                                      self.config.height):
            # preview-resolution temporal frames upscale host-side to the
            # display size (native C++ Lanczos when built, PIL otherwise)
            # — keyframe results already arrive full size and pass through
            from qwen_image_edit_streamdiffusion_tpu.runtime import native_ops

            img = Image.fromarray(native_ops.resize_lanczos(
                np.asarray(img), self.config.height, self.config.width))
        return img

    def _fused_frame(self, frame: Image.Image, steps: int) -> Image.Image:
        """Single-dispatch frame: encode → denoise → decode in one graph."""
        return self._collect(self._submit_fused(frame, steps))

    # ------------------------------------------------------------------
    # Stochastic Similarity Filter (StreamDiffusion §3.3)
    # ------------------------------------------------------------------

    def _ssf_should_skip(self, frame: Image.Image,
                         have_output: bool = True) -> bool:
        """True when this frame should reuse the previous output instead
        of running inference: the mean-centered cosine similarity of a
        32×32 grayscale signature vs the last *processed* frame exceeds
        similarity_threshold, a Bernoulli((sim−τ)/(1−τ)) draw fires, and
        fewer than similarity_max_skip frames were skipped in a row. The
        probabilistic skip (vs a hard gate) is the paper's point: under a
        static-but-noisy camera the stream keeps refreshing occasionally
        instead of freezing, while device work drops with how static the
        scene is."""
        cfg = self.config
        if not cfg.similarity_filter:
            return False
        sig = np.asarray(
            frame.convert("L").resize((32, 32), Image.BILINEAR), np.float32
        ).ravel()
        sig = sig - sig.mean()
        prev = self._ssf_sig
        if prev is None or not have_output:
            self._ssf_sig = sig
            return False
        denom = float(np.linalg.norm(sig) * np.linalg.norm(prev)) + 1e-8
        sim = float(np.dot(sig, prev)) / denom
        tau = min(cfg.similarity_threshold, 1.0 - 1e-6)
        prob = max(0.0, (sim - tau) / (1.0 - tau))
        if self._ssf_rng is None:
            self._ssf_rng = np.random.default_rng(cfg.seed)
        skip = (prob > 0.0
                and self._ssf_streak < cfg.similarity_max_skip
                and float(self._ssf_rng.random()) < prob)
        if skip:
            self._ssf_streak += 1
        else:
            self._ssf_sig = sig
            self._ssf_streak = 0
        return skip

    # ------------------------------------------------------------------

    def warmup(self, runs: int = 3, size: Optional[int] = None) -> None:
        """Compile both keyframe and temporal graphs (reference
        qwen_realtime.py:270-287)."""
        w = self.config.width or size or 512
        h = self.config.height or size or 512
        img = imaging.make_test_image(w, h, "gray")
        for _ in range(max(2, runs)):
            # identical warmup frames must not be similarity-skipped — the
            # temporal graph would never compile
            self._ssf_sig = self._ssf_out = None
            self.process_frame(img)
        self.frame_count = 0
        self.prev_latent = None
        self.inference_times.clear()
        self.skipped_frames = 0
        self._ssf_sig = self._ssf_out = self._ssf_pixels = None
        self._ssf_streak = 0

    def get_stats(self) -> Dict:
        """Rolling 30-frame stats (reference qwen_realtime.py:289-302)."""
        if not self.inference_times:
            return {}
        avg = float(np.mean(self.inference_times[-30:]))
        stats = {
            "avg_inference_time": avg,
            "fps": (1.0 / avg) if avg > 0 else 0.0,
            "frame_count": self.frame_count,
            "keyframe": self.is_keyframe,
        }
        if self.config.similarity_filter:
            stats["skipped_frames"] = self.skipped_frames
        return stats

    # ------------------------------------------------------------------

    def run_benchmark(self, num_frames: int = 20,
                      pipelined: bool = True) -> float:
        """Frame-loop benchmark (reference qwen_realtime.py:390-428).

        pipelined=True overlaps host work + dispatch of frame N+1 with
        frame N's device compute (one frame of latency, ~the device-compute
        throughput). pipelined=False measures pure sequential latency."""
        w = self.config.width or 512
        h = self.config.height or 512
        img = imaging.make_test_image(w, h, "gradient")
        out = None
        t_start = time.time()
        if pipelined:
            pending = None
            for i in range(num_frames):
                nxt = self.submit_frame(img)
                if pending is not None:
                    out = self._collect(pending)
                pending = nxt
            out = self._collect(pending)
            total = time.time() - t_start
            fps = num_frames / total
            print(f"[Benchmark] {num_frames} frames pipelined: "
                  f"{total / num_frames:.3f}s/frame → {fps:.2f} fps")
        else:
            times = []
            for i in range(num_frames):
                t0 = time.time()
                out = self.process_frame(img)
                times.append(time.time() - t0)
            avg = float(np.mean(times))
            fps = 1.0 / avg if avg else 0.0
            print(f"[Benchmark] {num_frames} frames: {avg:.3f}s ± "
                  f"{float(np.std(times)):.3f}s → {fps:.2f} fps")
        if out is not None:  # parity: reference saves the last frame
            out.save("benchmark_output.png")
        return fps

    def run_camera_loop(self, max_frames: Optional[int] = None,
                        pipelined: bool = True) -> None:
        """Webcam loop (reference qwen_realtime.py:304-387). Falls back to
        the animated sine test pattern when no camera/cv2 is available.

        pipelined=True (default) overlaps frame N+1's host prep + dispatch
        with frame N's device compute — the same ~1.8× throughput win as
        :meth:`run_benchmark`, at one frame of display latency (a standard
        webcam-preview tradeoff). pipelined=False shows each frame fully
        synchronously."""
        try:
            import cv2  # noqa: F401
            cap = cv2.VideoCapture(self.config.camera_id)
            have_cv = cap.isOpened()
        except Exception:
            cv2 = None
            cap = None
            have_cv = False

        w = self.config.width or 512
        h = self.config.height or 512
        interval = 1.0 / self.config.target_fps
        n = 0
        last = time.time()
        pending = None
        pending_src = None
        try:
            while max_frames is None or n < max_frames:
                if have_cv:
                    ok, bgr = cap.read()
                    if not ok:
                        break
                    frame = Image.fromarray(bgr[:, :, ::-1])
                else:
                    frame = imaging.make_test_image(w, h, "sine")
                if pipelined:
                    t0 = time.time()
                    # don't dispatch a frame that will never be displayed
                    # (NB: `last` is the throttle timestamp — don't shadow)
                    is_final = max_frames is not None and n == max_frames - 1
                    if is_final and pending is not None:
                        nxt = None
                    else:
                        nxt = self.submit_frame(frame)
                    if pending is None:  # prime: collect next iteration
                        pending, pending_src = nxt, frame
                        continue
                    out = self._collect(pending)
                    self.inference_times.append(time.time() - t0)
                    frame, (pending, pending_src) = pending_src, (nxt, frame)
                else:
                    out = self.process_frame(frame)
                stats = self.get_stats()
                if have_cv and cv2 is not None:
                    disp = np.asarray(out)[:, :, ::-1].copy()
                    for j, line in enumerate([
                        f"FPS: {stats.get('fps', 0):.1f}",
                        f"Steps: {self.config.num_inference_steps}",
                        f"Frame: {self.frame_count}",
                    ]):
                        cv2.putText(disp, line, (10, 30 + 30 * j),
                                    cv2.FONT_HERSHEY_SIMPLEX, 1,
                                    (0, 255, 0), 2)
                    cv2.imshow("Original", np.asarray(frame)[:, :, ::-1])
                    cv2.imshow("Qwen Real-time Edit (TPU)", disp)
                    if cv2.waitKey(1) & 0xFF == ord("q"):
                        break
                else:
                    print(f"frame {n}: {stats}")
                n += 1
                dt = time.time() - last
                if dt < interval:
                    time.sleep(interval - dt)
                last = time.time()
        finally:
            # drain the in-flight frame on early exit ('q' keypress, camera
            # read failure) so its result/latency sample isn't silently
            # dropped (ADVICE r2)
            if pending is not None:
                try:
                    self._collect(pending)
                except Exception:
                    pass
            if have_cv and cap is not None:
                cap.release()
                if cv2 is not None:
                    cv2.destroyAllWindows()


def submit_frames_batched(sessions: List[RealtimePipeline],
                          frames: List[Image.Image]) -> list:
    """Dispatch several sessions' frames as ONE multi-row fused graph.

    Cross-SESSION continuous batching: N concurrent webcam users' temporal
    refine frames run in a single device dispatch with per-row conditioning
    (each row keeps its own frozen prompt embeds, previous latent, and
    frame-indexed noise key), instead of serializing N whole dispatches on
    the device lock. Row r's math is identical to session r dispatching
    alone — only the graph is shared. The engine's dynamic-batching leader
    groups compatible queued session frames and calls this
    (runtime/engine.py); the single-session path is unchanged.

    Contract (the caller groups by exactly this): every session must agree
    on frame kind (keyframe vs temporal — mixed schedules can't share a
    fori_loop), steps, CFG-ness, output geometry, transfer format, noise
    strength and cfg scale, and must not be in hybrid-resolution preview
    (`preview_scale` > 1 — its temporal grid differs from the keyframe
    grid) — a mismatch raises ValueError. The Stochastic Similarity Filter
    is NOT applied here (the caller routes SSF sessions individually).

    Returns one ``(BatchPixels, row)`` handle per session, accepted by
    :meth:`RealtimePipeline._collect`; the first collector fetches the
    whole batch in one device→host transfer. Session temporal state
    (prev_latent, frame_count, is_keyframe) updates as if each had
    dispatched alone.
    """
    if len(sessions) != len(frames):
        raise ValueError("one frame per session required")
    if len(sessions) == 1:
        return [sessions[0].submit_frame(frames[0])]
    lead = sessions[0]
    p = lead.pipe
    c0 = lead.config

    def _sig(sess):
        c = sess.config
        return (c.width, c.height, c.num_inference_steps,
                c.transfer_format, c.noise_strength, c.true_cfg_scale,
                sess.negative_prompt is not None and c.true_cfg_scale > 1.0)

    def _kf(sess):
        return (sess.frame_count % sess.config.keyframe_interval == 0
                or sess.prev_latent is None)

    sig0, kf0 = _sig(lead), _kf(lead)
    for sess in sessions[1:]:
        if sess.pipe.tfm_params is not p.tfm_params:
            raise ValueError("batched sessions must share pipeline params")
        if _sig(sess) != sig0 or _kf(sess) != kf0:
            raise ValueError(
                f"incompatible session for batched dispatch: {_sig(sess)}/"
                f"kf={_kf(sess)} != {sig0}/kf={kf0}")
    for sess in sessions:
        if sess._preview_scale() > 1:
            raise ValueError("preview_scale sessions cannot batch "
                             "(temporal grid differs from keyframe grid)")

    steps = c0.num_inference_steps
    use_cfg = sig0[-1]
    kind = "key" if kf0 else "temporal"
    start = 0 if kf0 else steps - lead._refine_steps()

    rows_u8, rows_prev, rows_key = [], [], []
    rows_txt, rows_mask, rows_ntxt, rows_nmask = [], [], [], []
    out_hw = cond_hw = None
    for sess, frame in zip(sessions, frames):
        cfgc = sess.config
        out_h, out_w, vae_images, _vl = sess.pipe._prepare_images(
            [frame], cfgc.height, cfgc.width)
        if getattr(sess, "_frozen_txt", None) is None:
            sess.precompute_conditions(sess.prompt, sess.negative_prompt)
        arr = vae_images[0]
        if out_hw is None:
            out_hw, cond_hw = (out_h, out_w), arr.shape[:2]
        elif (out_h, out_w) != out_hw or arr.shape[:2] != cond_hw:
            raise ValueError("batched sessions must share image geometry")
        if cfgc.transfer_format == "yuv420":
            from qwen_image_edit_streamdiffusion_tpu.ops import colorspace

            rows_u8.append(
                jnp.asarray(colorspace.pack_yuv420_host(arr))[None])
        else:
            rows_u8.append(jnp.asarray(arr, jnp.uint8)[None])
        rows_key.append(frame_key(
            stream(key_from_seed(cfgc.seed), "temporal"), sess.frame_count))
        rows_txt.append(sess._frozen_txt)
        rows_mask.append(sess._frozen_mask)
        rows_ntxt.append(sess._frozen_neg_txt)
        rows_nmask.append(sess._frozen_neg_mask)

    out_h, out_w = out_hw
    zh, zw = out_h // 8, out_w // 8
    zc = p.preset.vae.latent_channels
    for sess in sessions:
        prev = sess.prev_latent
        if kf0 or prev is None:
            prev = jnp.zeros((1, zh, zw, zc), jnp.float32)
        rows_prev.append(prev)

    # rows' prompt-length buckets may differ (the VL encoder buckets to
    # multiples of 128) — pad to the max; masked tokens are inert
    txt_len = max(max(t.shape[1] for t in rows_txt),
                  max(t.shape[1] for t in rows_ntxt))

    def _pad(a, fill=0):
        if a.shape[1] == txt_len:
            return a
        pad = [(0, 0), (0, txt_len - a.shape[1])] + [(0, 0)] * (a.ndim - 2)
        return jnp.pad(a, pad, constant_values=fill)

    frames_u8 = jnp.concatenate(rows_u8, axis=0)
    prev = jnp.concatenate(rows_prev, axis=0)
    keys = jnp.stack(rows_key)
    txt = jnp.concatenate([_pad(t) for t in rows_txt], axis=0)
    mask = jnp.concatenate([_pad(m, False) for m in rows_mask], axis=0)
    neg_txt = jnp.concatenate([_pad(t) for t in rows_ntxt], axis=0)
    neg_mask = jnp.concatenate([_pad(m, False) for m in rows_nmask], axis=0)

    czh, czw = cond_hw[0] // 8, cond_hw[1] // 8
    cond_shapes = [(1, czh // 2, czw // 2)]
    fn = lead._fused_frames_fn(len(sessions), kind, cond_hw, zh, zw,
                               cond_shapes, txt_len, steps, start, use_cfg)
    pixels, latents = fn(
        p.tfm_params, p._encode_params_for(kind), p._decode_params,
        frames_u8, prev, keys,
        jnp.float32(c0.noise_strength), txt, mask, neg_txt, neg_mask,
        jnp.float32(c0.true_cfg_scale),
    )
    bp = BatchPixels(pixels)
    for r, sess in enumerate(sessions):
        sess.prev_latent = latents[r:r + 1]
        sess.frame_count += 1
        sess.is_keyframe = kf0
    return [(bp, r) for r in range(len(sessions))]
