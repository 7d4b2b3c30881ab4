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
  through the same caches as the batch pipeline.

Every (keyframe, temporal) variant is its own persistent compiled graph —
no retraces once warm.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from qwen_image_edit_streamdiffusion_tpu.core import imaging
from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
from qwen_image_edit_streamdiffusion_tpu.core.rng import frame_key, key_from_seed, stream
from qwen_image_edit_streamdiffusion_tpu.models import scheduler as sched
from qwen_image_edit_streamdiffusion_tpu.models import transformer as tfm
from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import EditPipeline


@dataclass
class RealtimePipeline:
    pipe: EditPipeline
    prompt: str = ""
    negative_prompt: Optional[str] = None
    prev_latent: Optional[jnp.ndarray] = None  # (1, zh, zw, z)
    frame_count: int = 0
    is_keyframe: bool = True
    inference_times: List[float] = field(default_factory=list)

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
                              negative_prompt: Optional[str] = None) -> None:
        """Set + pre-warm the prompt conditioning (reference
        qwen_realtime.py:140-165; the actual embeds land in the prompt
        cache on first use and are reused every frame)."""
        self.prompt = prompt
        self.negative_prompt = negative_prompt

    # ------------------------------------------------------------------

    def _refine_steps(self) -> int:
        steps = self.config.num_inference_steps
        return max(1, steps // 2)

    def process_frame(self, frame: Image.Image) -> Image.Image:
        """Edit one camera frame (reference qwen_realtime.py:226-268)."""
        t0 = time.time()
        cfgc = self.config
        steps = cfgc.num_inference_steps
        self.is_keyframe = (
            self.frame_count % cfgc.keyframe_interval == 0
            or self.prev_latent is None
        )

        if self.is_keyframe:
            res = self.pipe(
                frame, self.prompt, negative_prompt=self.negative_prompt,
                num_inference_steps=steps,
                seed=cfgc.seed + self.frame_count,
            )
            self.prev_latent = res.latents
            out = res.images[0]
        else:
            out = self._temporal_frame(frame, steps)

        self.frame_count += 1
        self.inference_times.append(time.time() - t0)
        return out

    def _temporal_frame(self, frame: Image.Image, steps: int) -> Image.Image:
        """Partial re-denoise from the cached latent."""
        p = self.pipe
        cfgc = self.config
        refine = self._refine_steps()
        start = steps - refine

        out_h, out_w, vae_images, vl_images = p._prepare_images(
            [frame], cfgc.height, cfgc.width
        )
        encode_prompt = (p.prompt_cache.encode if p.prompt_cache
                         else p.encoder.encode)
        emb = encode_prompt(self.prompt, vl_images)
        model_dtype = jnp.dtype(p.preset.model.dtype)
        txt = jnp.asarray(emb.embeds, model_dtype)[None]
        mask = jnp.asarray(emb.mask)[None]
        cond_tokens, cond_shapes = p.encode_condition_latents(vae_images)

        zh, zw = out_h // 8, out_w // 8
        schedule = sched.make_schedule(
            steps, (zh // 2) * (zw // 2), p.preset.scheduler
        )
        key = frame_key(stream(key_from_seed(cfgc.seed), "temporal"),
                        self.frame_count)
        # jitted temporal re-noise: jitter + forward-process to sigma[start]
        # + pack, one dispatch (hot per-frame path)
        tk = ("temporal_x0", self.prev_latent.shape)
        if tk not in p._jit_cache:
            @jax.jit
            def prep(prev, rng, noise_strength, sigma):
                k1, k2 = jax.random.split(rng)
                prev32 = prev.astype(jnp.float32)
                prev32 = prev32 + noise_strength * jax.random.normal(
                    k1, prev32.shape, jnp.float32
                )
                eps = jax.random.normal(k2, prev32.shape, jnp.float32)
                x = sched.scale_noise(prev32, eps, sigma)
                return tfm.pack_latents(x).astype(model_dtype)

            p._jit_cache[tk] = prep
        x0 = p._jit_cache[tk](self.prev_latent, key,
                              jnp.float32(cfgc.noise_strength),
                              schedule.sigmas[start])

        img_shapes = tuple([(1, zh // 2, zw // 2)] + cond_shapes)
        run = p._denoise_fn(
            batch=1, img_shapes=img_shapes, txt_len=txt.shape[1],
            num_steps=steps, cfg_mode="none", start_step=start,
        )
        final = run(p.tfm_params, x0, cond_tokens, txt, mask, txt, mask,
                    jnp.float32(1.0))
        pixels, latents = p._vae_decode_fn((zh, zw))(p.vae_params, final)
        self.prev_latent = latents
        return Image.fromarray(np.asarray(jax.block_until_ready(pixels))[0])

    # ------------------------------------------------------------------

    def warmup(self, runs: int = 3, size: Optional[int] = None) -> None:
        """Compile both keyframe and temporal graphs (reference
        qwen_realtime.py:270-287)."""
        w = self.config.width or size or 512
        h = self.config.height or size or 512
        img = imaging.make_test_image(w, h, "gray")
        for _ in range(max(2, runs)):
            self.process_frame(img)
        self.frame_count = 0
        self.prev_latent = None
        self.inference_times.clear()

    def get_stats(self) -> Dict:
        """Rolling 30-frame stats (reference qwen_realtime.py:289-302)."""
        if not self.inference_times:
            return {}
        avg = float(np.mean(self.inference_times[-30:]))
        return {
            "avg_inference_time": avg,
            "fps": (1.0 / avg) if avg > 0 else 0.0,
            "frame_count": self.frame_count,
            "keyframe": self.is_keyframe,
        }

    # ------------------------------------------------------------------

    def run_benchmark(self, num_frames: int = 20) -> float:
        """Frame-loop benchmark (reference qwen_realtime.py:390-428)."""
        w = self.config.width or 512
        h = self.config.height or 512
        img = imaging.make_test_image(w, h, "gradient")
        times = []
        for i in range(num_frames):
            t0 = time.time()
            self.process_frame(img)
            times.append(time.time() - t0)
        avg = float(np.mean(times))
        fps = 1.0 / avg if avg else 0.0
        print(f"[Benchmark] {num_frames} frames: {avg:.3f}s ± "
              f"{float(np.std(times)):.3f}s → {fps:.2f} fps")
        return fps

    def run_camera_loop(self, max_frames: Optional[int] = None) -> None:
        """Webcam loop (reference qwen_realtime.py:304-387). Falls back to
        the animated sine test pattern when no camera/cv2 is available."""
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
        try:
            while max_frames is None or n < max_frames:
                if have_cv:
                    ok, bgr = cap.read()
                    if not ok:
                        break
                    frame = Image.fromarray(bgr[:, :, ::-1])
                else:
                    frame = imaging.make_test_image(w, h, "sine")
                out = self.process_frame(frame)
                stats = self.get_stats()
                if have_cv and cv2 is not None:
                    disp = np.asarray(out)[:, :, ::-1].copy()
                    cv2.putText(disp, f"FPS: {stats.get('fps', 0):.1f}",
                                (10, 30), cv2.FONT_HERSHEY_SIMPLEX, 1,
                                (0, 255, 0), 2)
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
            if have_cv and cap is not None:
                cap.release()
                if cv2 is not None:
                    cv2.destroyAllWindows()
