"""End-to-end image-edit pipeline — the TPU-native QwenImageEditPlusPipeline.

Replaces the upstream pipeline the reference calls at server.py:137-153 /
webui_realtime.py:77-86 / qwen_realtime.py:247-255 (hot path documented in
SURVEY.md §3.2):

  preprocess → VL prompt encode → VAE-encode condition image(s) →
  flow-matching denoise loop (``lax.fori_loop`` inside ONE jit) → VAE decode

TPU-first structure:
- The entire denoise loop is a single compiled graph per
  (batch, resolution, text-bucket, steps, cfg_mode) key — persistent
  compiled graphs replace torch.compile (SURVEY.md §2.3 N3); warmup = AOT
  compile, later calls replay with zero Python in the loop.
- Three CFG execution modes from day one (SURVEY.md §2.4): "none"
  (cond-only fast path), "batched" (cond+uncond stacked on the batch axis —
  the reference's documented batched_cfg_pipeline, ~1.5-1.7×), and
  "sequential" (two passes/step, stock-diffusers semantics). A fourth,
  "parallel" (2-way shard over the mesh `cfg` axis = parallel_cfg_*), lives
  in parallel/cfg_parallel.py.
- Guided velocity uses the upstream norm-rescaling rule:
  comb ← (neg + s·(pos−neg)) · ‖pos‖/‖comb‖, computed in f32.

Call signature parity (reference server.py:137-153): ``image=[PIL...],
prompt, negative_prompt, num_inference_steps, guidance_scale (embedded-
guidance no-op for this model family), true_cfg_scale, seed`` → result with
``.images: List[PIL]``.
"""

from __future__ import annotations

import time
import warnings
from dataclasses import dataclass, field
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from qwen_image_edit_streamdiffusion_tpu.core import imaging
from qwen_image_edit_streamdiffusion_tpu.core.config import (
    Preset,
    StreamConfig,
    get_preset,
)
from qwen_image_edit_streamdiffusion_tpu.core.rng import key_from_seed, stream
from qwen_image_edit_streamdiffusion_tpu.models import transformer as tfm
from qwen_image_edit_streamdiffusion_tpu.models import vae as vae_mod
from qwen_image_edit_streamdiffusion_tpu.ops import colorspace
from qwen_image_edit_streamdiffusion_tpu.models import scheduler as sched
from qwen_image_edit_streamdiffusion_tpu.models.text_encoder import (
    PromptEncoder,
    StubEncoder,
)



def combine_cfg(pos: jnp.ndarray, neg: jnp.ndarray, scale) -> jnp.ndarray:
    """True-CFG combine with cond-norm rescaling (upstream rule), in f32."""
    pos32 = pos.astype(jnp.float32)
    neg32 = neg.astype(jnp.float32)
    comb = neg32 + scale * (pos32 - neg32)
    cond_norm = jnp.linalg.norm(pos32, axis=-1, keepdims=True)
    comb_norm = jnp.linalg.norm(comb, axis=-1, keepdims=True)
    comb = comb * (cond_norm / jnp.maximum(comb_norm, 1e-12))
    return comb.astype(pos.dtype)


def rcfg_self_negative(x: jnp.ndarray, anchor: jnp.ndarray, sigma,
                       out_dtype=None) -> jnp.ndarray:
    """rcfg-self virtual negative velocity (StreamDiffusion §3.2's virtual
    residual noise translated to flow matching): the velocity that would
    reconstruct the unedited condition latents, v_neg = (x_t − z_a)/σ_t,
    σ floored at 1e-3 (the terminal sigma is ~0 and the quotient must not
    blow up on the last step). Guidance then pushes away from the input
    image at cond-only forward cost — the natural stream fit, where the
    condition IS the current frame. Pinned by verify_parity
    (cfg.rcfg_self_combined)."""
    sig = jnp.maximum(sigma, 1e-3)
    neg = (x.astype(jnp.float32) - anchor.astype(jnp.float32)) / sig
    return neg.astype(out_dtype if out_dtype is not None else x.dtype)


class EditResult(NamedTuple):
    images: List[Image.Image]
    latents: jnp.ndarray  # final normalized latents (B, h, w, z)
    elapsed: float


def _default_encoder(preset: Preset, config: StreamConfig, seed: int
                     ) -> PromptEncoder:
    """Reference parity default: the native Qwen2.5-VL encoder runs in-path
    on every call (upstream pipeline behavior, SURVEY.md §3.2). Weights are
    random-init until a checkpoint is supplied (from_checkpoint(vl_path=…)).
    use_vl_encoder=False opts into the StubEncoder test double."""
    if config.use_vl_encoder:
        from qwen_image_edit_streamdiffusion_tpu.models.qwen_vl import (
            QwenVLEncoder,
        )

        return QwenVLEncoder(preset.vl, seed=seed,
                             max_len=preset.vl.max_text_len,
                             use_flash=config.use_flash_attention)
    return StubEncoder.from_config(preset.vl)


def _check_tiny_cfg(tcfg, vae_cfg, path: str) -> None:
    if (tcfg.latent_channels != vae_cfg.latent_channels
            or tcfg.spatial_upsample != vae_cfg.spatial_downsample):
        raise ValueError(
            f"tiny decoder {path!r} reads a ({tcfg.latent_channels}ch, "
            f"{tcfg.spatial_upsample}x) latent grid but the preset's VAE "
            f"produces ({vae_cfg.latent_channels}ch, "
            f"{vae_cfg.spatial_downsample}x)")


def _init_tiny_decoder(preset: Preset, config: StreamConfig, mesh,
                       path: Optional[str], seed: int):
    """(params, TinyDecoderConfig) for config.decoder="tiny": load the
    distilled artifact when given, else random-init with a loud warning
    (an untrained tiny decoder outputs noise — it exists so tests and
    speed benches can exercise the path without weights)."""
    if config.decoder != "tiny" and not path:
        return None
    from qwen_image_edit_streamdiffusion_tpu.models import tiny_vae

    if path:
        params, tcfg = tiny_vae.load(path)
        _check_tiny_cfg(tcfg, preset.vae, path)
    else:
        warnings.warn(
            "decoder='tiny' without a trained artifact: random-init tiny "
            "decoder (output is noise; distill one with "
            "training/tiny_vae.py or pass tiny_decoder_path)")
        tcfg = tiny_vae.TinyDecoderConfig.from_vae(preset.vae)
        params = tiny_vae.init_jit(
            stream(key_from_seed(seed), "tiny_vae"), tcfg)
    if mesh is not None:
        from qwen_image_edit_streamdiffusion_tpu.parallel import sharding

        params = sharding.replicate(params, mesh)
    return params, tcfg


def _check_tiny_enc_cfg(ecfg, vae_cfg, path: str) -> None:
    if (ecfg.latent_channels != vae_cfg.latent_channels
            or ecfg.spatial_downsample != vae_cfg.spatial_downsample):
        raise ValueError(
            f"tiny encoder {path!r} writes a ({ecfg.latent_channels}ch, "
            f"{ecfg.spatial_downsample}x) latent grid but the preset's VAE "
            f"uses ({vae_cfg.latent_channels}ch, "
            f"{vae_cfg.spatial_downsample}x)")


def _init_tiny_encoder(preset: Preset, config: StreamConfig, mesh,
                       path: Optional[str], seed: int):
    """(params, TinyEncoderConfig) for config.encoder="tiny" — the other
    half of the TAESD pair (VERDICT r3 next #4): stream TEMPORAL frames
    encode through it; keyframes and /edit conditioning keep the full
    VAE. Same load-or-warn policy as the tiny decoder."""
    if config.encoder != "tiny" and not path:
        return None
    from qwen_image_edit_streamdiffusion_tpu.models import tiny_vae

    if path:
        params, ecfg = tiny_vae.load_encoder(path)
        _check_tiny_enc_cfg(ecfg, preset.vae, path)
    else:
        warnings.warn(
            "encoder='tiny' without a trained artifact: random-init tiny "
            "encoder (conditioning latents are noise; distill one with "
            "training/tiny_vae.py --encoder or pass tiny_encoder_path)")
        ecfg = tiny_vae.TinyEncoderConfig.from_vae(preset.vae)
        params = tiny_vae.encoder_init_jit(
            stream(key_from_seed(seed), "tiny_vae_enc"), ecfg)
    if mesh is not None:
        from qwen_image_edit_streamdiffusion_tpu.parallel import sharding

        params = sharding.replicate(params, mesh)
    return params, ecfg


def _finalize_encoder(encoder: PromptEncoder, config: StreamConfig, mesh):
    """Apply the deployment levers to a parameterized (VL) encoder:
    optional weight-only int8/int4 (config.use_int8_vl / use_int4_vl),
    then TP sharding over
    every mesh axis (VERDICT r2 missing #1 — the 7B encoder must live
    inside the per-chip memory budget, not replicated beside the
    transformer shard). StubEncoder (no ``params``) passes through."""
    params = getattr(encoder, "params", None)
    if params is None:
        return encoder
    if config.use_int4_vl or config.use_int8_vl:
        from qwen_image_edit_streamdiffusion_tpu.models.quantize import (
            quantize_vl,
        )

        want = 4 if config.use_int4_vl else 8
        leaf_keys = {
            getattr(path[-1], "key", None)
            for path, _ in jax.tree_util.tree_leaves_with_path(params)
        }
        saved = 4 if "w_q4" in leaf_keys else (8 if "w_q" in leaf_keys
                                               else None)
        if saved is None:
            params = quantize_vl(params, bits=want)
        elif saved != want:
            import warnings

            warnings.warn(
                f"config requests int{want} VL but the checkpoint is "
                f"pre-quantized int{saved}; serving the saved rung",
                stacklevel=2)
    if mesh is not None:
        from qwen_image_edit_streamdiffusion_tpu.parallel import sharding

        params = sharding.shard_vl_params(params, mesh)
        # a bare pallas_call inside the GSPMD-jitted encode would
        # replicate its operands — hand the encoder the mesh so its
        # decoder attention runs the causal flash kernel shard_mapped
        # over local head slices instead (ops.attention
        # sharded_causal_flash_attention; falls back to XLA grouped
        # einsum when the head counts don't tile the `model` axis)
        if hasattr(encoder, "mesh"):
            encoder.mesh = mesh
    encoder.params = params
    return encoder


@dataclass
class EditPipeline:
    """Holds params + per-shape-bucket compiled graphs.

    Not itself traced — all jitted functions are pure and hang off an
    internal cache keyed by static shape info.
    """

    preset: Preset
    config: StreamConfig
    tfm_params: Any
    vae_params: Any
    encoder: PromptEncoder
    mesh: Optional[Any] = None  # jax.sharding.Mesh for TP / parallel CFG
    prompt_cache: Optional[Any] = None  # pipeline.cache.PromptCache
    latent_cache: Optional[Any] = None  # pipeline.cache.LatentCache
    # (params, TinyDecoderConfig) for the TAESD-analog output decoder
    # (models/tiny_vae.py); active when config.decoder == "tiny".
    tiny_vae: Optional[Tuple[Any, Any]] = None
    # (params, TinyEncoderConfig) for the TAESD-analog input encoder;
    # active for stream TEMPORAL frames when config.encoder == "tiny"
    # (keyframes + /edit conditioning always use the full VAE).
    tiny_encoder: Optional[Tuple[Any, Any]] = None
    _jit_cache: Dict[Any, Any] = field(default_factory=dict)

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------

    @classmethod
    def create(
        cls,
        preset: str | Preset = "qwen-image-edit-2509",
        config: Optional[StreamConfig] = None,
        seed: int = 0,
        encoder: Optional[PromptEncoder] = None,
        mesh=None,
        tiny_decoder_path: Optional[str] = None,
        tiny_encoder_path: Optional[str] = None,
    ) -> "EditPipeline":
        """Random-init construction (weights loaded separately via
        models.convert when a checkpoint is available). With a mesh, the
        transformer is tensor-parallel-sharded over the `model` axis and
        cfg_mode="parallel" splits cond/uncond over the `cfg` axis.
        tiny_decoder_path loads a distilled tiny output decoder and
        implies config.decoder="tiny"; tiny_encoder_path likewise implies
        config.encoder="tiny" (stream temporal frames only)."""
        if isinstance(preset, str):
            preset = get_preset(preset)
        config = config or StreamConfig(model_preset=preset.name)
        key = key_from_seed(seed)
        tfm_params = tfm.init_jit(stream(key, "transformer"), preset.model)
        vae_params = vae_mod.init_jit(stream(key, "vae"), preset.vae)
        if config.fuse_qkv and mesh is None:
            from qwen_image_edit_streamdiffusion_tpu.models.optimize import fuse_qkv

            tfm_params = fuse_qkv(tfm_params)
        if config.use_int4 or config.use_int8:
            from qwen_image_edit_streamdiffusion_tpu.models.quantize import (
                quantize_transformer,
            )

            tfm_params = quantize_transformer(
                tfm_params, bits=4 if config.use_int4 else 8)
        if mesh is not None:
            from qwen_image_edit_streamdiffusion_tpu.parallel import sharding

            tfm_params = sharding.shard_transformer_params(tfm_params, mesh)
            vae_params = sharding.replicate(vae_params, mesh)
        tiny = _init_tiny_decoder(preset, config, mesh, tiny_decoder_path,
                                  seed)
        if tiny is not None and config.decoder != "tiny":
            config = config.replace(decoder="tiny")
        tiny_enc = _init_tiny_encoder(preset, config, mesh,
                                      tiny_encoder_path, seed)
        if tiny_enc is not None and config.encoder != "tiny":
            config = config.replace(encoder="tiny")
        if encoder is None:
            encoder = _default_encoder(preset, config, seed)
        encoder = _finalize_encoder(encoder, config, mesh)
        from qwen_image_edit_streamdiffusion_tpu.pipeline.cache import (
            LatentCache,
            PromptCache,
        )

        return cls(preset=preset, config=config, tfm_params=tfm_params,
                   vae_params=vae_params, encoder=encoder, mesh=mesh,
                   prompt_cache=PromptCache(encoder),
                   latent_cache=LatentCache(), tiny_vae=tiny,
                   tiny_encoder=tiny_enc)

    @classmethod
    def from_checkpoint(
        cls,
        transformer_path: str,
        vae_path: str,
        preset: str | Preset = "qwen-image-edit-2509",
        config: Optional[StreamConfig] = None,
        vl_path: Optional[str] = None,
        lora_path: Optional[str] = None,
        mesh=None,
        tiny_decoder_path: Optional[str] = None,
        tiny_encoder_path: Optional[str] = None,
    ) -> "EditPipeline":
        """Construct from orbax checkpoints produced by
        models.checkpoint (LoRA fused → optional int8/int4 → optional TP
        shard, in that order). Pre-quantized checkpoints (convert
        --quantize int8|int4) are detected from metadata and restored
        straight into the TP layout — no boot-time quantize pass."""
        import jax as _jax

        from qwen_image_edit_streamdiffusion_tpu.models import checkpoint as ckpt

        if isinstance(preset, str):
            preset = get_preset(preset)
        config = config or StreamConfig(model_preset=preset.name)
        like_v = _jax.eval_shape(
            lambda: vae_mod.init(_jax.random.PRNGKey(0), preset.vae)
        )
        # Detect the saved qkv layout AND quantization rung from checkpoint
        # metadata (no array reads) rather than catching restore exceptions,
        # which vary by orbax version and failure mode. Pre-quantized
        # checkpoints (models.checkpoint convert --quantize) restore their
        # int8/int4 leaves straight into the TP layout — no boot-time
        # quantize pass, no transient bf16 residency.
        try:
            keys_t = ckpt.saved_keys(transformer_path)
        except Exception:
            keys_t = set()
        fused_saved = "img_qkv" in keys_t
        saved_bits = 4 if "w_q4" in keys_t else (8 if "w_q" in keys_t
                                                 else None)
        from qwen_image_edit_streamdiffusion_tpu.models.optimize import (
            fuse_qkv,
        )

        if lora_path and saved_bits:
            raise ValueError(
                "LoRA cannot be fused into a quantized checkpoint — fuse at "
                "conversion time instead: models.checkpoint convert "
                "--lora ... --quantize ..."
            )

        def _like_tfm(fused: bool):
            def build():
                p = tfm.init(_jax.random.PRNGKey(0), preset.model)
                if fused:
                    p = fuse_qkv(p)
                if saved_bits:
                    from qwen_image_edit_streamdiffusion_tpu.models.quantize import (  # noqa: E501
                        quantize_transformer,
                    )

                    p = quantize_transformer(p, bits=saved_bits)
                return p

            return _jax.eval_shape(build)

        like_t = _like_tfm(False)
        like_fused = _like_tfm(True)
        first, second = (
            (like_fused, like_t) if fused_saved else (like_t, like_fused)
        )

        def _shardings_for(like, spec_fn):
            """Restore STRAIGHT into the TP layout when a mesh is active:
            every host/device reads only its own shards. Loading the 40 GB
            flagship transformer replicated first (then re-sharding) would
            blow a 16 GB chip before sharding could happen."""
            if mesh is None:
                return None
            from jax.sharding import NamedSharding, PartitionSpec as _P

            return _jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), spec_fn(like),
                is_leaf=lambda x: isinstance(x, _P),
            )

        if mesh is not None:
            from jax.sharding import PartitionSpec as _PS

            from qwen_image_edit_streamdiffusion_tpu.parallel import (
                sharding as shd,
            )

            def tfm_spec_fn(like, _sizes=dict(mesh.shape)):
                return shd.transformer_param_specs(like, axis_sizes=_sizes)

            def vae_spec_fn(like):  # replicated
                return _jax.tree_util.tree_map(lambda _: _PS(), like)
        else:
            tfm_spec_fn = vae_spec_fn = None
        try:
            tfm_params = ckpt.load(
                transformer_path, like=first,
                shardings=_shardings_for(first, tfm_spec_fn),
            )
        except Exception as first_exc:
            # metadata-based layout detection can misread on orbax
            # versions whose metadata tree differs — fall back to the
            # other qkv layout before giving up (ADVICE r1 #4). Chain the
            # first error so a genuine failure (corrupt checkpoint, OOM)
            # doesn't surface as a confusing second-layout mismatch alone
            # (ADVICE r2 #1).
            try:
                tfm_params = ckpt.load(
                    transformer_path, like=second,
                    shardings=_shardings_for(second, tfm_spec_fn),
                )
            except Exception as second_exc:
                raise second_exc from first_exc
        vae_params = ckpt.load(
            vae_path, like=like_v,
            shardings=_shardings_for(like_v, vae_spec_fn),
        )
        if lora_path:
            from qwen_image_edit_streamdiffusion_tpu.models import lora

            tfm_params = lora.fuse_lora(
                tfm_params, lora.load_lora_weights(lora_path)
            )
        if config.fuse_qkv and mesh is None and not (saved_bits or fused_saved):
            # (a pre-quantized checkpoint is frozen in its saved layout —
            # int8/int4 leaves cannot be re-fused; a pre-fused one needs no
            # second pass)
            tfm_params = fuse_qkv(tfm_params)
        if config.use_int4 or config.use_int8:
            want_bits = 4 if config.use_int4 else 8
            if saved_bits is None:
                from qwen_image_edit_streamdiffusion_tpu.models.quantize import (  # noqa: E501
                    quantize_transformer,
                )

                tfm_params = quantize_transformer(tfm_params, bits=want_bits)
            elif saved_bits != want_bits:
                import warnings

                warnings.warn(
                    f"config requests int{want_bits} but the checkpoint is "
                    f"pre-quantized int{saved_bits}; serving the saved "
                    f"int{saved_bits} rung", stacklevel=2)
        if mesh is not None:
            from qwen_image_edit_streamdiffusion_tpu.parallel import sharding

            tfm_params = sharding.shard_transformer_params(tfm_params, mesh)
            vae_params = sharding.replicate(vae_params, mesh)
        if vl_path:
            from qwen_image_edit_streamdiffusion_tpu.models import qwen_vl
            from qwen_image_edit_streamdiffusion_tpu.models.qwen_vl import (
                QwenVLEncoder,
            )

            try:
                keys_vl = ckpt.saved_keys(vl_path)
            except Exception:
                keys_vl = set()
            vl_bits = 4 if "w_q4" in keys_vl else (8 if "w_q" in keys_vl
                                                   else None)
            if mesh is not None:
                # restore the 7B encoder straight into its mesh layout too
                from qwen_image_edit_streamdiffusion_tpu.parallel import (
                    sharding as shd,
                )

                def _build_vl():
                    p = qwen_vl._init_all(_jax.random.PRNGKey(0), preset.vl)
                    if vl_bits:
                        from qwen_image_edit_streamdiffusion_tpu.models.quantize import (  # noqa: E501
                            quantize_vl,
                        )

                        p = quantize_vl(p, bits=vl_bits)
                    return p

                like_vl = _jax.eval_shape(_build_vl)
                vl_axes = shd._vl_axes(mesh)
                vl_shardings = _shardings_for(
                    like_vl,
                    lambda like: shd.vl_param_specs(
                        like, axes=vl_axes, axis_sizes=dict(mesh.shape)
                    ),
                ) if vl_axes else None
                vl_params = ckpt.load(vl_path, like=like_vl,
                                      shardings=vl_shardings)
            else:
                vl_params = ckpt.load(vl_path)
            encoder: PromptEncoder = QwenVLEncoder(
                preset.vl, params=vl_params,
                max_len=preset.vl.max_text_len,
                use_flash=config.use_flash_attention,
            )
        else:
            encoder = _default_encoder(preset, config, seed=0)
        encoder = _finalize_encoder(encoder, config, mesh)
        tiny = _init_tiny_decoder(preset, config, mesh, tiny_decoder_path,
                                  seed=0)
        if tiny is not None and config.decoder != "tiny":
            config = config.replace(decoder="tiny")
        tiny_enc = _init_tiny_encoder(preset, config, mesh,
                                      tiny_encoder_path, seed=0)
        if tiny_enc is not None and config.encoder != "tiny":
            config = config.replace(encoder="tiny")
        from qwen_image_edit_streamdiffusion_tpu.pipeline.cache import (
            LatentCache,
            PromptCache,
        )

        return cls(preset=preset, config=config, tfm_params=tfm_params,
                   vae_params=vae_params, encoder=encoder, mesh=mesh,
                   prompt_cache=PromptCache(encoder),
                   latent_cache=LatentCache(), tiny_vae=tiny,
                   tiny_encoder=tiny_enc)

    # ------------------------------------------------------------------
    # Jitted stages (cached per static key)
    # ------------------------------------------------------------------

    def _vae_encode_fn(self, hw: Tuple[int, int], in_fmt: str = "rgb",
                       kind: str = "full"):
        """uint8 image → packed condition tokens, one jit: on-device
        normalization (¼ the host→device bytes of f32), VAE encode, 2×2
        packing, model-dtype cast — a single dispatch on the wire.

        in_fmt="rgb" takes uint8 (B, H, W, 3); in_fmt="yuv420" takes the
        packed 4:2:0 buffer from :func:`ops.colorspace.pack_yuv420_host`
        (half the host→device bytes — the upload twin of the decode-side
        transfer format) and converts to RGB on-device.

        kind="tiny" routes pixels through the TAESD-analog tiny encoder
        (``params`` must then be :attr:`tiny_encoder`'s tree — the stream
        passes :meth:`_encode_params_for`); /edit conditioning and stream
        keyframes stay on the exact full-VAE path."""
        key = ("vae_encode", hw, in_fmt, kind)
        if key not in self._jit_cache:
            cfg = self.preset.vae
            mdt = jnp.dtype(self.preset.model.dtype)

            vdt = jnp.dtype(cfg.dtype)
            if kind == "tiny":
                from qwen_image_edit_streamdiffusion_tpu.models import (
                    tiny_vae,
                )

                ecfg = self.tiny_encoder[1]

                def _to_latents(params, img):
                    return tiny_vae.encode(params, ecfg, img)
            else:
                def _to_latents(params, img):
                    return vae_mod.encode(params, cfg, img.astype(vdt))

            @jax.jit
            def run(params, img_u8):
                if in_fmt == "yuv420":
                    x32 = colorspace.yuv420_to_rgb(img_u8)
                else:
                    x32 = img_u8.astype(jnp.float32)
                img = x32 / 127.5 - 1.0
                z = _to_latents(params, img)
                return tfm.pack_latents(z.astype(jnp.float32)).astype(mdt)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _encode_params_for(self, stream_kind: str):
        """Param tree for a stream frame's encode stage: the tiny
        encoder's on temporal frames when active, the full VAE's
        otherwise (keyframes re-anchor conditioning at exact quality)."""
        if (stream_kind == "temporal" and self.config.encoder == "tiny"
                and self.tiny_encoder is not None):
            return self.tiny_encoder[0]
        return self.vae_params

    def load_tiny_encoder(self, path: str) -> None:
        """Load a distilled tiny encoder (training/tiny_vae.py --encoder
        artifact) and switch stream temporal-frame encoding to it
        (config.encoder="tiny")."""
        from qwen_image_edit_streamdiffusion_tpu.models import tiny_vae

        params, ecfg = tiny_vae.load_encoder(path)
        _check_tiny_enc_cfg(ecfg, self.preset.vae, path)
        if self.mesh is not None:
            from qwen_image_edit_streamdiffusion_tpu.parallel import sharding

            params = sharding.replicate(params, self.mesh)
        self.tiny_encoder = (params, ecfg)
        self.config = self.config.replace(encoder="tiny")
        # Encode graphs close over the previous artifact's TinyEncoderConfig
        # (dtype cast) while the cache key carries only (hw, fmt, kind) —
        # drop them so the next dispatch rebuilds against this artifact.
        self._invalidate_jit_cache("vae_encode", "stream_fused",
                                   "stream_fused_rows")

    @property
    def _decode_params(self):
        """Param tree the decode dispatch consumes: the tiny decoder's
        when it is active, the full VAE's otherwise. Call sites pass this
        so the fused/stream graphs stay agnostic to the decoder kind."""
        if self.config.decoder == "tiny" and self.tiny_vae is not None:
            return self.tiny_vae[0]
        return self.vae_params

    def load_tiny_decoder(self, path: str) -> None:
        """Load a distilled tiny decoder (training/tiny_vae.py artifact)
        and switch output decoding to it (config.decoder="tiny")."""
        from qwen_image_edit_streamdiffusion_tpu.models import tiny_vae

        params, tcfg = tiny_vae.load(path)
        _check_tiny_cfg(tcfg, self.preset.vae, path)
        if self.mesh is not None:
            from qwen_image_edit_streamdiffusion_tpu.parallel import sharding

            params = sharding.replicate(params, self.mesh)
        self.tiny_vae = (params, tcfg)
        self.config = self.config.replace(decoder="tiny")
        # Same staleness hazard as load_tiny_encoder, decode side.
        self._invalidate_jit_cache("vae_decode", "stream_fused",
                                   "stream_fused_rows")

    def _invalidate_jit_cache(self, *families: str) -> None:
        """Drop cached jitted graphs whose key family (first tuple element)
        is in ``families`` — used when a closure input that is NOT part of
        the cache key changes (tiny autoencoder artifact swap). Rebuild is
        lazy on next use."""
        for k in [k for k in self._jit_cache
                  if isinstance(k, tuple) and k and k[0] in families]:
            del self._jit_cache[k]

    def _vae_decode_fn(self, hw: Tuple[int, int]):
        """final packed tokens → (pixels, f32 latents), one jit: unpack,
        VAE decode, fused [-1,1]→[0,255] epilogue. Pixels are uint8 HWC
        (¼ the device→host bytes of f32), or YCbCr 4:2:0 planes (half the
        bytes again) when config.transfer_format="yuv420" — fetch them
        with :meth:`_fetch_images`. Latents feed the temporal cache.

        ``params`` must be :attr:`_decode_params` — the full VAE tree, or
        the tiny decoder's when config.decoder="tiny" (encode still runs
        the full VAE either way; only the output stage is approximated)."""
        fmt = self.config.transfer_format
        kind = "full"
        if self.config.decoder == "tiny":
            if self.tiny_vae is None:
                warnings.warn(
                    "config.decoder='tiny' but no tiny decoder is loaded "
                    "(load_tiny_decoder / create with decoder='tiny'); "
                    "falling back to the full VAE decoder")
            else:
                kind = "tiny"
        key = ("vae_decode", hw, fmt, kind)
        if key not in self._jit_cache:
            cfg = self.preset.vae
            zh, zw = hw

            vdt = jnp.dtype(cfg.dtype)
            if kind == "tiny":
                from qwen_image_edit_streamdiffusion_tpu.models import (
                    tiny_vae,
                )

                tcfg = self.tiny_vae[1]

                def _to_pixels(params, z):
                    return tiny_vae.decode(params, tcfg, z)
            else:
                def _to_pixels(params, z):
                    return vae_mod.decode(params, cfg, z.astype(vdt))

            @jax.jit
            def run(params, tokens):
                z = tfm.unpack_latents(tokens.astype(jnp.float32), zh, zw)
                x = _to_pixels(params, z)
                x32 = x.astype(jnp.float32)
                x32 = jnp.clip((x32 * 0.5 + 0.5) * 255.0, 0.0, 255.0)
                if fmt == "yuv420":
                    # rgb_to_yuv420 applies its own +0.5 rounding bias —
                    # feeding it the pre-rounded value would brighten luma
                    # by one code for half of all pixel values
                    return colorspace.rgb_to_yuv420(x32), z
                return jnp.clip(x32 + 0.5, 0.0, 255.0).astype(jnp.uint8), z

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _fetch_images(self, pixels) -> List[Image.Image]:
        """Fetch a decode result to host PIL images (chunk-parallel over
        the tunnel; see runtime/fetch.py) in either transfer format."""
        from qwen_image_edit_streamdiffusion_tpu.runtime.fetch import fetch

        if self.config.transfer_format == "yuv420":
            packed = fetch(pixels)  # (B, H/2, W/2, 6) uint8, one transfer
            return [
                colorspace.yuv420_to_rgb_image(packed[i])
                for i in range(packed.shape[0])
            ]
        arr = fetch(pixels)  # uint8 NHWC
        return [Image.fromarray(arr[i]) for i in range(arr.shape[0])]

    def _noise_fn(self, shape: Tuple[int, ...]):
        """seeded packed-noise tokens in one jitted dispatch."""
        key = ("noise", shape)
        if key not in self._jit_cache:
            mdt = jnp.dtype(self.preset.model.dtype)

            @jax.jit
            def run(rng):
                noise = jax.random.normal(rng, shape, jnp.float32)
                return tfm.pack_latents(noise).astype(mdt)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _denoise_fn(
        self,
        batch: int,
        img_shapes: Tuple[Tuple[int, int, int], ...],
        txt_len: int,
        num_steps: int,
        cfg_mode: str,
        start_step: int = 0,
    ):
        """Build (or fetch) the compiled denoise loop for a shape bucket.

        start_step > 0 runs only the tail of the schedule — the stream
        pipeline's partial re-denoise of a cached temporal latent
        (reference's intended prepare_latent semantics,
        qwen_realtime.py:201-224).

        cfg_mode "rcfg" / "rcfg-self" are StreamDiffusion's Residual CFG
        (the system the reference is inspired by, README.md:186-191):
        "rcfg" computes the uncond branch only on the first executed step
        (peeled out of the fori_loop as one batched pair) and reuses its
        residual v_pos−v_neg afterwards — steps+1 forwards instead of
        2·steps. "rcfg-self" never runs an uncond forward: the virtual
        negative velocity points at reconstructing the first condition
        image, v_neg = (x_t − z_cond)/σ_t (flow-matching translation of
        the paper's virtual residual noise), so guidance pushes away from
        the unedited input at cond-only cost. Requires the first condition
        grid to equal the target grid (checked at bucket build; degrades
        to "rcfg" with a warning)."""
        if cfg_mode == "rcfg-self" and (
            len(img_shapes) < 2 or img_shapes[1] != img_shapes[0]
        ):
            import warnings

            warnings.warn(
                "rcfg-self needs the first condition latent grid "
                f"{img_shapes[1:2]} to match the target grid "
                f"{img_shapes[0]} for the virtual-negative anchor; "
                "using onetime-negative rcfg instead")
            cfg_mode = "rcfg"
        key = ("denoise", batch, img_shapes, txt_len, num_steps, cfg_mode,
               start_step)
        if key in self._jit_cache:
            return self._jit_cache[key]

        model_cfg = self.preset.model
        sched_cfg = self.preset.scheduler
        use_flash = self.config.use_flash_attention
        f, h0, w0 = img_shapes[0]
        l_target = f * h0 * w0
        schedule = sched.make_schedule(num_steps, l_target, sched_cfg)
        ropes = tfm.make_rope(model_cfg, img_shapes, txt_len)

        tp_mesh = self.mesh if (
            self.mesh is not None and "model" in self.mesh.axis_names
            and self.mesh.shape["model"] > 1
        ) else None

        def model_call(params, x, cond_tokens, t, txt, mask):
            inp = jnp.concatenate([x, cond_tokens], axis=1)
            v = tfm.forward(params, model_cfg, inp, txt, t, ropes,
                            txt_mask=mask, use_flash=use_flash, mesh=tp_mesh)
            return v[:, :l_target]

        mesh = self.mesh
        from qwen_image_edit_streamdiffusion_tpu.parallel.sharding import (
            batch_sharding,
            has_axis,
        )

        if cfg_mode == "parallel" and not has_axis(mesh, "cfg"):
            # graceful degrade: parallel CFG without a cfg axis is
            # exactly batched CFG on one device group
            cfg_mode = "batched"

        # Fast-mode row data-parallelism: a cond-only multi-row dispatch
        # (num_images seed variations / dynamic batching) would leave the
        # `cfg` mesh axis — provisioned for parallel CFG — completely idle.
        # Shard the row axis over it instead: N rows cost N/cfg_size
        # model-rows of wall-clock per chip group, the same hardware the
        # 2-GPU reference dedicates to the uncond branch (SURVEY.md §2.4).
        # The Residual-CFG modes are row-independent too (cond-only body;
        # rcfg's peeled pair is 2N rows, still divisible), so guided
        # multi-row traffic shards the same way.
        dp_rows = (cfg_mode in ("none", "rcfg", "rcfg-self") and batch > 1
                   and has_axis(mesh, "cfg")
                   and batch % mesh.shape["cfg"] == 0)

        def _constrain_dp(x):
            if dp_rows:
                return jax.lax.with_sharding_constraint(
                    x, batch_sharding(mesh))
            return x

        def _constrain_cfg_batch(x):
            """Pin the doubled (cond, uncond) batch to the `cfg` mesh axis —
            this is the reference's 2-GPU parallel_cfg_* scheme expressed as
            a sharding annotation (SURVEY.md §2.4)."""
            if cfg_mode == "parallel":
                return jax.lax.with_sharding_constraint(x, batch_sharding(mesh))
            return x

        def loop(params, x0, cond_tokens, txt, mask, neg_txt, neg_mask,
                 cfg_scale):
            sigmas = schedule.sigmas
            timesteps = schedule.timesteps

            if dp_rows:
                x0 = _constrain_dp(x0)
                cond_tokens = _constrain_dp(cond_tokens)
                txt, mask = _constrain_dp(txt), _constrain_dp(mask)

            if cfg_mode in ("rcfg", "rcfg-self"):

                def pos_call(i, x):
                    t = jnp.full((x.shape[0],), timesteps[i], jnp.float32)
                    return model_call(params, _constrain_dp(x), cond_tokens,
                                      t, txt, mask)

                if cfg_mode == "rcfg":
                    # Peeled first step: ONE batched cond+uncond pair
                    # (identical math to the "batched" body), freezing the
                    # negative residual for the remaining steps.
                    i0 = start_step
                    x = x0
                    pair = lambda a, b: _constrain_dp(
                        jnp.concatenate([a, b], axis=0))
                    t2 = jnp.full((2 * x.shape[0],), timesteps[i0],
                                  jnp.float32)
                    v2 = model_call(params, pair(x, x),
                                    pair(cond_tokens, cond_tokens), t2,
                                    pair(txt, neg_txt),
                                    pair(mask, neg_mask))
                    pos, neg = jnp.split(v2, 2, axis=0)
                    delta = pos.astype(jnp.float32) - neg.astype(jnp.float32)
                    v = combine_cfg(pos, neg, cfg_scale)
                    x = sched.euler_step(x, v, sigmas[i0], sigmas[i0 + 1])

                    def body(i, carry):
                        x, delta = carry
                        pos = pos_call(i, x)
                        neg = (pos.astype(jnp.float32) - delta).astype(
                            pos.dtype)
                        v = combine_cfg(pos, neg, cfg_scale)
                        return (sched.euler_step(x, v, sigmas[i],
                                                 sigmas[i + 1]), delta)

                    x, _ = jax.lax.fori_loop(i0 + 1, num_steps, body,
                                             (x, delta))
                    return x

                # rcfg-self: the anchor is the first condition image's
                # packed latents — same grid, same pack order, same latent
                # normalization as x (both flow through tfm.pack_latents).
                anchor = cond_tokens[:, :l_target].astype(jnp.float32)

                def body(i, x):
                    pos = pos_call(i, x)
                    neg = rcfg_self_negative(x, anchor, sigmas[i],
                                             pos.dtype)
                    v = combine_cfg(pos, neg, cfg_scale)
                    return sched.euler_step(x, v, sigmas[i], sigmas[i + 1])

                return jax.lax.fori_loop(start_step, num_steps, body, x0)

            if cfg_mode in ("batched", "parallel"):
                cond2 = _constrain_cfg_batch(
                    jnp.concatenate([cond_tokens, cond_tokens], axis=0))
                txt2 = _constrain_cfg_batch(
                    jnp.concatenate([txt, neg_txt], axis=0))
                mask2 = _constrain_cfg_batch(
                    jnp.concatenate([mask, neg_mask], axis=0))

            def body(i, x):
                t = jnp.full((x.shape[0],), timesteps[i], jnp.float32)
                if cfg_mode == "none":
                    v = model_call(params, _constrain_dp(x), cond_tokens, t,
                                   txt, mask)
                elif cfg_mode == "sequential":
                    pos = model_call(params, x, cond_tokens, t, txt, mask)
                    neg = model_call(params, x, cond_tokens, t, neg_txt, neg_mask)
                    v = combine_cfg(pos, neg, cfg_scale)
                elif cfg_mode in ("batched", "parallel"):
                    x2 = _constrain_cfg_batch(jnp.concatenate([x, x], axis=0))
                    t2 = jnp.concatenate([t, t], axis=0)
                    v2 = model_call(params, x2, cond2, t2, txt2, mask2)
                    pos, neg = jnp.split(v2, 2, axis=0)
                    v = combine_cfg(pos, neg, cfg_scale)
                else:
                    raise ValueError(f"unknown cfg_mode {cfg_mode!r}")
                return sched.euler_step(x, v, sigmas[i], sigmas[i + 1])

            return jax.lax.fori_loop(start_step, num_steps, body, x0)

        run = jax.jit(loop, donate_argnums=(1,))
        self._jit_cache[key] = run
        return run

    # ------------------------------------------------------------------
    # Host-side stages
    # ------------------------------------------------------------------

    def _prepare_images(
        self,
        images: Sequence[Image.Image],
        height: Optional[int],
        width: Optional[int],
    ):
        """Reference sizing rules: output defaults to area-1024² at the
        first image's aspect; VAE condition images area-1024²; VL condition
        images area-384² (SURVEY.md §2.2)."""
        first = images[0]
        cw, ch = imaging.calculate_dimensions(
            self.config.vae_image_area, first.size[0] / first.size[1]
        )
        out_w = width or self.config.width or cw
        out_h = height or self.config.height or ch
        vae_images = []
        vl_images = []
        for img in images:
            vw, vh = imaging.calculate_dimensions(
                self.config.vae_image_area, img.size[0] / img.size[1]
            )
            # uint8 end-to-end: normalization happens inside the encode jit
            vae_images.append(
                np.asarray(imaging.resize(img, vw, vh), dtype=np.uint8)
            )
            lw, lh = imaging.calculate_dimensions(
                self.config.vl_image_area, img.size[0] / img.size[1]
            )
            vl_images.append(
                np.asarray(imaging.resize(img, lw, lh), dtype=np.uint8)
            )
        return out_h, out_w, vae_images, vl_images

    def encode_condition_latents(self, vae_images: List[np.ndarray]):
        """VAE-encode condition images (posterior mode) → packed tokens +
        their (1, h/2, w/2) rope shapes. With transfer_format="yuv420" the
        upload ships 4:2:0 planes (half the tunnel bytes; JPEG inputs were
        4:2:0 on the wire already)."""
        tokens = []
        shapes = []
        yuv = self.config.transfer_format == "yuv420"
        for arr in vae_images:
            hw = arr.shape[:2]
            if yuv:
                x = jnp.asarray(colorspace.pack_yuv420_host(arr))[None]
                enc = self._vae_encode_fn(hw, "yuv420")
            else:
                x = jnp.asarray(arr, jnp.uint8)[None]  # (1, H, W, 3)
                enc = self._vae_encode_fn(hw)
            tokens.append(enc(self.vae_params, x))
            zh, zw = arr.shape[0] // 8, arr.shape[1] // 8
            shapes.append((1, zh // 2, zw // 2))
        if len(tokens) == 1:
            return tokens[0], shapes
        return jnp.concatenate(tokens, axis=1), shapes

    def _encode_prompts(self, requests):
        """Encode a wave of (prompt, vl_images) requests, coalescing VL
        device work (shared vision outputs for identical images, vmapped
        LM groups — models.qwen_vl.encode_many). A CFG edit's pos+neg
        pair and a dynamic batch's items both route through here."""
        if self.prompt_cache is not None:
            return self.prompt_cache.encode_many(requests)
        from qwen_image_edit_streamdiffusion_tpu.models.text_encoder import (
            encode_many,
        )

        return encode_many(self.encoder, requests)

    def _encode_conditions_many(self, waves: List[List[np.ndarray]]):
        """Condition latents for several items' ``vae_images`` lists with
        coalesced VAE-encode dispatches: per-item latent-LRU probe first;
        the remaining (item, image) encodes are deduplicated by content
        hash and batched per resolution — a dynamic-batch wave of K
        cache-miss requests pays ONE VAE-encode dispatch (exact batch
        size: a padded row would cost a full ~80 ms encode, unlike the
        denoise loop's cheap padded rows). Returns one
        (cond_tokens, cond_shapes) per item, identical to
        :meth:`encode_condition_latents` row-for-row."""
        from qwen_image_edit_streamdiffusion_tpu.pipeline.cache import (
            image_fingerprint,
        )

        out: List[Any] = [None] * len(waves)
        misses = []
        for i, imgs in enumerate(waves):
            hit = (self.latent_cache.lookup(imgs)
                   if self.latent_cache is not None else None)
            if hit is not None:
                out[i] = hit
            else:
                misses.append(i)
        if not misses:
            return out

        yuv = self.config.transfer_format == "yuv420"
        uniq: Dict[str, np.ndarray] = {}
        item_fps: Dict[int, List[str]] = {}
        for i in misses:
            fps = []
            for arr in waves[i]:
                fp = image_fingerprint(arr)
                uniq.setdefault(fp, arr)
                fps.append(fp)
            item_fps[i] = fps

        by_hw: Dict[Tuple[int, int], List[str]] = {}
        for fp, arr in uniq.items():
            by_hw.setdefault(tuple(arr.shape[:2]), []).append(fp)
        tok_by_fp: Dict[str, jnp.ndarray] = {}
        for hw, fps in by_hw.items():
            if yuv:
                xs = [colorspace.pack_yuv420_host(uniq[fp]) for fp in fps]
                enc = self._vae_encode_fn(hw, "yuv420")
            else:
                xs = [np.asarray(uniq[fp], np.uint8) for fp in fps]
                enc = self._vae_encode_fn(hw)
            toks = enc(self.vae_params, jnp.asarray(np.stack(xs)))
            for r, fp in enumerate(fps):
                tok_by_fp[fp] = toks[r:r + 1]

        for i in misses:
            toks = [tok_by_fp[fp] for fp in item_fps[i]]
            shapes = [
                (1, (a.shape[0] // 8) // 2, (a.shape[1] // 8) // 2)
                for a in waves[i]
            ]
            val = (toks[0] if len(toks) == 1
                   else jnp.concatenate(toks, axis=1), shapes)
            out[i] = val
            if self.latent_cache is not None:
                self.latent_cache.store(waves[i], val)
        return out

    # ------------------------------------------------------------------
    # Main entry
    # ------------------------------------------------------------------

    def __call__(
        self,
        image: Sequence[Image.Image] | Image.Image,
        prompt: str,
        negative_prompt: Optional[str] = None,
        num_inference_steps: Optional[int] = None,
        guidance_scale: float = 1.0,  # embedded-guidance; no-op (parity arg)
        true_cfg_scale: Optional[float] = None,
        seed: Optional[int] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_images_per_prompt: int = 1,
    ) -> EditResult:
        """num_images_per_prompt: upstream-parity batch arg — N output
        variations of one edit in a SINGLE denoise dispatch (per-row
        noise, shared conditioning). On TPU this amortizes the fixed
        per-request costs (VL prompt encode, condition VAE encode, one
        tunnel round-trip + fetch) across N images; all CFG modes compose
        (batched CFG runs 2N rows). Routed through :meth:`edit_many` so
        the rows share its {1,2,4,8,16} graph buckets — N=3/5/6/7 must
        not each compile a distinct multi-minute denoise graph."""
        t_start = time.time()
        images = [image] if isinstance(image, Image.Image) else list(image)
        n_out = max(1, int(num_images_per_prompt))
        if n_out > 1:
            return self.edit_many(
                [{"image": images, "prompt": prompt,
                  "negative_prompt": negative_prompt, "seed": seed,
                  "num_images": n_out, "height": height, "width": width}],
                num_inference_steps=num_inference_steps,
                true_cfg_scale=true_cfg_scale,
            )[0]
        steps = num_inference_steps or self.config.num_inference_steps
        cfg_scale = (true_cfg_scale if true_cfg_scale is not None
                     else self.config.true_cfg_scale)
        seed = self.config.seed if seed is None else seed

        # do_true_cfg semantics match the upstream pipeline: a negative
        # prompt must be given AND the scale must exceed 1.
        do_cfg = negative_prompt is not None and cfg_scale > 1.0
        cfg_mode = self.config.cfg_mode if do_cfg else "none"

        out_h, out_w, vae_images, vl_images = self._prepare_images(
            images, height, width
        )

        # Prompt conditioning (the VL encoder sees text + images). Cached on
        # (prompt, image-hash) — cached_pipeline_v2 semantics (SURVEY.md §0.1).
        # A CFG edit encodes pos+neg as ONE wave: the vision tower runs once
        # over the shared condition images and the two LM forwards batch.
        if do_cfg:
            emb, neg = self._encode_prompts(
                [(prompt, vl_images), (negative_prompt, vl_images)]
            )
        else:
            emb = self._encode_prompts([(prompt, vl_images)])[0]
        txt = jnp.asarray(emb.embeds, jnp.dtype(self.preset.model.dtype))[None]
        mask = jnp.asarray(emb.mask)[None]
        if do_cfg:
            neg_txt = jnp.asarray(
                neg.embeds, jnp.dtype(self.preset.model.dtype)
            )[None]
            neg_mask = jnp.asarray(neg.mask)[None]
            # pos/neg may land in different txt-length buckets (prompt text
            # lengths differ); pad the shorter so CFG modes can stack them.
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

        # Condition latents from the input image(s), cached on content hash.
        if self.latent_cache is not None:
            cond_tokens, cond_shapes = self.latent_cache.get_or_encode(
                vae_images, self.encode_condition_latents
            )
        else:
            cond_tokens, cond_shapes = self.encode_condition_latents(vae_images)

        # Initial noise for the target image (seeded — reference pins 42).
        zh, zw = out_h // 8, out_w // 8
        x0 = self._noise_fn((1, zh, zw, self.preset.vae.latent_channels))(
            stream(key_from_seed(seed), "latents")
        )

        img_shapes = tuple([(1, zh // 2, zw // 2)] + cond_shapes)
        run = self._denoise_fn(
            batch=1,
            img_shapes=img_shapes,
            txt_len=txt.shape[1],
            num_steps=steps,
            cfg_mode=cfg_mode,
        )
        final_tokens = run(
            self.tfm_params, x0, cond_tokens, txt, mask, neg_txt, neg_mask,
            jnp.float32(cfg_scale),
        )

        pixels, latents = self._vae_decode_fn((zh, zw))(
            self._decode_params, final_tokens
        )
        out_images = self._fetch_images(pixels)
        return EditResult(
            images=out_images, latents=latents, elapsed=time.time() - t_start
        )

    def edit_many(
        self,
        items: Sequence[Dict[str, Any]],
        num_inference_steps: Optional[int] = None,
        true_cfg_scale: Optional[float] = None,
    ) -> List[EditResult]:
        """Serve several compatible edit requests in ONE denoise dispatch
        (cross-request continuous batching — a serving capability the
        reference's single-flight design rejects outright with HTTP 429,
        reference server.py:190-194). Per-row conditioning: each item
        carries its own prompt embeddings, condition latents and seeded
        noise; only the compiled graph is shared, so results match the
        item's individual :meth:`__call__` row-for-row.

        Items are dicts with ``image`` (PIL or [PIL...]), ``prompt``, and
        optional ``negative_prompt``/``seed``/``num_images``/``height``/
        ``width``. All items must share output size, condition-image
        geometry and CFG-ness (the engine groups requests by this key
        before calling); steps and cfg scale are shared arguments. Total
        rows are padded up to a {1, 2, 4, 8, 16} bucket — padded rows cost
        denoise FLOPs only, never decode work or tunnel bytes — so the
        compiled-graph set stays bounded."""
        t_start = time.time()
        steps = num_inference_steps or self.config.num_inference_steps
        cfg_scale = (true_cfg_scale if true_cfg_scale is not None
                     else self.config.true_cfg_scale)
        mdt = jnp.dtype(self.preset.model.dtype)

        # Pass 1 (host): preprocess + gather the wave's encode requests.
        metas = []
        enc_reqs: List[Tuple[str, List[np.ndarray]]] = []
        for it in items:
            image = it["image"]
            images = ([image] if isinstance(image, Image.Image)
                      else list(image))
            negative_prompt = it.get("negative_prompt")
            do_cfg = negative_prompt is not None and cfg_scale > 1.0
            out_h, out_w, vae_images, vl_images = self._prepare_images(
                images, it.get("height"), it.get("width"))
            pos_i = len(enc_reqs)
            enc_reqs.append((it["prompt"], vl_images))
            neg_i = None
            if do_cfg:
                neg_i = len(enc_reqs)
                enc_reqs.append((negative_prompt, vl_images))
            metas.append((it, do_cfg, out_h, out_w, vae_images,
                          pos_i, neg_i))

        # Pass 2 (device, coalesced): ONE VL-encode wave for every item's
        # pos (and neg) prompt — shared vision-tower outputs + vmapped LM
        # groups instead of 2K serial encodes — and ONE batched VAE encode
        # per resolution for the latent-cache misses. At the 20B preset
        # these per-item encodes are the serialized leader cost that
        # erased dynamic batching's throughput win (CLAUDE.md r3 notes).
        embs = self._encode_prompts(enc_reqs)
        conds = self._encode_conditions_many([m[4] for m in metas])

        # Pass 3 (host): assemble per-item rows + geometry check.
        prepped = []
        geom = None
        for (it, do_cfg, out_h, out_w, _vae, pos_i, neg_i), cond in zip(
                metas, conds):
            cond_tokens, cond_shapes = cond
            emb = embs[pos_i]
            txt = jnp.asarray(emb.embeds, mdt)[None]
            mask = jnp.asarray(emb.mask)[None]
            if do_cfg:
                neg = embs[neg_i]
                neg_txt = jnp.asarray(neg.embeds, mdt)[None]
                neg_mask = jnp.asarray(neg.mask)[None]
            else:
                neg_txt, neg_mask = txt, mask
            g = (out_h, out_w, tuple(cond_shapes), do_cfg)
            if geom is None:
                geom = g
            elif g != geom:
                raise ValueError(
                    "edit_many items must share output size, condition "
                    f"geometry and CFG-ness: {g} != {geom}")
            n_i = max(1, int(it.get("num_images", 1)))
            prepped.append((txt, mask, neg_txt, neg_mask, cond_tokens,
                            it.get("seed"), n_i))

        out_h, out_w, cond_shapes, do_cfg = geom
        cfg_mode = self.config.cfg_mode if do_cfg else "none"
        zh, zw = out_h // 8, out_w // 8

        # One shared txt bucket across the batch. Lengths are already
        # 128-bucketed by the encoder, so the max is itself a bucket
        # length and the denoise graph is shared with single-request
        # traffic at the same row count.
        txt_len = max(max(p[0].shape[1], p[2].shape[1]) for p in prepped)

        def _pad(a, fill=0):
            if a.shape[1] == txt_len:
                return a
            pad = [(0, 0), (0, txt_len - a.shape[1])] + [
                (0, 0)
            ] * (a.ndim - 2)
            return jnp.pad(a, pad, constant_values=fill)

        rows = {k: [] for k in ("x0", "cond", "txt", "mask", "ntxt",
                                "nmask")}
        for txt, mask, neg_txt, neg_mask, cond_tokens, seed, n_i in prepped:
            seed = self.config.seed if seed is None else seed
            x0 = self._noise_fn(
                (n_i, zh, zw, self.preset.vae.latent_channels)
            )(stream(key_from_seed(seed), "latents"))
            rows["x0"].append(x0)

            def tile(a):
                return jnp.tile(a, (n_i,) + (1,) * (a.ndim - 1))

            rows["cond"].append(tile(cond_tokens))
            rows["txt"].append(tile(_pad(txt)))
            rows["mask"].append(tile(_pad(mask, False)))
            rows["ntxt"].append(tile(_pad(neg_txt)))
            rows["nmask"].append(tile(_pad(neg_mask, False)))

        cat = {k: jnp.concatenate(v, axis=0) if len(v) > 1 else v[0]
               for k, v in rows.items()}
        r_real = cat["x0"].shape[0]
        r_bucket = next((b for b in (1, 2, 4, 8, 16) if b >= r_real),
                        r_real)
        if r_bucket != r_real:
            reps = r_bucket - r_real
            cat = {k: jnp.concatenate([v] + [v[-1:]] * reps, axis=0)
                   for k, v in cat.items()}

        img_shapes = tuple([(1, zh // 2, zw // 2)] + list(cond_shapes))
        run = self._denoise_fn(
            batch=r_bucket, img_shapes=img_shapes, txt_len=txt_len,
            num_steps=steps, cfg_mode=cfg_mode,
        )
        final = run(self.tfm_params, cat["x0"], cat["cond"], cat["txt"],
                    cat["mask"], cat["ntxt"], cat["nmask"],
                    jnp.float32(cfg_scale))
        final = final[:r_real]
        pixels, latents = self._vae_decode_fn((zh, zw))(
            self._decode_params, final
        )
        out_images = self._fetch_images(pixels)

        results = []
        row = 0
        elapsed = time.time() - t_start
        for (_, _, _, _, _, _, n_i) in prepped:
            results.append(EditResult(
                images=out_images[row:row + n_i],
                latents=latents[row:row + n_i],
                elapsed=elapsed,
            ))
            row += n_i
        return results

    # ------------------------------------------------------------------

    def warmup(self, height: Optional[int] = None, width: Optional[int] = None,
               steps: Optional[int] = None, runs: int = 1,
               cfg: bool = False) -> float:
        """AOT-compile the standard bucket (reference warms up with a gray
        512² image, server.py:83-95). cfg=True additionally compiles the
        true-CFG variant of the same bucket (config.cfg_mode) — on GPU a
        new configuration costs ~0, here a cold compile costs minutes, so
        a server that will see use_cfg=true requests must warm it
        (SURVEY.md §7.1 item 4, VERDICT r2 next #3)."""
        h = height or self.config.height or 512
        w = width or self.config.width or 512
        dummy = imaging.make_test_image(w, h, "gray")
        t0 = time.time()
        n_steps = steps or self.config.num_inference_steps
        # Warm with the serving default prompt so the VL encoder's
        # length-bucketed graphs match what real requests dispatch (a
        # different bucket = a multi-second LM compile on request #1).
        prompt = "Transform into oil painting style"
        for _ in range(max(1, runs)):
            self(dummy, prompt, num_inference_steps=n_steps)
        if cfg:
            # the server's use_cfg convention: empty negative prompt
            # (engine.edit, reference server.py:135-153)
            self(dummy, prompt, negative_prompt="",
                 num_inference_steps=n_steps)
            # settle: the tunnel's first transfer after a compile burst is
            # reliably degraded (see bench.py) — absorb it here so the
            # first real request doesn't pay it
            self(dummy, prompt, num_inference_steps=n_steps)
        return time.time() - t0
