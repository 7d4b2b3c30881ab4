"""Abstract AOT check of the FULL 20B preset, tensor-parallel.

Lowers + compiles (no execution, no weight materialization — pure
ShapeDtypeStructs) one denoise model call of the `qwen-image-edit-2509`
preset over an (cfg × model) mesh, verifying that the megatron sharding
rules partition every block tensor and that XLA accepts the SPMD program
at real scale — the thing a single dev box cannot run for lack of 40 GB
of HBM.

Two targets, best-first:

1. **TPU topology AOT** (default when libtpu is present): compiles the
   REAL serving program — shard_mapped Pallas flash attention included —
   against a `v5e:2x4` TopologyDescription, no chips needed. Measured:
   10.79 GB/chip for one model call (10.24 params + 0.55 temps) → the 20B
   bf16 preset FITS a v5e-8 with flash attention; the XLA-attention
   fallback materializes ~17 GB of score temps and would not.
2. **CPU virtual-device lowering** (fallback): same sharding rules,
   `use_flash=False` (Pallas doesn't lower on CPU), which overstates
   temp memory by the materialized attention scores.

Flags:
  --loop      compile the FULL serving executable (2-step parallel-CFG
              denoise fori_loop): 11.96 GB/chip on v5e-8.
  --vl        also AOT the 7B Qwen2.5-VL encoder graphs TP-sharded (and
              the replicated VAE at 1024²); with --loop prints the
              COMBINED per-chip deployment budget — transformer shard +
              VL shard + VAE + peak phase temps vs the 16 GB HBM.
  --int8      quantize transformer block linears first; with --v5e-4 the
              loop fits HALF the chips (10.88 GB/chip on a 2×2 v5e-4).
  --int8-vl   weight-only int8 for the VL encoder (halves its shard).
  --int4 / --int4-vl  group-wise int4 rung (the reference's NF4 analog,
              test_quantized.py:46-51): with --chips 2 the COMPLETE
              product (transformer + VL + VAE) FITS a 2-chip v5e slice
              at 13.21 GB/chip (loop 5.80 args + 4.73 temps, VL 2.60,
              VAE 0.07). Requires the optimization_barrier in
              int4_linear — without it XLA prefetches every block's
              dequantized bf16 weight (11 GB of coexisting temps).
  --chips N   target an N-chip topology (1, 2, 4, or 8; sub-host slices
              use explicit chips_per_host_bounds). N<4 has no cfg axis —
              the loop compiles batched CFG instead of parallel. Without
              --loop/--vl the bare 1024² model call is AOT-checked, and
              quantization flags apply to it too: `--int4 --chips 1`
              proves the 20B int4 model call fits ONE v5e chip at
              12.81 GB (11.52 weights + 1.29 temps) — the single-chip
              floor; full serving still needs ≥2 chips for VL + loop
              temps.
  --cfg-mode M  override the loop's CFG execution mode. Measured on the
              int4 2-chip slice: "rcfg-self" compiles to 13.18 GB/chip
              (loop temps 4.70 — within noise of batched CFG's 13.21:
              at int4 the loop temps are dequant-sequencing temps, not
              the cond+uncond pair), so Residual CFG buys forward count
              (speed), not memory.
  --stream    AOT the realtime pipeline's fused temporal frame graph
              (VAE encode → re-noise → tail denoise → decode, ONE
              dispatch) at 1024² with batched CFG: 14.32 GB/chip on
              v5e-8 — the realtime product deploys at 20B scale too.
              --tiny-decoder swaps the output stage for the TAESD
              analog (models/tiny_vae.py): 14.28 GB/chip, near-identical
              budget — decode temps were never the stream peak; the
              tiny decoder buys device TIME, not memory. --tiny-encoder
              swaps the temporal frames' ENCODE stage for the TAESD
              pair's other half; --int8 AOTs the quantized stream rung
              (the fallback for the thin bf16 headroom, DEPLOY.md §1).
  --v5e-4     target a 4-chip topology instead of 8.
  --train     AOT the FULL 20B LoRA fine-tune step (value_and_grad through
              all 60 blocks + Adam, per-block remat with in-remat adapter
              fusion, flash-attention custom VJP, rows DP over `cfg`):
              args 10.80 + temps 3.55 + out 0.35 = **14.71 GB/chip FITS
              v5e-8** — the 20B model fine-tunes on the pod it serves
              from. --rank N sets the adapter rank (default 16; adapters
              189 MB + Adam state 378 MB replicated f32), --rows the
              train batch rows (default 2, DP over the cfg axis).
  QIE_AOT_SAVE=<path> additionally serializes the compiled executable
              (~212 MB) — ship to the pod and deserialize_and_load to
              skip the multi-minute serving cold-start compile.

  python -m qwen_image_edit_streamdiffusion_tpu.benchmarks.lower_full \
      [--loop] [--int8] [--v5e-4]
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qwen_image_edit_streamdiffusion_tpu.core import meshes
from qwen_image_edit_streamdiffusion_tpu.core.config import get_preset
from qwen_image_edit_streamdiffusion_tpu.models import transformer as tfm
from qwen_image_edit_streamdiffusion_tpu.models.common import param_count
from qwen_image_edit_streamdiffusion_tpu.parallel import sharding


# n_devices → (topology name, chips_per_host_bounds, cfg-axis size).
# Sub-host slices (1-2 chips) need explicit chip bounds — the default
# host bounds are 2x2x1 and reject smaller layouts.
_TOPOLOGIES = {
    1: ("v5e:1x1", (1, 1, 1), 1),
    2: ("v5e:1x2", (1, 2, 1), 1),
    4: ("v5e:2x2", None, 2),
    8: ("v5e:2x4", None, 2),
}


def _tpu_topology_mesh(n_devices: int):
    """(mesh, True) for a v5e AOT topology, or (None, False) if libtpu
    can't build one here."""
    name, bounds, cfg = _TOPOLOGIES[n_devices]
    try:
        from jax.experimental import topologies

        kw = {"chips_per_host_bounds": bounds} if bounds else {}
        topo = topologies.get_topology_desc(
            platform="tpu", topology_name=name, **kw)
        devs = np.asarray(topo.devices).reshape(cfg, n_devices // cfg)
        return Mesh(devs, ("cfg", "model")), True
    except Exception as e:  # no libtpu / unknown topology
        print(f"TPU topology unavailable ({type(e).__name__}); "
              "falling back to CPU virtual devices (use_flash=False)")
        return None, False


def _per_chip_param_bytes(shapes, specs, mesh) -> int:
    """Exact per-device parameter bytes for a sharded tree (shard_shape
    includes GSPMD's padding rounding)."""
    leaves_s = jax.tree_util.tree_leaves(shapes)
    leaves_p = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P))
    total = 0
    for s, p in zip(leaves_s, leaves_p):
        shard = NamedSharding(mesh, p).shard_shape(s.shape)
        total += int(np.prod(shard)) * s.dtype.itemsize
    return total


def lower_vl(mesh, is_tpu: bool, vl_bits: int = 0):
    """AOT-compile the Qwen2.5-VL encoder graphs (vision tower at the 384²
    VL-condition grid + LM decoder at a bucketed L=512 prompt) with the
    megatron VL sharding rules on the same topology, and return the
    per-chip budget {params, temps} in bytes (VERDICT r2 next #1: the 7B
    encoder must provably fit NEXT TO the transformer shard).

    The encoder runs once per request before the denoise loop, so its
    temps never coexist with loop temps — the combined peak is
    resident-params + max(phase temps)."""
    from qwen_image_edit_streamdiffusion_tpu.models import qwen_vl
    from qwen_image_edit_streamdiffusion_tpu.parallel import sharding as shd

    preset = get_preset("qwen-image-edit-2509")
    vlcfg = preset.vl

    shapes = jax.eval_shape(
        lambda: qwen_vl._init_all(jax.random.PRNGKey(0), vlcfg))
    n_params = param_count(shapes)  # true count, before nibble-packing
    if vl_bits:
        from qwen_image_edit_streamdiffusion_tpu.models.quantize import (
            quantize_vl,
        )

        shapes = jax.eval_shape(lambda p: quantize_vl(p, bits=vl_bits),
                                shapes)
    axes = shd._vl_axes(mesh)
    specs = shd.vl_param_specs(shapes, axes=axes,
                               axis_sizes=dict(mesh.shape))
    pbytes = _per_chip_param_bytes(shapes, specs, mesh)
    print(f"VL encoder: {n_params / 1e9:.2f}B params"
          f"{f' (int{vl_bits})' if vl_bits else ''}, sharded over {axes} "
          f"→ {pbytes / 1e9:.2f} GB/chip")

    abs_params = jax.tree_util.tree_map(
        lambda s, p: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, p)),
        shapes, specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    rep = NamedSharding(mesh, P())
    abs_ = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt, sharding=rep)
    dt = jnp.dtype(vlcfg.dtype)
    temps = 0

    # vision tower at the 392×392 smart-resized VL condition image
    gh = gw = 28
    patch_in = 3 * vlcfg.temporal_patch_size * vlcfg.patch_size ** 2
    vfn = jax.jit(lambda p, x: qwen_vl.vision_forward(p, vlcfg, x, gh, gw))
    t0 = time.time()
    compiled = vfn.lower(
        abs_params["vision"], abs_((gh * gw, patch_in), dt)).compile()
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"  vision graph ({gh}x{gw} grid): temps "
              f"{mem.temp_size_in_bytes / 1e9:.2f} GB "
              f"({time.time() - t0:.1f}s)")
        temps = max(temps, mem.temp_size_in_bytes)

    # LM decoder at a bucketed serving prompt length (template + ~196
    # merged vision tokens + instruction → L=512 bucket). On the TPU
    # topology this compiles the REAL serving path: the causal flash
    # kernel shard_mapped over local head slices (r4 — 28q/4kv heads
    # tile the 4-way model axis; a bare pallas_call would be replicated,
    # which is why r3 compiled XLA attention here and the serving
    # encoder used to force use_flash=False).
    l = 512
    hd = vlcfg.hidden_size // vlcfg.num_heads
    lfn = jax.jit(lambda p, e, c, s, m: qwen_vl.lm_forward(
        p, vlcfg, e, c, s, m, use_flash=is_tpu,
        mesh=mesh if is_tpu else None))
    t0 = time.time()
    compiled = lfn.lower(
        abs_params["lm"], abs_((l, vlcfg.hidden_size), dt),
        abs_((l, hd), jnp.float32), abs_((l, hd), jnp.float32),
        abs_((l,), jnp.bool_)).compile()
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"  LM graph (L={l}): temps "
              f"{mem.temp_size_in_bytes / 1e9:.2f} GB "
              f"({time.time() - t0:.1f}s)")
        temps = max(temps, mem.temp_size_in_bytes)
    print("OK: 7B VL encoder compiles TP-sharded on the topology")
    return {"params": pbytes, "temps": temps}


def lower_vae(mesh, rows: int = 1):
    """AOT the replicated VAE encode+decode at the 1024² serving bucket;
    returns per-chip {params, temps} bytes. rows>1 budgets the decode at
    the dynamic-batching dispatch width (edit_many decodes all real rows
    in one jit — decode temps scale with rows; encode stays batch 1, one
    condition image per item).

    The Pallas small-C conv kernel is disabled for this lowering: a Mosaic
    custom call inside a multi-device GSPMD jit cannot be auto-partitioned
    even when fully replicated — single-chip serving keeps the kernel; the
    pod VAE runs XLA convs (same math, ~1.3× slower decode)."""
    import os

    from qwen_image_edit_streamdiffusion_tpu.models import vae as vae_mod

    prior_conv_env = os.environ.get("QIE_PALLAS_CONV")
    os.environ["QIE_PALLAS_CONV"] = "0"

    preset = get_preset("qwen-image-edit-2509")
    vcfg = preset.vae
    shapes = jax.eval_shape(
        lambda: vae_mod.init(jax.random.PRNGKey(0), vcfg))
    pbytes = sum(int(np.prod(s.shape)) * s.dtype.itemsize
                 for s in jax.tree_util.tree_leaves(shapes))
    rep = NamedSharding(mesh, P())
    abs_params = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep),
        shapes)
    dt = jnp.dtype(vcfg.dtype)
    temps = 0
    for name, fn, arg in (
        ("encode", lambda p, x: vae_mod.encode(p, vcfg, x),
         jax.ShapeDtypeStruct((1, 1024, 1024, 3), dt, sharding=rep)),
        ("decode", lambda p, z: vae_mod.decode(p, vcfg, z),
         jax.ShapeDtypeStruct((rows, 128, 128, vcfg.latent_channels), dt,
                              sharding=rep)),
    ):
        t0 = time.time()
        mem = jax.jit(fn).lower(abs_params, arg).compile().memory_analysis()
        if mem is not None:
            tag = f" ×{rows} rows" if name == "decode" and rows > 1 else ""
            print(f"  VAE {name} @1024²{tag}: temps "
                  f"{mem.temp_size_in_bytes / 1e9:.2f} GB "
                  f"({time.time() - t0:.1f}s)")
            temps = max(temps, mem.temp_size_in_bytes)
    if prior_conv_env is None:
        del os.environ["QIE_PALLAS_CONV"]
    else:
        os.environ["QIE_PALLAS_CONV"] = prior_conv_env
    print(f"VAE params (replicated): {pbytes / 1e9:.2f} GB/chip")
    return {"params": pbytes, "temps": temps}


def lower_serving_loop(mesh, is_tpu: bool, bits: int = 0,
                       cfg_mode: str | None = None, rows: int = 1):
    """AOT-compile the ACTUAL serving executable — the full 2-step
    CFG denoise `lax.fori_loop` the jitted pipeline runs per request —
    for the 20B preset on the v5e topology. bits=8 quantizes the block
    linears (the memory option that fits HALF the chips: v5e-4 instead
    of v5e-8); bits=4 is the group-wise int4 rung (~9/16 the int8 bytes)
    targeting 2-chip deployment. CFG runs parallel over the `cfg` mesh
    axis when it exists (≥4 chips), batched otherwise; pass cfg_mode to
    override (e.g. "rcfg-self" — Residual CFG at cond-only forward
    count; measured 13.18 vs 13.21 GB/chip on the int4 2-chip slice, so
    it buys speed, not memory). rows>1 budgets the cross-request
    dynamic-batching dispatch (engine --dynamic-batch: several requests'
    rows in one denoise loop) — activation temps scale with rows, params
    don't."""
    from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
    from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
        EditPipeline,
    )

    if cfg_mode is None:
        cfg_mode = "parallel" if mesh.shape.get("cfg", 1) > 1 else "batched"
    preset = get_preset("qwen-image-edit-2509")
    cfg = preset.model
    config = StreamConfig(model_preset=preset.name, cfg_mode=cfg_mode,
                          use_flash_attention=is_tpu, fuse_qkv=False,
                          use_int8=bits == 8)
    # abstract pipeline: _denoise_fn reads only preset/config/mesh; params
    # flow in as (abstract) arguments
    pipe = EditPipeline(preset=preset, config=config, tfm_params=None,
                        vae_params=None, encoder=None, mesh=mesh)

    img_shapes = ((1, 64, 64), (1, 64, 64))  # 1024² target + 1024² cond
    txt_len = 256
    steps = 2
    fn = pipe._denoise_fn(rows, img_shapes, txt_len, steps, cfg_mode)

    shapes = jax.eval_shape(lambda: tfm.init(jax.random.PRNGKey(0), cfg))
    if bits:
        from qwen_image_edit_streamdiffusion_tpu.models.quantize import (
            quantize_transformer,
        )

        shapes = jax.eval_shape(
            lambda p: quantize_transformer(p, bits=bits), shapes)
    specs = sharding.transformer_param_specs(shapes)
    params_abs = jax.tree_util.tree_map(
        lambda s, p: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, p)),
        shapes, specs,
    )
    f, h0, w0 = img_shapes[0]
    l_target = f * h0 * w0
    l_cond = sum(ff * hh * ww for ff, hh, ww in img_shapes[1:])
    rep = NamedSharding(mesh, P())
    abs_ = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt, sharding=rep)
    args = (
        params_abs,
        abs_((rows, l_target, cfg.in_channels), jnp.bfloat16),  # x0
        abs_((rows, l_cond, cfg.in_channels), jnp.bfloat16),    # cond tokens
        abs_((rows, txt_len, cfg.joint_dim), jnp.bfloat16),     # txt
        abs_((rows, txt_len), jnp.bool_),                       # mask
        abs_((rows, txt_len, cfg.joint_dim), jnp.bfloat16),     # neg txt
        abs_((rows, txt_len), jnp.bool_),                       # neg mask
        abs_((), jnp.float32),                                  # cfg scale
    )
    t0 = time.time()
    lowered = fn.lower(*args)
    print(f"serving loop ({steps}-step {cfg_mode}-CFG"
          f"{f', int{bits}' if bits else ''}"
          f"{f', {rows} batched rows' if rows > 1 else ''}) lowered in "
          f"{time.time() - t0:.1f}s")
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compiled in {time.time() - t0:.1f}s")
    save = os.environ.get("QIE_AOT_SAVE")
    if save:
        # deployment artifact: ship the pre-compiled executable to the pod
        # and skip the multi-minute compile at serving cold-start
        # (jax.experimental.serialize_executable.deserialize_and_load on
        # the target restores it)
        from jax.experimental import serialize_executable as se

        t0 = time.time()
        payload, _, _ = se.serialize(compiled)
        with open(save, "wb") as f_out:
            f_out.write(payload)
        print(f"serialized executable → {save} "
              f"({len(payload) / 1e6:.1f} MB, {time.time() - t0:.1f}s)")
    mem = compiled.memory_analysis()
    result = None
    if mem is not None:
        total = (mem.argument_size_in_bytes + mem.temp_size_in_bytes
                 + mem.output_size_in_bytes)
        print(f"per-device: args {mem.argument_size_in_bytes / 1e9:.2f} GB "
              f"+ temps {mem.temp_size_in_bytes / 1e9:.2f} GB = "
              f"{total / 1e9:.2f} GB "
              f"({'fits' if total < 16e9 else 'EXCEEDS'} one v5e's 16 GB)")
        result = {"params": mem.argument_size_in_bytes,
                  "temps": mem.temp_size_in_bytes
                  + mem.output_size_in_bytes}
    print("OK: full 20B serving denoise loop compiles TP+CFG-sharded")
    return result


def lower_stream(mesh, is_tpu: bool, tiny_decoder: bool = False,
                 bits: int = 0, tiny_encoder: bool = False):
    """AOT the realtime stream's fused TEMPORAL frame graph — VAE encode →
    re-noise → tail denoise → VAE decode in ONE executable — for the 20B
    preset at 1024², TP + batched-CFG on the topology.

    This is the flagship answer to 1024² realtime (single-chip measures
    2.1 fps, transfer- and model-bound): the model call is TP-sharded
    4-way here, and the whole frame is one dispatch. Proves the realtime
    product (not just /edit) deploys at full scale. tiny_decoder=True
    swaps the output stage for the TAESD-analog (models/tiny_vae.py) —
    the encode side still runs the full VAE unless tiny_encoder=True
    (the TAESD pair's other half: temporal frames encode through
    models/tiny_vae.TinyEncoderConfig). bits=8/4 AOTs the quantized
    transformer rung — the documented fallback when the bf16 stream's
    headroom proves too thin on real hardware (DEPLOY.md §1)."""
    from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
    from qwen_image_edit_streamdiffusion_tpu.models import tiny_vae as tv
    from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
        EditPipeline,
    )
    from qwen_image_edit_streamdiffusion_tpu.pipeline.stream import (
        RealtimePipeline,
    )

    prior_conv_env = os.environ.get("QIE_PALLAS_CONV")
    os.environ["QIE_PALLAS_CONV"] = "0"  # Mosaic can't auto-partition

    preset = get_preset("qwen-image-edit-2509")
    cfg = preset.model
    config = StreamConfig(model_preset=preset.name, cfg_mode="batched",
                          width=1024, height=1024,
                          use_flash_attention=is_tpu, fuse_qkv=False,
                          transfer_format="yuv420",
                          use_int8=(bits == 8), use_int4=(bits == 4),
                          decoder="tiny" if tiny_decoder else "full",
                          encoder="tiny" if tiny_encoder else "full")
    tcfg = tv.TinyDecoderConfig.from_vae(preset.vae)
    ecfg = tv.TinyEncoderConfig.from_vae(preset.vae)
    pipe = EditPipeline(preset=preset, config=config, tfm_params=None,
                        vae_params=None, encoder=None, mesh=mesh,
                        tiny_vae=(None, tcfg) if tiny_decoder else None,
                        tiny_encoder=(None, ecfg) if tiny_encoder else None)
    rt = RealtimePipeline(pipe=pipe)

    zh = zw = 128  # 1024² → 128² latents → 64² patches
    steps = 2
    fn = rt._fused_frame_fn(
        "temporal", hw_in=(1024, 1024), zh=zh, zw=zw,
        cond_shapes=[(1, zh // 2, zw // 2)], txt_len=256, steps=steps,
        start=steps // 2, use_cfg=True,
    )

    shapes = jax.eval_shape(lambda: tfm.init(jax.random.PRNGKey(0), cfg))
    if bits:
        from qwen_image_edit_streamdiffusion_tpu.models.quantize import (
            quantize_transformer,
        )

        shapes = jax.eval_shape(
            lambda p: quantize_transformer(p, bits=bits), shapes)
    specs = sharding.transformer_param_specs(shapes)
    tfm_abs = jax.tree_util.tree_map(
        lambda s, p: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, p)),
        shapes, specs,
    )
    from qwen_image_edit_streamdiffusion_tpu.models import vae as vae_mod

    rep = NamedSharding(mesh, P())
    vae_abs = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep),
        jax.eval_shape(lambda: vae_mod.init(jax.random.PRNGKey(1),
                                            preset.vae)),
    )
    abs_ = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt, sharding=rep)
    if tiny_decoder:
        dec_abs = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep),
            jax.eval_shape(lambda: tv.init(jax.random.PRNGKey(2), tcfg)),
        )
    else:
        dec_abs = vae_abs
    if tiny_encoder:
        enc_abs = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep),
            jax.eval_shape(lambda: tv.encoder_init(jax.random.PRNGKey(3),
                                                   ecfg)),
        )
    else:
        enc_abs = vae_abs
    key_dtype = jax.eval_shape(lambda: jax.random.PRNGKey(0)).dtype
    args = (
        tfm_abs, enc_abs, dec_abs,
        abs_((1, 512, 512, 6), jnp.uint8),              # yuv420 frame
        abs_((1, zh, zw, preset.vae.latent_channels), jnp.float32),  # prev
        abs_((2,) if key_dtype == jnp.uint32 else (), key_dtype),    # rng
        abs_((), jnp.float32),                          # noise_strength
        abs_((1, 256, cfg.joint_dim), jnp.bfloat16),    # txt
        abs_((1, 256), jnp.bool_),                      # mask
        abs_((1, 256, cfg.joint_dim), jnp.bfloat16),    # neg txt
        abs_((1, 256), jnp.bool_),                      # neg mask
        abs_((), jnp.float32),                          # cfg scale
    )
    t0 = time.time()
    compiled = fn.lower(*args).compile()
    dec_kind = "tiny decoder" if tiny_decoder else "full decoder"
    if tiny_encoder:
        dec_kind = "tiny encoder, " + dec_kind
    rung = f"int{bits} " if bits else ""
    print(f"fused temporal stream frame (1024², tail {steps // 2} of "
          f"{steps} steps, batched CFG, {rung}{dec_kind}) compiled in "
          f"{time.time() - t0:.1f}s")
    mem = compiled.memory_analysis()
    if prior_conv_env is None:
        del os.environ["QIE_PALLAS_CONV"]
    else:
        os.environ["QIE_PALLAS_CONV"] = prior_conv_env
    if mem is not None:
        total = (mem.argument_size_in_bytes + mem.temp_size_in_bytes
                 + mem.output_size_in_bytes)
        print(f"per-device: args {mem.argument_size_in_bytes / 1e9:.2f} GB "
              f"+ temps {mem.temp_size_in_bytes / 1e9:.2f} GB = "
              f"{total / 1e9:.2f} GB "
              f"({'fits' if total < 16e9 else 'EXCEEDS'} one v5e's 16 GB)")
    print("OK: 20B fused realtime frame graph compiles TP-sharded")


def lower_train(mesh, is_tpu: bool, rows: int = 2, rank: int = 16,
                distill: bool = False, guided: bool = False):
    """AOT the FULL 20B LoRA fine-tune step — value_and_grad through all 60
    blocks + Adam — on the v5e topology and report the per-chip budget.

    What makes it fit (training/lora_train.py):
    - base transformer TP-sharded bf16 (frozen; no optimizer state on it),
    - per-block jax.checkpoint: backward saves only block-boundary
      residual streams (~L·D bf16 per block) and recomputes within-block
      activations,
    - adapters fused per block INSIDE the remat region (no second full
      parameter copy resident),
    - the flash-attention custom VJP (ops/flash_attention.py): XLA's
      attention backward would materialize (L, L) f32 scores per block,
    - batch rows data-parallel over the idle `cfg` axis.

    The reference has no training side at all (SURVEY §5.4) — this is the
    capability its Lightning LoRA depends on, living off-repo there."""
    import optax

    from qwen_image_edit_streamdiffusion_tpu.training import lora_train as lt

    preset = get_preset("qwen-image-edit-2509")
    cfg = preset.model
    tcfg = lt.TrainConfig(rank=rank)
    chain = [optax.clip_by_global_norm(tcfg.grad_clip)] \
        if tcfg.grad_clip else []
    chain.append(optax.adamw(tcfg.learning_rate, b1=tcfg.b1, b2=tcfg.b2,
                             weight_decay=tcfg.weight_decay))
    opt = optax.chain(*chain)

    img_shapes = ((1, 64, 64), (1, 64, 64))  # 1024² target + 1024² cond
    txt_len = 256
    if distill:
        # progressive step distillation: + two gradient-free teacher
        # forwards (×2 more when guided — the CFG teacher) whose
        # activations XLA frees (no backward residuals)
        from qwen_image_edit_streamdiffusion_tpu.training import (
            distill as dtl,
        )

        dcfg = dtl.DistillConfig(
            train=tcfg, student_steps=2,
            teacher_cfg_scale=4.0 if guided else 0.0)
        step = dtl.build_distill_step(cfg, preset.scheduler, dcfg, opt,
                                      img_shapes, txt_len, rows, mesh=mesh,
                                      use_flash=is_tpu)
    else:
        step = lt.build_step(cfg, preset.scheduler, tcfg, opt, img_shapes,
                             txt_len, rows, mesh=mesh, use_flash=is_tpu)

    shapes = jax.eval_shape(lambda: tfm.init(jax.random.PRNGKey(0), cfg))
    specs = sharding.transformer_param_specs(shapes)
    base_abs = jax.tree_util.tree_map(
        lambda s, p: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, p)),
        shapes, specs,
    )
    rep = NamedSharding(mesh, P())
    lora_shapes = jax.eval_shape(
        lambda: lt.init_lora(shapes, tcfg, jax.random.PRNGKey(1)))
    opt_shapes = jax.eval_shape(opt.init, lora_shapes)
    as_rep = lambda tree: jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=rep), tree)
    lora_abs, opt_abs = as_rep(lora_shapes), as_rep(opt_shapes)
    adapter_bytes = sum(int(np.prod(s.shape)) * s.dtype.itemsize
                        for s in jax.tree_util.tree_leaves(lora_shapes))
    opt_bytes = sum(int(np.prod(s.shape)) * s.dtype.itemsize
                    for s in jax.tree_util.tree_leaves(opt_shapes))

    dp = ("cfg" in mesh.shape and mesh.shape["cfg"] > 1
          and rows % mesh.shape["cfg"] == 0)
    row_sh = NamedSharding(mesh, P("cfg")) if dp else rep
    f, h0, w0 = img_shapes[0]
    l_target = f * h0 * w0
    l_cond = sum(ff * hh * ww for ff, hh, ww in img_shapes[1:])
    abs_ = lambda shape, dt, sh: jax.ShapeDtypeStruct(shape, dt, sharding=sh)
    key_shape = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    args = [
        base_abs, lora_abs, opt_abs,
        abs_((rows, l_target, cfg.in_channels), jnp.bfloat16, row_sh),
        abs_((rows, l_cond, cfg.in_channels), jnp.bfloat16, row_sh),
        abs_((rows, txt_len, cfg.joint_dim), jnp.bfloat16, row_sh),
        abs_((rows, txt_len), jnp.bool_, row_sh),
    ]
    if distill:  # negative prompt embeds for the (optionally CFG) teacher
        args += [
            abs_((rows, txt_len, cfg.joint_dim), jnp.bfloat16, row_sh),
            abs_((rows, txt_len), jnp.bool_, row_sh),
        ]
    args.append(abs_(key_shape.shape, key_shape.dtype, rep))
    kind = ("distill" + ("+CFG-teacher" if guided else "")
            if distill else "train")
    t0 = time.time()
    lowered = jax.jit(step, donate_argnums=(1, 2)).lower(*args)
    print(f"{kind} step (rank-{rank} LoRA, {rows} rows, remat, "
          f"{'flash-VJP' if is_tpu else 'XLA attention'}) lowered in "
          f"{time.time() - t0:.1f}s")
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compiled in {time.time() - t0:.1f}s")
    print(f"adapters {adapter_bytes / 1e6:.1f} MB + Adam state "
          f"{opt_bytes / 1e6:.1f} MB (replicated, f32)")
    mem = compiled.memory_analysis()
    if mem is not None:
        total = (mem.argument_size_in_bytes + mem.temp_size_in_bytes
                 + mem.output_size_in_bytes)
        print(f"per-device: args {mem.argument_size_in_bytes / 1e9:.2f} GB "
              f"+ temps {mem.temp_size_in_bytes / 1e9:.2f} GB "
              f"+ out {mem.output_size_in_bytes / 1e9:.2f} GB = "
              f"{total / 1e9:.2f} GB "
              f"({'FITS' if total < 16e9 else 'EXCEEDS'} one v5e's 16 GB)")
    print(f"OK: full 20B LoRA {kind} step compiles TP+DP-sharded")


def main(n_devices: int = 8, loop: bool = False, bits: int = 0,
         vl: bool = False, vl_bits: int = 0,
         stream: bool = False, cfg_mode: str | None = None,
         rows: int = 1, train: bool = False, rank: int = 16,
         distill: bool = False, guided: bool = False,
         tiny_decoder: bool = False, tiny_encoder: bool = False):
    from qwen_image_edit_streamdiffusion_tpu.runtime import compile_cache

    compile_cache.honor_platform_env()
    preset = get_preset("qwen-image-edit-2509")
    cfg = preset.model

    mesh, is_tpu = _tpu_topology_mesh(n_devices)
    if mesh is None:
        devs = jax.devices()
        if len(devs) < n_devices:
            devs = jax.devices("cpu")
        cfg_axis = _TOPOLOGIES[n_devices][2]
        mesh = meshes.make_mesh(cfg_axis=cfg_axis,
                                model_axis=n_devices // cfg_axis,
                                devices=devs[:n_devices])
    print(f"mesh: {dict(mesh.shape)} target={'TPU v5e (AOT topology)' if is_tpu else 'CPU'}")
    if train or distill:
        return lower_train(mesh, is_tpu, rows=max(rows, 2), rank=rank,
                           distill=distill, guided=guided)
    if stream:
        return lower_stream(mesh, is_tpu, tiny_decoder=tiny_decoder,
                            bits=bits, tiny_encoder=tiny_encoder)
    if vl and not loop:
        lower_vl(mesh, is_tpu, vl_bits=vl_bits)
        return
    if loop:
        loop_mem = lower_serving_loop(mesh, is_tpu, bits=bits,
                                      cfg_mode=cfg_mode, rows=rows)
        if not vl:
            return
        # --loop --vl: the COMPLETE per-chip deployment budget (VERDICT r2
        # missing #1). All three param sets are resident simultaneously;
        # phase temps (VL encode → denoise loop → VAE decode) never
        # coexist, so peak = Σ params + max(phase temps).
        vl_mem = lower_vl(mesh, is_tpu, vl_bits=vl_bits)
        vae_mem = lower_vae(mesh, rows=rows)
        if loop_mem is None:
            print("no memory analysis available on this target")
            return
        resident = (loop_mem["params"] + vl_mem["params"]
                    + vae_mem["params"])
        peak_temps = max(loop_mem["temps"], vl_mem["temps"],
                         vae_mem["temps"])
        peak = resident + peak_temps
        print("—" * 60)
        print(f"COMBINED per-chip budget ({dict(mesh.shape)}):")
        print(f"  transformer shard + loop IO  {loop_mem['params'] / 1e9:6.2f} GB")
        print(f"  VL encoder shard             {vl_mem['params'] / 1e9:6.2f} GB")
        print(f"  VAE (replicated)             {vae_mem['params'] / 1e9:6.2f} GB")
        print(f"  peak phase temps             {peak_temps / 1e9:6.2f} GB "
              f"(loop {loop_mem['temps'] / 1e9:.2f} / "
              f"vl {vl_mem['temps'] / 1e9:.2f} / "
              f"vae {vae_mem['temps'] / 1e9:.2f})")
        print(f"  TOTAL                        {peak / 1e9:6.2f} GB "
              f"({'FITS' if peak < 16e9 else 'EXCEEDS'} one v5e's 16 GB)")
        return

    t0 = time.time()
    shapes = jax.eval_shape(lambda: tfm.init(jax.random.PRNGKey(0), cfg))
    if bits:
        from qwen_image_edit_streamdiffusion_tpu.models.quantize import (
            quantize_transformer,
        )

        shapes = jax.eval_shape(
            lambda p: quantize_transformer(p, bits=bits), shapes)
    specs = sharding.transformer_param_specs(shapes)
    params_abs = jax.tree_util.tree_map(
        lambda s, p: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, p)),
        shapes, specs,
    )
    n_params = param_count(shapes)
    print(f"abstract params: {n_params / 1e9:.2f}B ({time.time() - t0:.1f}s)")

    # 1024² bucket: 4096 target + 4096 cond tokens, 256 text.
    img_shapes = ((1, 64, 64), (1, 64, 64))
    txt_len = 256
    l_img = sum(f * h * w for f, h, w in img_shapes)
    ropes = tfm.make_rope(cfg, img_shapes, txt_len)
    batch = NamedSharding(mesh, P("cfg"))
    args = (
        params_abs,
        jax.ShapeDtypeStruct((2, l_img, cfg.in_channels), jnp.bfloat16,
                             sharding=batch),
        jax.ShapeDtypeStruct((2, txt_len, cfg.joint_dim), jnp.bfloat16,
                             sharding=batch),
        jax.ShapeDtypeStruct((2,), jnp.float32),
    )

    def fwd(params, img, txt, t):
        # TPU target compiles the real flash path (shard_mapped Pallas);
        # Pallas doesn't lower on the CPU fallback target
        return tfm.forward(params, cfg, img, txt, t, ropes,
                           use_flash=is_tpu, mesh=mesh if is_tpu else None)

    t0 = time.time()
    lowered = jax.jit(fwd).lower(*args)
    print(f"lowered in {time.time() - t0:.1f}s")
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compiled in {time.time() - t0:.1f}s")
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"per-device argument bytes: {mem.argument_size_in_bytes / 1e9:.2f} GB")
        print(f"per-device temp bytes:     {mem.temp_size_in_bytes / 1e9:.2f} GB")
        total = (mem.argument_size_in_bytes + mem.temp_size_in_bytes
                 + mem.output_size_in_bytes)
        print(f"per-device total:          {total / 1e9:.2f} GB "
              f"({'fits' if total < 16e9 else 'EXCEEDS'} one v5e's 16 GB)")
        if not is_tpu:
            print("(CPU fallback overstates temps: XLA attention "
                  "materializes scores the TPU flash path streams)")
    print("OK: full 20B preset lowers+compiles TP-sharded")


if __name__ == "__main__":
    import sys

    n = 8
    if "--v5e-4" in sys.argv:
        n = 4
    if "--chips" in sys.argv:
        n = int(sys.argv[sys.argv.index("--chips") + 1])
    bits = 8 if "--int8" in sys.argv else (4 if "--int4" in sys.argv else 0)
    vl_bits = (8 if "--int8-vl" in sys.argv
               else (4 if "--int4-vl" in sys.argv else 0))
    cfg_mode = (sys.argv[sys.argv.index("--cfg-mode") + 1]
                if "--cfg-mode" in sys.argv else None)
    rows = (int(sys.argv[sys.argv.index("--rows") + 1])
            if "--rows" in sys.argv else 1)
    rank = (int(sys.argv[sys.argv.index("--rank") + 1])
            if "--rank" in sys.argv else 16)
    main(n_devices=n, loop="--loop" in sys.argv,
         bits=bits,
         vl="--vl" in sys.argv,
         vl_bits=vl_bits,
         stream="--stream" in sys.argv,
         tiny_decoder="--tiny-decoder" in sys.argv,
         tiny_encoder="--tiny-encoder" in sys.argv,
         cfg_mode=cfg_mode,
         rows=rows,
         train="--train" in sys.argv,
         rank=rank,
         distill="--distill" in sys.argv,
         guided="--guided" in sys.argv)
