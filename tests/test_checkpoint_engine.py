"""Orbax checkpoint round-trip + from_checkpoint + profiler endpoints."""

import os

import jax
import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.core import imaging
from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
from qwen_image_edit_streamdiffusion_tpu.models import checkpoint as ckpt
from qwen_image_edit_streamdiffusion_tpu.models import transformer as tfm
from qwen_image_edit_streamdiffusion_tpu.models import vae as vae_mod

TINY_STREAM = StreamConfig(
    width=64, height=64, vae_image_area=64 * 64, vl_image_area=32 * 32,
    num_inference_steps=1, model_preset="tiny",
)


def test_checkpoint_roundtrip(tmp_path, tiny_preset):
    params = tfm.init(jax.random.PRNGKey(0), tiny_preset.model)
    path = str(tmp_path / "tfm")
    ckpt.save(path, params)
    like = jax.eval_shape(lambda: tfm.init(jax.random.PRNGKey(0),
                                           tiny_preset.model))
    back = ckpt.load(path, like=like)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(back)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.dtype == y.dtype
        np.testing.assert_array_equal(
            np.asarray(x, np.float32), np.asarray(y, np.float32)
        )


def test_pipeline_from_checkpoint(tmp_path, tiny_preset):
    from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
        EditPipeline,
    )

    src = EditPipeline.create("tiny", config=TINY_STREAM, seed=0)
    tp, vp = str(tmp_path / "t"), str(tmp_path / "v")
    ckpt.save(tp, src.tfm_params)
    ckpt.save(vp, src.vae_params)
    pipe = EditPipeline.from_checkpoint(tp, vp, preset="tiny",
                                        config=TINY_STREAM)
    img = imaging.make_test_image(64, 64, "circle")
    a = src(img, "x", num_inference_steps=1, seed=42)
    b = pipe(img, "x", num_inference_steps=1, seed=42)
    np.testing.assert_array_equal(np.asarray(a.images[0]),
                                  np.asarray(b.images[0]))


def test_engine_trace_endpoints(tmp_path):
    from qwen_image_edit_streamdiffusion_tpu.runtime.engine import (
        InferenceEngine,
    )

    eng = InferenceEngine(pipeline=None)
    d = str(tmp_path / "trace")
    out = eng.start_trace(d)
    assert out["status"] == "tracing"
    with pytest.raises(RuntimeError):
        eng.start_trace(d)
    out = eng.stop_trace()
    assert out["status"] == "stopped"
    with pytest.raises(RuntimeError):
        eng.stop_trace()
    assert os.path.isdir(d)


def test_compile_cache_enable(tmp_path, monkeypatch):
    from qwen_image_edit_streamdiffusion_tpu.runtime import compile_cache

    d = str(tmp_path / "xla_cache")
    monkeypatch.setenv("QIE_COMPILE_CACHE", d)
    got = compile_cache.enable()
    # on the CPU backend (the hermetic test platform) the cache segregates
    # by host CPU-feature fingerprint: XLA:CPU AOT entries embed the
    # compile host's features and SIGILL-risk on leaner hosts
    assert got == d or (got.startswith(d + os.sep + "cpu-"))
    assert os.path.isdir(got)
    monkeypatch.setenv("QIE_COMPILE_CACHE", "0")
    assert compile_cache.enable() is None


def test_from_checkpoint_detects_unfused_layout(tmp_path, tiny_preset):
    """A checkpoint saved in the UNFUSED qkv layout loads into a pipeline
    whose config fuses qkv (metadata-based layout detection +
    fuse-after-load; the existing test covers the fused-saved side since
    fuse_qkv defaults on)."""
    from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
        EditPipeline,
    )

    unfused_cfg = TINY_STREAM.replace(fuse_qkv=False)
    src = EditPipeline.create("tiny", config=unfused_cfg, seed=0)
    assert "img_qkv" not in src.tfm_params["blocks"][0]["attn"]
    tp, vp = str(tmp_path / "t"), str(tmp_path / "v")
    ckpt.save(tp, src.tfm_params)
    ckpt.save(vp, src.vae_params)

    pipe = EditPipeline.from_checkpoint(tp, vp, preset="tiny",
                                        config=TINY_STREAM)  # fuse_qkv on
    assert "img_qkv" in pipe.tfm_params["blocks"][0]["attn"]
    img = imaging.make_test_image(64, 64, "circle")
    a = src(img, "x", num_inference_steps=1, seed=42)
    b = pipe(img, "x", num_inference_steps=1, seed=42)
    np.testing.assert_allclose(
        np.asarray(a.images[0], np.float32),
        np.asarray(b.images[0], np.float32), atol=2.0,
    )


def test_from_checkpoint_restores_straight_into_tp_layout(tmp_path):
    """With a mesh, from_checkpoint must restore every component DIRECTLY
    into its mesh layout (each device reads only its shards) — loading the
    40 GB flagship transformer replicated first would OOM a 16 GB chip
    before sharding could happen. Covers transformer (TP), VAE
    (replicated), and the VL encoder (cfg×model sharded)."""
    from qwen_image_edit_streamdiffusion_tpu.core import meshes
    from qwen_image_edit_streamdiffusion_tpu.models import qwen_vl
    from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
        EditPipeline,
    )

    cfg = TINY_STREAM.replace(fuse_qkv=False, cfg_mode="parallel",
                              mesh_cfg_axis=2, mesh_model_axis=4)
    src = EditPipeline.create("tiny", config=cfg, seed=0)
    tp, vp, vl = str(tmp_path / "t"), str(tmp_path / "v"), str(tmp_path / "l")
    ckpt.save(tp, src.tfm_params)
    ckpt.save(vp, src.vae_params)
    # save an UNSHARDED copy of the VL params (what the conversion CLI
    # writes) — restore must place them sharded
    unsharded_vl = jax.tree_util.tree_map(np.asarray, src.encoder.params)
    ckpt.save(vl, unsharded_vl)

    mesh = meshes.make_mesh(cfg_axis=2, model_axis=4)
    pipe = EditPipeline.from_checkpoint(tp, vp, preset="tiny", config=cfg,
                                        vl_path=vl, mesh=mesh)
    w = pipe.tfm_params["blocks"][0]["attn"]["img_q"]["w"]
    assert len(w.sharding.device_set) == 8
    assert w.sharding.shard_shape(w.shape)[1] == w.shape[1] // 4  # model=4
    vlw = pipe.encoder.params["lm"]["blocks"][0]["q_proj"]["w"]
    assert not vlw.sharding.is_fully_replicated

    img = imaging.make_test_image(64, 64, "circle")
    out = pipe(img, "stylize", num_inference_steps=1, seed=42)
    assert np.isfinite(np.asarray(out.images[0], np.float32)).all()


def test_prequantized_checkpoint_restores_without_requantize(tmp_path,
                                                             tiny_preset):
    """A checkpoint saved pre-quantized (convert --quantize int8) must be
    detected from metadata and restored as-is: quantized leaves present,
    no fuse pass, output identical to quantizing the same bf16 params in
    memory."""
    from qwen_image_edit_streamdiffusion_tpu.models.quantize import (
        quantize_transformer,
    )
    from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
        EditPipeline,
    )

    cfg = TINY_STREAM.replace(fuse_qkv=False)
    src = EditPipeline.create("tiny", config=cfg, seed=0)
    qp = quantize_transformer(src.tfm_params)
    tp, vp = str(tmp_path / "tq"), str(tmp_path / "v")
    ckpt.save(tp, qp)
    ckpt.save(vp, src.vae_params)

    pipe = EditPipeline.from_checkpoint(tp, vp, preset="tiny", config=cfg)
    attn = pipe.tfm_params["blocks"][0]["attn"]
    assert "w_q" in attn["img_q"] and "w" not in attn["img_q"]

    src.tfm_params = qp
    src._jit_cache.clear()
    img = imaging.make_test_image(64, 64, "circle")
    a = src(img, "x", num_inference_steps=1, seed=42)
    b = pipe(img, "x", num_inference_steps=1, seed=42)
    np.testing.assert_array_equal(np.asarray(a.images[0]),
                                  np.asarray(b.images[0]))


def test_prequantized_int4_checkpoint_into_tp_mesh(tmp_path):
    """The int4 deployment flow: a pre-quantized (int4) transformer AND a
    pre-quantized (int8) VL encoder restore STRAIGHT into their mesh
    layouts — packed w_q4 / scale4 leaves sharded, forward finite. Also
    exercises the rung-mismatch warning (config says int8, ckpt is int4)."""
    from qwen_image_edit_streamdiffusion_tpu.core import meshes
    from qwen_image_edit_streamdiffusion_tpu.models.quantize import (
        quantize_transformer,
        quantize_vl,
    )
    from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
        EditPipeline,
    )

    cfg = TINY_STREAM.replace(fuse_qkv=False, cfg_mode="parallel",
                              mesh_cfg_axis=2, mesh_model_axis=4,
                              use_int8=True, use_int8_vl=True)
    src = EditPipeline.create("tiny",
                              config=cfg.replace(use_int8=False,
                                                 use_int8_vl=False), seed=0)
    tp, vp, vl = str(tmp_path / "t4"), str(tmp_path / "v"), str(tmp_path / "l8")
    ckpt.save(tp, quantize_transformer(src.tfm_params, bits=4))
    ckpt.save(vp, src.vae_params)
    ckpt.save(vl, jax.tree_util.tree_map(
        np.asarray, quantize_vl(src.encoder.params, bits=8)))

    mesh = meshes.make_mesh(cfg_axis=2, model_axis=4)
    with pytest.warns(UserWarning, match="pre-quantized int4"):
        pipe = EditPipeline.from_checkpoint(tp, vp, preset="tiny",
                                            config=cfg, vl_path=vl,
                                            mesh=mesh)
    leaf = pipe.tfm_params["blocks"][0]["attn"]["img_q"]
    assert "w_q4" in leaf
    assert len(leaf["w_q4"].sharding.device_set) == 8
    assert "w_q" in pipe.encoder.params["lm"]["blocks"][0]["q_proj"]

    img = imaging.make_test_image(64, 64, "circle")
    out = pipe(img, "stylize", num_inference_steps=1, seed=42)
    assert np.isfinite(np.asarray(out.images[0], np.float32)).all()
