"""Tiny output decoder (models/tiny_vae.py + training/tiny_vae.py).

The TAESD analog: StreamDiffusion pairs its realtime loop with a tiny
autoencoder; no such artifact exists for this latent space, so the
framework distills one from the full VAE decoder and serves it via
StreamConfig.decoder="tiny" (reference decode path it replaces:
qwen_realtime.py:188-199).
"""

import dataclasses
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.core import imaging
from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
from qwen_image_edit_streamdiffusion_tpu.models import tiny_vae as tv
from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
    EditPipeline,
    _check_tiny_cfg,
)
from qwen_image_edit_streamdiffusion_tpu.training import tiny_vae as tvt


TCFG = tv.TinyDecoderConfig(latent_channels=16, width=8,
                            blocks_per_stage=2, spatial_upsample=8,
                            dtype="float32")


def _stream_cfg(**kw):
    base = dict(model_preset="tiny", width=64, height=64,
                num_inference_steps=2, cfg_mode="none",
                vae_image_area=64 * 64, vl_image_area=32 * 32,
                use_vl_encoder=False)
    base.update(kw)
    return StreamConfig(**base)


def test_decode_shape_and_range():
    params = tv.init(jax.random.PRNGKey(0), TCFG)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    x = jax.jit(lambda p, z: tv.decode(p, TCFG, z))(params, z)
    assert x.shape == (2, 64, 64, 3)  # 8× spatial upsample
    assert bool(jnp.all(jnp.isfinite(x)))
    assert float(x.min()) >= -1.0 and float(x.max()) <= 1.0


def test_save_load_roundtrip(tmp_path):
    params = tv.init(jax.random.PRNGKey(0), dataclasses.replace(
        TCFG, dtype="bfloat16"))
    path = str(tmp_path / "dec.safetensors")
    tv.save(path, params)
    loaded, cfg = tv.load(path)
    assert cfg == dataclasses.replace(TCFG, dtype="bfloat16")
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_distill_improves_match_with_full_decoder():
    """The core mechanism: training moves PSNR(tiny, full-decode) up."""
    pipe = EditPipeline.create("tiny", config=_stream_cfg(), seed=0)
    trainer = tvt.TinyVAETrainer.from_pipeline(
        pipe, tvt.TinyVAETrainConfig(width=8, learning_rate=3e-3))
    imgs = tvt._synthetic_images(64, 4)
    batch = tvt.build_decoder_batch(pipe, imgs)
    before = trainer.eval_psnr(batch)
    losses = [trainer.step(batch) for _ in range(30)]
    after = trainer.eval_psnr(batch)
    assert losses[-1] < losses[0]
    assert after > before + 1.0, (before, after)


def test_train_save_serve_roundtrip(tmp_path):
    """distill → save → create(tiny_decoder_path=…) → edit: the artifact
    the server's --tiny-decoder flag consumes."""
    pipe = EditPipeline.create("tiny", config=_stream_cfg(), seed=0)
    trainer = tvt.TinyVAETrainer.from_pipeline(
        pipe, tvt.TinyVAETrainConfig(width=8))
    trainer.step(tvt.build_decoder_batch(pipe, tvt._synthetic_images(64, 2)))
    path = str(tmp_path / "dec.safetensors")
    trainer.save(path)

    served = EditPipeline.create("tiny", config=_stream_cfg(), seed=0,
                                 tiny_decoder_path=path)
    assert served.config.decoder == "tiny"
    assert served.tiny_vae[1].width == 8
    img = imaging.make_test_image(64, 64, "gradient")
    out = served(img, "edit", num_inference_steps=2, seed=1).images[0]
    assert out.size == (64, 64)


def test_tiny_decoder_changes_output_not_shape():
    """decoder="tiny" swaps only the output stage; switching back to
    "full" on the same pipeline re-uses the full path (jit-cache keys
    are decoder-aware)."""
    pipe = EditPipeline.create("tiny", config=_stream_cfg(), seed=0)
    img = imaging.make_test_image(64, 64, "circle")
    full = np.asarray(pipe(img, "p", num_inference_steps=2,
                           seed=3).images[0])

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        tiny_pipe = EditPipeline.create(
            "tiny", config=_stream_cfg(decoder="tiny"), seed=0)
        assert any("random-init tiny decoder" in str(x.message) for x in w)
    tiny = np.asarray(tiny_pipe(img, "p", num_inference_steps=2,
                                seed=3).images[0])
    assert tiny.shape == full.shape
    assert np.any(tiny != full)

    # same pipeline object serves full again after a config flip
    tiny_pipe.config = tiny_pipe.config.replace(decoder="full")
    full2 = np.asarray(tiny_pipe(img, "p", num_inference_steps=2,
                                 seed=3).images[0])
    np.testing.assert_array_equal(full2, full)


def test_stream_frame_with_tiny_decoder():
    """The fused realtime graph decodes through the tiny path (keyframe
    AND temporal frames), and the temporal latent handoff still works."""
    from qwen_image_edit_streamdiffusion_tpu.pipeline.stream import (
        RealtimePipeline,
    )

    pipe = EditPipeline.create("tiny", config=_stream_cfg(decoder="tiny"),
                               seed=0)
    rp = RealtimePipeline(pipe)
    rp.precompute_conditions("stream")
    img = imaging.make_test_image(64, 64, "gradient")
    kf = rp.process_frame(img)  # keyframe
    tf = rp.process_frame(img)  # temporal
    assert kf.size == (64, 64) and tf.size == (64, 64)


def test_latent_grid_mismatch_raises():
    pipe = EditPipeline.create("tiny", config=_stream_cfg(), seed=0)
    bad = dataclasses.replace(TCFG, latent_channels=4)
    with pytest.raises(ValueError, match="latent grid"):
        _check_tiny_cfg(bad, pipe.preset.vae, "x")


# ---------------------------------------------------------------------------
# Tiny ENCODER — the other half of the TAESD pair (VERDICT r3 next #4)
# ---------------------------------------------------------------------------

ECFG = tv.TinyEncoderConfig(latent_channels=16, width=8,
                            blocks_per_stage=2, spatial_downsample=8,
                            dtype="float32")


def test_encode_shape():
    params = tv.encoder_init(jax.random.PRNGKey(0), ECFG)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3),
                             minval=-1.0, maxval=1.0)
    z = jax.jit(lambda p, x: tv.encode(p, ECFG, x))(params, img)
    assert z.shape == (2, 8, 8, 16)  # 8× spatial downsample
    assert bool(jnp.all(jnp.isfinite(z)))


def test_encoder_save_load_roundtrip(tmp_path):
    params = tv.encoder_init(jax.random.PRNGKey(0), dataclasses.replace(
        ECFG, dtype="bfloat16"))
    path = str(tmp_path / "enc.safetensors")
    tv.save(path, params)
    loaded, cfg = tv.load_encoder(path)
    assert cfg == dataclasses.replace(ECFG, dtype="bfloat16")
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_encoder_rejects_decoder_artifact(tmp_path):
    """A decoder file fed to load_encoder fails loudly (conv_in reads z
    channels, not RGB) — artifacts are self-describing."""
    path = str(tmp_path / "dec.safetensors")
    tv.save(path, tv.init(jax.random.PRNGKey(0), TCFG))
    with pytest.raises(ValueError, match="not a tiny ENCODER"):
        tv.load_encoder(path)


def test_encoder_distill_improves_serving_psnr():
    """Core mechanism: latent-domain distillation raises the serving-view
    PSNR (both latent sets decoded through the SAME full decoder)."""
    pipe = EditPipeline.create("tiny", config=_stream_cfg(), seed=0)
    trainer = tvt.TinyEncoderTrainer.from_pipeline(
        pipe, tvt.TinyVAETrainConfig(width=8, learning_rate=3e-3))
    batch = tvt.build_encoder_batch(pipe, tvt._synthetic_images(64, 4))
    before = trainer.eval_psnr(batch)
    losses = [trainer.step(batch) for _ in range(30)]
    after = trainer.eval_psnr(batch)
    assert losses[-1] < losses[0]
    assert after > before + 1.0, (before, after)


def test_stream_temporal_frames_use_tiny_encoder(tmp_path):
    """encoder="tiny": keyframes re-anchor through the exact full VAE
    (bit-equal to a full-encoder stream), temporal frames route through
    the tiny encoder (output differs); the artifact round-trips through
    create(tiny_encoder_path=...) — the server's --tiny-encoder flag."""
    from qwen_image_edit_streamdiffusion_tpu.pipeline.stream import (
        RealtimePipeline,
    )

    pipe_full = EditPipeline.create("tiny", config=_stream_cfg(), seed=0)
    trainer = tvt.TinyEncoderTrainer.from_pipeline(
        pipe_full, tvt.TinyVAETrainConfig(width=8))
    trainer.step(tvt.build_encoder_batch(pipe_full,
                                         tvt._synthetic_images(64, 2)))
    path = str(tmp_path / "enc.safetensors")
    trainer.save(path, dtype="float32")

    pipe_tiny = EditPipeline.create("tiny", config=_stream_cfg(), seed=0,
                                    tiny_encoder_path=path)
    assert pipe_tiny.config.encoder == "tiny"
    assert pipe_tiny.tiny_encoder[1].width == 8

    img = imaging.make_test_image(64, 64, "gradient")
    rp_full = RealtimePipeline(pipe_full)
    rp_full.precompute_conditions("stream")
    rp_tiny = RealtimePipeline(pipe_tiny)
    rp_tiny.precompute_conditions("stream")

    kf_full = np.asarray(rp_full.process_frame(img))
    kf_tiny = np.asarray(rp_tiny.process_frame(img))
    np.testing.assert_array_equal(kf_full, kf_tiny)  # keyframe = full VAE

    tf_full = np.asarray(rp_full.process_frame(img))
    tf_tiny = np.asarray(rp_tiny.process_frame(img))
    assert tf_full.shape == tf_tiny.shape
    assert np.any(tf_full != tf_tiny)  # temporal frame took the tiny path
    # the /edit conditioning path never touches the tiny encoder
    assert ("vae_encode", (64, 64), "rgb", "tiny") in pipe_tiny._jit_cache


def test_encoder_latent_grid_mismatch_raises():
    from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
        _check_tiny_enc_cfg,
    )

    pipe = EditPipeline.create("tiny", config=_stream_cfg(), seed=0)
    bad = dataclasses.replace(ECFG, latent_channels=4)
    with pytest.raises(ValueError, match="latent grid"):
        _check_tiny_enc_cfg(bad, pipe.preset.vae, "x")


def test_artifact_swap_invalidates_cached_graphs(tmp_path):
    """ADVICE r4: _vae_encode_fn/_vae_decode_fn close over the tiny
    config while the cache key omits artifact identity — loading a new
    artifact must drop the stale encode/decode/stream_fused graphs."""
    pipe = EditPipeline.create("tiny", config=_stream_cfg(), seed=0)
    trainer = tvt.TinyEncoderTrainer.from_pipeline(
        pipe, tvt.TinyVAETrainConfig(width=8))
    enc_path = str(tmp_path / "enc.safetensors")
    trainer.save(enc_path, dtype="float32")
    pipe.load_tiny_encoder(enc_path)
    # populate an encode graph + fake stream graph under the tiny kind
    pipe._vae_encode_fn((64, 64), "rgb", kind="tiny")
    pipe._jit_cache[("stream_fused", "temporal", (64, 64))] = object()
    assert ("vae_encode", (64, 64), "rgb", "tiny") in pipe._jit_cache

    trainer2 = tvt.TinyEncoderTrainer.from_pipeline(
        pipe, tvt.TinyVAETrainConfig(width=8))
    enc2 = str(tmp_path / "enc2.safetensors")
    trainer2.save(enc2, dtype="bfloat16")  # different dtype config
    pipe.load_tiny_encoder(enc2)
    assert ("vae_encode", (64, 64), "rgb", "tiny") not in pipe._jit_cache
    assert not any(k[0].startswith("stream_fused")
                   for k in pipe._jit_cache if isinstance(k, tuple))
    # decode side: same contract
    dtr = tvt.TinyVAETrainer.from_pipeline(
        pipe, tvt.TinyVAETrainConfig(width=8))
    dec_path = str(tmp_path / "dec.safetensors")
    dtr.save(dec_path, dtype="float32")
    pipe.load_tiny_decoder(dec_path)
    pipe._vae_decode_fn((8, 8))
    assert any(k[0] == "vae_decode" for k in pipe._jit_cache)
    pipe.load_tiny_decoder(dec_path)
    assert not any(k[0] == "vae_decode" for k in pipe._jit_cache)
