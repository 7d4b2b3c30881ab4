"""End-to-end pipeline tests on the tiny preset (CPU-fast shapes)."""

import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.core import imaging
from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
    EditPipeline,
    combine_cfg,
)

TINY_STREAM = StreamConfig(
    width=64,
    height=64,
    vae_image_area=64 * 64,
    vl_image_area=32 * 32,
    num_inference_steps=2,
    model_preset="tiny",
)


@pytest.fixture(scope="module")
def pipe():
    return EditPipeline.create("tiny", config=TINY_STREAM, seed=0)


@pytest.fixture(scope="module")
def test_img():
    return imaging.make_test_image(64, 64, "circle")


def test_basic_edit(pipe, test_img):
    res = pipe(test_img, "make it an oil painting", num_inference_steps=2)
    assert len(res.images) == 1
    assert res.images[0].size == (64, 64)
    arr = np.asarray(res.images[0])
    assert np.isfinite(arr).all()
    assert res.elapsed > 0


def test_seed_determinism(pipe, test_img):
    a = pipe(test_img, "stylize", seed=42)
    b = pipe(test_img, "stylize", seed=42)
    c = pipe(test_img, "stylize", seed=7)
    np.testing.assert_array_equal(np.asarray(a.images[0]), np.asarray(b.images[0]))
    assert np.abs(
        np.asarray(c.images[0], np.int16) - np.asarray(a.images[0], np.int16)
    ).max() > 0


def test_prompt_changes_output(pipe, test_img):
    a = pipe(test_img, "oil painting", seed=42)
    b = pipe(test_img, "cyberpunk neon city", seed=42)
    assert np.abs(
        np.asarray(a.images[0], np.int16) - np.asarray(b.images[0], np.int16)
    ).max() > 0


def test_cfg_batched_matches_sequential(test_img):
    a = EditPipeline.create(
        "tiny", config=TINY_STREAM.replace(cfg_mode="batched"), seed=0
    )
    b = EditPipeline.create(
        "tiny", config=TINY_STREAM.replace(cfg_mode="sequential"), seed=0
    )
    ra = a(test_img, "stylize", negative_prompt="blurry", seed=42)
    rb = b(test_img, "stylize", negative_prompt="blurry", seed=42)
    # identical math, different batching — allow tiny numeric drift
    np.testing.assert_allclose(
        np.asarray(ra.latents, np.float32),
        np.asarray(rb.latents, np.float32),
        atol=1e-3, rtol=1e-2,
    )


def test_no_negative_prompt_skips_cfg(pipe, test_img):
    # matches upstream do_true_cfg semantics: no negative prompt → cond-only
    res = pipe(test_img, "stylize", seed=42)
    res2 = pipe(test_img, "stylize", true_cfg_scale=1.0,
                negative_prompt="bad", seed=42)
    np.testing.assert_array_equal(
        np.asarray(res.images[0]), np.asarray(res2.images[0])
    )


def test_cfg_changes_output(pipe, test_img):
    plain = pipe(test_img, "stylize", seed=42)
    cfg = pipe(test_img, "stylize", negative_prompt="blurry",
               true_cfg_scale=4.0, seed=42)
    assert np.abs(
        np.asarray(plain.images[0], np.int16) - np.asarray(cfg.images[0], np.int16)
    ).max() > 0


def test_jit_cache_reuse(pipe, test_img):
    n0 = len(pipe._jit_cache)
    pipe(test_img, "another prompt entirely", seed=3)
    assert len(pipe._jit_cache) == n0  # same shape bucket → no new graphs


def test_combine_cfg_scale_one_is_identity():
    import jax.numpy as jnp

    pos = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 4)), jnp.float32)
    neg = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 4)), jnp.float32)
    out = combine_cfg(pos, neg, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pos), atol=1e-5)


def test_non_square_default_output():
    # No explicit size → area-based default at the input aspect ratio.
    cfg = TINY_STREAM.replace(width=None, height=None, vae_image_area=64 * 64)
    p = EditPipeline.create("tiny", config=cfg, seed=0)
    img = imaging.make_test_image(128, 64, "gradient")  # 2:1 aspect
    res = p(img, "x", num_inference_steps=1)
    w, h = res.images[0].size
    assert w % 16 == 0 and h % 16 == 0
    assert w > h  # aspect preserved


def test_multi_condition_images(pipe, test_img):
    """Upstream multi-image signature `image=[a, b]` (SURVEY.md §2.2,
    VERDICT r2 next #4): both condition images' tokens ride the joint
    sequence (concatenated, each on its own RoPE frame index), output
    stays finite, and the second image actually changes the result."""
    ref = imaging.make_test_image(64, 64, "gradient")
    res = pipe([test_img, ref], "blend the styles", num_inference_steps=2,
               seed=42)
    assert len(res.images) == 1
    arr = np.asarray(res.images[0])
    assert np.isfinite(arr).all()

    # the two-image bucket is its own compiled graph with 3 img_shapes
    keys = [k for k in pipe._jit_cache
            if k[0] == "denoise" and len(k[2]) == 3]
    assert keys, "two-condition denoise bucket not compiled"

    single = pipe(test_img, "blend the styles", num_inference_steps=2,
                  seed=42)
    assert np.abs(
        np.asarray(single.images[0], np.int16) - arr.astype(np.int16)
    ).max() > 0


def test_int4_pipeline_end_to_end(test_img):
    """use_int4 / use_int4_vl (the reference's NF4 rung as a product
    option): block linears carry packed int4 leaves, the VL encoder is
    quantized too, and a full edit runs finite."""
    cfg = TINY_STREAM.replace(use_int4=True, use_int4_vl=True)
    p = EditPipeline.create("tiny", config=cfg, seed=0)
    blk = p.tfm_params["blocks"][0]
    leaf = blk["attn"]["img_qkv"] if "img_qkv" in blk["attn"] else \
        blk["attn"]["img_q"]
    assert "w_q4" in leaf or "w_q" in leaf  # int4, or int8 fallback rung
    vl_params = getattr(p.encoder, "params", None)
    if vl_params is not None:  # native VL encoder in path
        q = vl_params["lm"]["blocks"][0]["q_proj"]
        assert "w_q4" in q or "w_q" in q
    out = p(test_img, "add a red hat", num_inference_steps=2, seed=1)
    arr = np.asarray(out.images[0], np.float32)
    assert arr.shape == (64, 64, 3) and np.isfinite(arr).all()


def test_rcfg_one_step_matches_batched(test_img):
    """Residual CFG's peeled first step IS the batched-CFG body
    (StreamDiffusion §3.2 onetime-negative); at 1 step the two modes are
    the same math end-to-end."""
    a = EditPipeline.create(
        "tiny", config=TINY_STREAM.replace(cfg_mode="batched"), seed=0
    )
    b = EditPipeline.create(
        "tiny", config=TINY_STREAM.replace(cfg_mode="rcfg"), seed=0
    )
    ra = a(test_img, "stylize", negative_prompt="blurry",
           num_inference_steps=1, seed=42)
    rb = b(test_img, "stylize", negative_prompt="blurry",
           num_inference_steps=1, seed=42)
    np.testing.assert_allclose(
        np.asarray(ra.latents, np.float32),
        np.asarray(rb.latents, np.float32),
        atol=1e-3, rtol=1e-2,
    )


def test_rcfg_guides_at_one_extra_forward(test_img):
    """2-step rcfg: 3 model forwards instead of 4, still guided (output
    differs from cond-only, stays finite)."""
    p = EditPipeline.create(
        "tiny", config=TINY_STREAM.replace(cfg_mode="rcfg"), seed=0
    )
    plain = p(test_img, "stylize", seed=42)
    guided = p(test_img, "stylize", negative_prompt="blurry",
               true_cfg_scale=4.0, seed=42)
    arr = np.asarray(guided.images[0], np.float32)
    assert np.isfinite(arr).all()
    assert np.abs(
        arr.astype(np.int16) - np.asarray(plain.images[0], np.int16)
    ).max() > 0
    # the compiled bucket is the rcfg graph, not a 2x-forward CFG graph
    assert any(k[0] == "denoise" and k[5] == "rcfg" for k in p._jit_cache)


def test_rcfg_self_no_negative_forwards(test_img):
    """Self-negative Residual CFG: the virtual negative anchors on the
    unedited condition latents — guidance at cond-only forward count."""
    p = EditPipeline.create(
        "tiny", config=TINY_STREAM.replace(cfg_mode="rcfg-self"), seed=0
    )
    plain = p(test_img, "stylize", seed=42)
    guided = p(test_img, "stylize", negative_prompt="blurry",
               true_cfg_scale=4.0, seed=42)
    arr = np.asarray(guided.images[0], np.float32)
    assert np.isfinite(arr).all()
    assert np.abs(
        arr.astype(np.int16) - np.asarray(plain.images[0], np.int16)
    ).max() > 0
    assert any(
        k[0] == "denoise" and k[5] == "rcfg-self" for k in p._jit_cache
    )


def test_rcfg_self_grid_mismatch_degrades_to_rcfg(test_img):
    """rcfg-self needs the first condition grid == target grid; a mismatch
    warns and falls back to onetime-negative rcfg."""
    p = EditPipeline.create(
        "tiny", config=TINY_STREAM.replace(cfg_mode="rcfg-self"), seed=0
    )
    with pytest.warns(UserWarning, match="rcfg-self"):
        res = p(test_img, "stylize", negative_prompt="blurry",
                true_cfg_scale=4.0, seed=42, width=32, height=32)
    assert np.isfinite(np.asarray(res.images[0], np.float32)).all()
    assert any(k[0] == "denoise" and k[5] == "rcfg" for k in p._jit_cache)


def test_int4_fallback_to_int8_on_odd_dims():
    """in_dim not divisible by the int4 group size takes the int8 rung
    instead of staying dense (e.g. the VL vision MLP's 3420-dim down)."""
    import jax

    from qwen_image_edit_streamdiffusion_tpu.models import quantize

    w = {"down": {"w": jax.random.normal(jax.random.PRNGKey(0), (60, 32))}}
    q = quantize.quantize_vl(w, bits=4)
    assert "w_q" in q["down"] and "w_q4" not in q["down"]


def test_edit_many_matches_individual_calls(pipe, test_img):
    """Cross-request batching (edit_many) carries per-row conditioning,
    so each item's result matches its own individual __call__ — 3 items
    also exercises row padding up to the 4-bucket (padded rows must not
    leak into outputs)."""
    img2 = imaging.make_test_image(64, 64, "gradient")
    items = [
        {"image": test_img, "prompt": "oil painting", "seed": 5},
        {"image": img2, "prompt": "cyberpunk neon", "seed": 9},
        {"image": test_img, "prompt": "pencil sketch", "seed": 1},
    ]
    many = pipe.edit_many(items, num_inference_steps=1)
    assert len(many) == 3
    for it, res in zip(items, many):
        solo = pipe(it["image"], it["prompt"], num_inference_steps=1,
                    seed=it["seed"])
        np.testing.assert_allclose(
            np.asarray(res.latents), np.asarray(solo.latents),
            rtol=1e-4, atol=1e-4)
        a = np.asarray(res.images[0], np.int16)
        b = np.asarray(solo.images[0], np.int16)
        # identical rows modulo batched-GEMM reduction order (≤1 uint8
        # code at rounding boundaries)
        assert np.abs(a - b).max() <= 1


def test_edit_many_cfg_and_num_images(pipe, test_img):
    """edit_many composes with true CFG (per-item negative prompts ride
    their own rows) and per-item num_images."""
    items = [
        {"image": test_img, "prompt": "bright", "negative_prompt": "ugly",
         "seed": 3},
        {"image": test_img, "prompt": "dark", "negative_prompt": "blurry",
         "seed": 4, "num_images": 2},
    ]
    many = pipe.edit_many(items, num_inference_steps=1, true_cfg_scale=4.0)
    assert [len(r.images) for r in many] == [1, 2]
    for r in many:
        for im in r.images:
            assert np.isfinite(np.asarray(im, np.float32)).all()
    assert np.abs(
        np.asarray(many[1].images[0], np.int16)
        - np.asarray(many[1].images[1], np.int16)
    ).max() > 0


def test_edit_many_geometry_mismatch_raises(pipe, test_img):
    tall = imaging.make_test_image(32, 64, "gradient")  # 1:2 aspect
    with pytest.raises(ValueError, match="share output size"):
        pipe.edit_many(
            [{"image": test_img, "prompt": "x"},
             {"image": tall, "prompt": "y"}],
            num_inference_steps=1)


def test_num_images_per_prompt(pipe, test_img):
    """Upstream-parity batch arg: N variations of one edit in a single
    denoise dispatch — per-row noise, shared conditioning; rows differ,
    all finite; composes with true CFG (2N batched rows)."""
    res = pipe(test_img, "stylize", num_inference_steps=1, seed=3,
               num_images_per_prompt=3)
    assert len(res.images) == 3
    arrs = [np.asarray(im, np.int16) for im in res.images]
    assert all(np.isfinite(a).all() for a in arrs)
    assert np.abs(arrs[0] - arrs[1]).max() > 0  # different noise rows
    assert res.latents.shape[0] == 3

    cfg = pipe(test_img, "stylize", negative_prompt="ugly",
               true_cfg_scale=4.0, num_inference_steps=1, seed=3,
               num_images_per_prompt=2)
    assert len(cfg.images) == 2
    assert np.isfinite(np.asarray(cfg.images[0], np.float32)).all()


def test_encode_conditions_many_matches_per_item(pipe):
    """The coalesced condition VAE encode (one batched dispatch per
    resolution, content-deduplicated) must reproduce each item's
    individual encode_condition_latents output."""
    img_a = np.asarray(imaging.make_test_image(64, 64, "gradient"))
    img_b = np.asarray(imaging.make_test_image(64, 64, "circle"))
    waves = [[img_a], [img_b], [img_a]]  # dedup: img_a appears twice
    pipe.latent_cache.cache._d.clear()
    batched = pipe._encode_conditions_many(waves)
    for imgs, (tok, shapes) in zip(waves, batched):
        solo_tok, solo_shapes = pipe.encode_condition_latents(imgs)
        assert shapes == solo_shapes
        np.testing.assert_allclose(
            np.asarray(tok, np.float32), np.asarray(solo_tok, np.float32),
            rtol=2e-2, atol=2e-2)  # batched-conv reduction order (bf16)
    # results were cached per item
    assert pipe.latent_cache.lookup([img_a]) is not None
    assert pipe.latent_cache.lookup([img_b]) is not None
