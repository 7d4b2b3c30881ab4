"""Temporal stream pipeline + condition caches."""

import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.core import imaging
from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
from qwen_image_edit_streamdiffusion_tpu.pipeline.cache import (
    LRUCache,
    PromptCache,
    image_fingerprint,
)
from qwen_image_edit_streamdiffusion_tpu.pipeline.stream import RealtimePipeline
from qwen_image_edit_streamdiffusion_tpu.models.text_encoder import StubEncoder

TINY_STREAM = StreamConfig(
    width=64, height=64,
    vae_image_area=64 * 64, vl_image_area=32 * 32,
    num_inference_steps=2,
    keyframe_interval=3,
    model_preset="tiny",
)


@pytest.fixture(scope="module")
def rt():
    p = RealtimePipeline.create("tiny", config=TINY_STREAM, seed=0)
    p.precompute_conditions("oil painting style")
    return p


def test_lru_eviction_and_stats():
    c = LRUCache(capacity=2)
    c.put("a", 1)
    c.put("b", 2)
    assert c.get("a") == 1
    c.put("c", 3)  # evicts b (LRU)
    assert c.get("b") is None
    assert c.get("a") == 1 and c.get("c") == 3
    s = c.stats()
    assert s["size"] == 2 and s["hits"] == 3 and s["misses"] == 1


def test_image_fingerprint_sensitivity():
    a = np.zeros((8, 8, 3), np.uint8)
    b = a.copy()
    b[0, 0, 0] = 1
    assert image_fingerprint(a) != image_fingerprint(b)
    assert image_fingerprint(a) == image_fingerprint(np.zeros((8, 8, 3), np.uint8))


def test_prompt_cache_hits():
    enc = StubEncoder(joint_dim=16, max_len=8)
    pc = PromptCache(enc)
    img = np.zeros((4, 4, 3), np.uint8)
    e1 = pc.encode("hello", [img])
    e2 = pc.encode("hello", [img])
    assert pc.cache.stats()["hits"] == 1
    np.testing.assert_array_equal(e1.embeds, e2.embeds)
    pc.encode("different", [img])
    assert pc.cache.stats()["misses"] == 2


def test_keyframe_schedule(rt):
    frame = imaging.make_test_image(64, 64, "gradient")
    flags = []
    for _ in range(5):
        rt.process_frame(frame)
        flags.append(rt.is_keyframe)
    # interval=3: frames 0,3 are keyframes; 1,2,4 temporal
    assert flags == [True, False, False, True, False]
    assert rt.frame_count == 5
    stats = rt.get_stats()
    assert stats["fps"] > 0 and stats["frame_count"] == 5


def test_temporal_frames_produce_valid_images(rt):
    frame = imaging.make_test_image(64, 64, "circle")
    outs = [rt.process_frame(frame) for _ in range(3)]
    for o in outs:
        assert o.size == (64, 64)
        assert np.isfinite(np.asarray(o, np.float32)).all()


def test_temporal_latent_carried(rt):
    assert rt.prev_latent is not None
    assert rt.prev_latent.shape == (1, 8, 8, 16)


def test_camera_loop_headless(rt, capsys):
    """run_camera_loop without cv2/camera: sine-pattern fallback, bounded
    frames, stats printed — both pipelined (submit/collect overlap) and
    sequential paths terminate and produce frames."""
    rt.frame_count = 0
    rt.prev_latent = None
    rt.run_camera_loop(max_frames=3, pipelined=True)
    out = capsys.readouterr().out
    assert out.count("frame ") == 3 and "fps" in out
    # exactly max_frames frames dispatched — no discarded in-flight frame
    assert rt.frame_count == 3
    rt.run_camera_loop(max_frames=2, pipelined=False)
    out = capsys.readouterr().out
    assert out.count("frame ") == 2


def test_stream_cfg_with_mismatched_prompt_buckets():
    """The VL encoder buckets output lengths to multiples of 64, so pos
    and neg prompts can land in different buckets; precompute_conditions
    must pad them to a common length or the batched-CFG fused graph
    fails to stack them (review r2 finding #1)."""
    from qwen_image_edit_streamdiffusion_tpu.models.text_encoder import (
        PromptEmbedding,
    )

    class TwoBucketEncoder:
        joint_dim = 48

        def encode(self, prompt, images=()):
            n = 8 if len(prompt) < 20 else 16  # different bucket per prompt
            rng = np.random.default_rng(len(prompt))
            return PromptEmbedding(
                embeds=rng.standard_normal((n, 48)).astype(np.float32),
                mask=np.ones((n,), bool),
            )

    cfg = TINY_STREAM.replace(true_cfg_scale=4.0)
    rt = RealtimePipeline.create("tiny", config=cfg, seed=0,
                                 encoder=TwoBucketEncoder())
    rt.precompute_conditions(
        "short", negative_prompt="a much longer negative prompt text"
    )
    assert rt._frozen_txt.shape == rt._frozen_neg_txt.shape
    out = rt.process_frame(imaging.make_test_image(64, 64, "gradient"))
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_stream_yuv420_transfer_roundtrip():
    """The fused frame graph with transfer_format="yuv420" (half the
    tunnel bytes in BOTH directions) stays visually equivalent to rgb:
    luma must match closely, chroma within subsampling error."""
    rt = RealtimePipeline.create(
        "tiny", config=TINY_STREAM.replace(transfer_format="yuv420"), seed=0
    )
    rt.precompute_conditions("oil painting style")
    rt2 = RealtimePipeline.create("tiny", config=TINY_STREAM, seed=0)
    rt2.precompute_conditions("oil painting style")
    frame = imaging.make_test_image(64, 64, "gradient")
    a = np.asarray(rt.process_frame(frame), np.float32)
    b = np.asarray(rt2.process_frame(frame), np.float32)
    ya = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    yb = 0.299 * b[..., 0] + 0.587 * b[..., 1] + 0.114 * b[..., 2]
    # the input 4:2:0 repack perturbs cond latents slightly, so allow a
    # small mean luma drift; gross divergence means a broken un/pack
    assert np.abs(ya - yb).mean() < 8.0
    assert np.isfinite(a).all()


def test_stream_freezes_prompt_conditions():
    """CachedConditions semantics: precompute once, zero per-frame encodes
    (the reference's intended cache, qwen_realtime.py:69-89)."""
    calls = []

    class CountingEncoder(StubEncoder):
        def encode(self, prompt, images=()):
            calls.append(prompt)
            return super().encode(prompt, images)

    from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
        EditPipeline,
    )
    from qwen_image_edit_streamdiffusion_tpu.pipeline.stream import (
        RealtimePipeline as RT,
    )

    enc = CountingEncoder(joint_dim=48, max_len=64)
    pipe = EditPipeline.create("tiny", config=TINY_STREAM, seed=0, encoder=enc)
    p = RT(pipe=pipe)
    p.precompute_conditions("stylize")
    n_after_precompute = len(calls)
    frame = imaging.make_test_image(64, 64, "gray")
    p.process_frame(frame)
    p.process_frame(frame)
    assert len(calls) == n_after_precompute, (
        f"stream re-encoded the prompt per frame: {calls}"
    )


def test_stream_with_true_cfg():
    p = RealtimePipeline.create("tiny", config=TINY_STREAM, seed=0)
    p.precompute_conditions("oil painting", negative_prompt="blurry")
    frame = imaging.make_test_image(64, 64, "gradient")
    outs = [p.process_frame(frame) for _ in range(4)]  # key + temporal w/ CFG
    for o in outs:
        assert np.isfinite(np.asarray(o, np.float32)).all()
    # CFG changes output vs cond-only
    q = RealtimePipeline.create("tiny", config=TINY_STREAM, seed=0)
    q.precompute_conditions("oil painting")
    o2 = q.process_frame(frame)
    assert np.abs(
        np.asarray(outs[0], np.int16) - np.asarray(o2, np.int16)
    ).max() > 0


def test_stream_rcfg_self_fused_graph():
    """cfg_mode="rcfg-self" rides the fused stream graph: the condition
    image IS the current frame (same grid), so the virtual negative
    anchors on reproducing it unedited — CFG-strength streaming at
    cond-only forward count (StreamDiffusion's self-negative RCFG)."""
    cfg = TINY_STREAM.replace(cfg_mode="rcfg-self")
    p = RealtimePipeline.create("tiny", config=cfg, seed=0)
    p.precompute_conditions("oil painting", negative_prompt="blurry")
    frame = imaging.make_test_image(64, 64, "gradient")
    outs = [p.process_frame(frame) for _ in range(4)]  # key + temporal
    for o in outs:
        assert np.isfinite(np.asarray(o, np.float32)).all()
    # the fused buckets compiled the rcfg-self graph (keyframe AND
    # temporal start_step>0), never a 2x-forward batched-CFG one
    modes = {k[5] for k in p.pipe._jit_cache if k[0] == "denoise"}
    assert "rcfg-self" in modes and "batched" not in modes
    # guidance is live: differs from the cond-only stream
    q = RealtimePipeline.create("tiny", config=TINY_STREAM, seed=0)
    q.precompute_conditions("oil painting")
    o2 = q.process_frame(frame)
    assert np.abs(
        np.asarray(outs[0], np.int16) - np.asarray(o2, np.int16)
    ).max() > 0


def test_similarity_filter_skips_static_frames():
    """StreamDiffusion §3.3 SSF: a static scene re-serves the previous
    output without inference; a scene change always processes."""
    cfg = TINY_STREAM.replace(similarity_filter=True,
                              similarity_threshold=0.98,
                              similarity_max_skip=3)
    p = RealtimePipeline.create("tiny", config=cfg, seed=0)
    p.precompute_conditions("oil painting")
    static = imaging.make_test_image(64, 64, "gradient")
    outs = [p.process_frame(static) for _ in range(6)]
    # identical frames → cosine 1.0 → skip probability 1.0, bounded by
    # max_skip; at least one skip fired and the stream never froze past
    # the bound
    assert p.skipped_frames >= 1
    assert p.frame_count >= 2  # max_skip forces real frames through
    assert p.frame_count + p.skipped_frames == 6
    assert p.get_stats()["skipped_frames"] == p.skipped_frames
    for o in outs:
        assert o is not None and np.isfinite(np.asarray(o, np.float32)).all()
    # scene change: signature diverges → must process, not skip
    before = p.frame_count
    changed = imaging.make_test_image(64, 64, "circle")
    p.process_frame(changed)
    assert p.frame_count == before + 1


def test_similarity_filter_pipelined_path():
    """submit_frame (pipelined camera loop) also skips static frames,
    re-serving the last dispatched pixels handle."""
    cfg = TINY_STREAM.replace(similarity_filter=True,
                              similarity_max_skip=3)
    p = RealtimePipeline.create("tiny", config=cfg, seed=0)
    p.precompute_conditions("oil painting")
    static = imaging.make_test_image(64, 64, "gradient")
    handles = [p.submit_frame(static) for _ in range(5)]
    assert p.skipped_frames >= 1
    assert p.frame_count + p.skipped_frames == 5
    # skipped submissions return the SAME handle; collecting works for all
    assert any(h1 is h2 for h1, h2 in zip(handles, handles[1:]))
    outs = [p._collect(h) for h in handles]
    for o in outs:
        assert np.isfinite(np.asarray(o, np.float32)).all()


def test_similarity_filter_off_never_skips(rt):
    """Default config: the filter is off, every frame runs inference
    (benchmarks measure real work)."""
    static = imaging.make_test_image(64, 64, "gradient")
    before = rt.frame_count
    for _ in range(3):
        rt.process_frame(static)
    assert rt.frame_count == before + 3
    assert rt.skipped_frames == 0


def test_hybrid_preview_stream():
    """preview_scale=2 (serving yuv420 format): keyframes run full-res and
    pool their latent onto the preview grid; temporal frames run the whole
    fused graph at half linear resolution and upscale host-side."""
    cfg = StreamConfig(
        width=64, height=64,
        vae_image_area=64 * 64, vl_image_area=32 * 32,
        num_inference_steps=2, keyframe_interval=3,
        model_preset="tiny", preview_scale=2,
        transfer_format="yuv420",
    )
    rt = RealtimePipeline.create("tiny", config=cfg, seed=0)
    rt.precompute_conditions("oil painting style")
    frame = imaging.make_test_image(64, 64, "gradient")
    out_key = rt.process_frame(frame)  # frame 0: keyframe, full res
    assert out_key.size == (64, 64)
    # keyframe latent handed off pooled 2x2 onto the preview grid
    assert rt.prev_latent.shape == (1, 4, 4, 16)
    out_tmp = rt.process_frame(frame)  # frame 1: temporal at 32x32
    assert out_tmp.size == (64, 64)  # upscaled host-side to display size
    assert rt.prev_latent.shape == (1, 4, 4, 16)
    rt.process_frame(frame)  # frame 2: temporal
    out_key2 = rt.process_frame(frame)  # frame 3: keyframe again
    assert rt.is_keyframe and out_key2.size == (64, 64)
    for o in (out_key, out_tmp, out_key2):
        assert np.isfinite(np.asarray(o, np.float32)).all()
    # pipelined submit/collect works across the key/preview boundary
    pend = rt.submit_frame(frame)
    nxt = rt.submit_frame(frame)
    assert rt._collect(pend).size == (64, 64)
    assert rt._collect(nxt).size == (64, 64)


def test_preview_scale_invalid_size_warns_and_disables():
    """width/height not divisible by 16*s: warn once, run full-res."""
    cfg = StreamConfig(
        width=48, height=48,
        vae_image_area=48 * 48, vl_image_area=32 * 32,
        num_inference_steps=2, keyframe_interval=3,
        model_preset="tiny", preview_scale=2,
    )
    rt = RealtimePipeline.create("tiny", config=cfg, seed=0)
    rt.precompute_conditions("oil painting style")
    frame = imaging.make_test_image(48, 48, "gradient")
    with pytest.warns(UserWarning, match="preview_scale"):
        rt.process_frame(frame)
    out = rt.process_frame(frame)  # temporal, but full-res (disabled)
    assert out.size == (48, 48)
    assert rt.prev_latent.shape == (1, 6, 6, 16)
