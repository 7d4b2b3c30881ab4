"""Native Qwen2.5-VL encoder tests (tiny VL config)."""

import jax
import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.models import qwen_vl
from qwen_image_edit_streamdiffusion_tpu.models.qwen_vl import (
    QwenVLEncoder,
    SimpleTokenizer,
    build_chat_ids,
    extract_patches,
    smart_resize_hw,
    _mrope_tables,
    _positions_from_ids,
    _window_partition,
    IMAGE_PAD,
    IM_START,
    IM_END,
    VISION_START,
    VISION_END,
)


@pytest.fixture(scope="module")
def enc(tiny_preset):
    return QwenVLEncoder(tiny_preset.vl, seed=0, max_len=96)


def test_smart_resize_alignment():
    h, w = smart_resize_hw(480, 640, 28, 56 * 56, 1024 * 1024)
    assert h % 28 == 0 and w % 28 == 0
    assert 56 * 56 <= h * w <= 1024 * 1024


def test_smart_resize_hf_goldens():
    # HF qwen_vl_utils.smart_resize outputs with processor defaults
    # (factor=28, min=4·28²=3136, max=1280·28²=1003520) — grid parity with
    # the real checkpoint's training distribution (VERDICT.md missing #4).
    cases = {
        (480, 640): (476, 644),
        (100, 160): (112, 168),
        (384, 384): (392, 392),
        (1024, 1024): (980, 980),   # max_pixels binds → floor path
        (56, 1000): (56, 1008),
        (20, 20): (56, 56),         # min_pixels binds → ceil path
        (512, 512): (504, 504),
    }
    for (h, w), want in cases.items():
        got = smart_resize_hw(h, w, 28, 4 * 28 * 28, 1280 * 28 * 28)
        assert got == want, f"{(h, w)} → {got}, want {want}"


def test_extract_patches_shapes(tiny_preset):
    cfg = tiny_preset.vl
    img = np.random.default_rng(0).integers(0, 255, (100, 160, 3)).astype(np.uint8)
    patches, gh, gw = extract_patches(img, cfg)
    m = cfg.spatial_merge_size
    # HF-exact grid: smart_resize(100,160)=(112,168) → 8×12 patches of 14px,
    # aligned to the merge factor only (NOT window-rounded).
    assert (gh, gw) == (112 // cfg.patch_size, 168 // cfg.patch_size)
    assert gh % m == 0 and gw % m == 0
    assert patches.shape == (gh * gw,
                             3 * cfg.temporal_patch_size * cfg.patch_size ** 2)


def test_window_partition_ragged(tiny_preset):
    cfg = tiny_preset.vl
    wp = cfg.window_size // cfg.patch_size
    gh, gw = wp + 2, 2 * wp + 4  # ragged right/bottom edge windows
    perm, win_ids = _window_partition(cfg, gh, gw)
    assert sorted(perm.tolist()) == list(range(gh * gw))
    # windows are contiguous spans in sorted order
    assert np.all(np.diff(win_ids) >= 0)
    # membership matches (r//wp, c//wp) tiling, incl. ragged edges
    r, c = perm // gw, perm % gw
    expect = (r // wp) * (-(-gw // wp)) + (c // wp)
    np.testing.assert_array_equal(win_ids, expect)
    # ragged edge window is smaller than a full wp×wp window
    sizes = np.bincount(win_ids)
    assert sizes.max() == wp * wp and sizes.min() == 2 * 4


def test_chat_template_structure():
    tok = SimpleTokenizer(512)
    ids, starts, drop = build_chat_ids(tok, "make it red", [5, 3])
    # prefix: <|im_start|> system ... <|im_end|> <|im_start|> user
    assert ids[0] == IM_START
    # drop covers the full prefix "...<|im_end|>\n<|im_start|>user\n"
    assert ids[drop - 2] == IM_START and ids[drop - 3] == IM_END
    # exactly two vision spans with the right pad counts, in order
    vs = [i for i, t in enumerate(ids) if t == VISION_START]
    ve = [i for i, t in enumerate(ids) if t == VISION_END]
    assert len(vs) == 2 and len(ve) == 2
    assert ids[vs[0] + 1: ve[0]] == [IMAGE_PAD] * 5
    assert ids[vs[1] + 1: ve[1]] == [IMAGE_PAD] * 3
    assert starts == [vs[0] + 1, vs[1] + 1]
    # "Picture N:" labels precede each vision span (hashed token ids differ
    # between Picture-1 and Picture-2 labels only at the number token)
    lbl1 = ids[drop: vs[0]]
    lbl2 = ids[ve[0] + 1: vs[1]]
    assert len(lbl1) == len(lbl2) == 2  # "Picture" + "1:"
    assert lbl1[0] == lbl2[0] and lbl1[1] != lbl2[1]
    # suffix ends with the assistant header, past the user <|im_end|>
    assert IM_END in ids[ve[1]:]
    assert ids[-2] == IM_START  # ... <|im_start|> assistant
    # drop_idx override pins the upstream fixed 64
    _, _, d2 = build_chat_ids(tok, "x", [], drop_idx=64)
    assert d2 == 64


def test_mrope_positions_walk(tiny_preset):
    cfg = tiny_preset.vl
    m = cfg.spatial_merge_size
    gh, gw = 4, 4  # merged 2x2
    ids = [1, 2] + [IMAGE_PAD] * ((gh // m) * (gw // m)) + [3]
    pos = _positions_from_ids(cfg, ids, [(gh, gw)])
    assert pos.shape == (3, len(ids))
    # text prefix: all coords equal
    np.testing.assert_array_equal(pos[:, 0], [0, 0, 0])
    np.testing.assert_array_equal(pos[:, 1], [1, 1, 1])
    # image tokens: t constant, (h, w) grid
    np.testing.assert_array_equal(pos[0, 2:6], [2, 2, 2, 2])
    np.testing.assert_array_equal(pos[1, 2:6], [2, 2, 3, 3])
    np.testing.assert_array_equal(pos[2, 2:6], [2, 3, 2, 3])
    # trailing text continues after the grid extent
    np.testing.assert_array_equal(pos[:, 6], [4, 4, 4])


def test_mrope_tables_shape(tiny_preset):
    cfg = tiny_preset.vl
    pos = np.stack([np.arange(5)] * 3)
    cos, sin = _mrope_tables(cfg, pos)
    hd = cfg.hidden_size // cfg.num_heads
    assert cos.shape == (5, hd) and sin.shape == (5, hd)
    np.testing.assert_allclose(cos[0], np.ones(hd))  # position 0 → angle 0


def test_encode_text_only(enc):
    e = enc.encode("make it a watercolor painting")
    # short prompts land in the smallest 64-token output bucket (≤ max_len)
    assert e.embeds.shape == (64, enc.cfg.hidden_size)
    assert e.mask.any() and not e.mask.all()
    assert np.isfinite(e.embeds).all()


def test_encode_with_image(enc, tiny_preset):
    img = np.random.default_rng(1).integers(0, 255, (64, 64, 3)).astype(np.uint8)
    e = enc.encode("stylize", [img])
    assert np.isfinite(e.embeds).all()
    e2 = enc.encode("stylize", [img])
    np.testing.assert_array_equal(e.embeds, e2.embeds)  # deterministic


def test_image_changes_embedding(enc):
    a = np.zeros((64, 64, 3), np.uint8)
    b = np.full((64, 64, 3), 255, np.uint8)
    ea = enc.encode("stylize", [a])
    eb = enc.encode("stylize", [b])
    assert np.abs(ea.embeds - eb.embeds).max() > 1e-4


def test_prompt_changes_embedding(enc):
    ea = enc.encode("oil painting")
    eb = enc.encode("pencil sketch")
    assert np.abs(ea.embeds - eb.embeds).max() > 1e-4


def test_encoder_plugs_into_pipeline(tiny_preset):
    from qwen_image_edit_streamdiffusion_tpu.core import imaging
    from qwen_image_edit_streamdiffusion_tpu.core.config import StreamConfig
    from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
        EditPipeline,
    )

    enc = QwenVLEncoder(tiny_preset.vl, seed=0, max_len=64)
    cfg = StreamConfig(width=64, height=64, vae_image_area=64 * 64,
                       vl_image_area=56 * 56, num_inference_steps=1,
                       model_preset="tiny")
    pipe = EditPipeline.create("tiny", config=cfg, seed=0, encoder=enc)
    res = pipe(imaging.make_test_image(64, 64, "circle"), "stylize",
               num_inference_steps=1)
    assert res.images[0].size == (64, 64)
    assert np.isfinite(np.asarray(res.images[0], np.float32)).all()


def test_mrope_sections_use_correct_coordinates(tiny_preset):
    # sections (2,2,2): freqs 0-1 follow t, 2-3 follow h, 4-5 follow w
    cfg = tiny_preset.vl
    pos_t = np.array([[5], [0], [0]])  # only t nonzero
    pos_h = np.array([[0], [5], [0]])
    pos_w = np.array([[0], [0], [5]])
    hd = cfg.hidden_size // cfg.num_heads
    half = hd // 2
    ct, st = _mrope_tables(cfg, pos_t)
    ch, sh = _mrope_tables(cfg, pos_h)
    cw, sw = _mrope_tables(cfg, pos_w)
    # sin==0 exactly where the section's coordinate is 0
    assert (np.abs(st[0, :2]) > 0).all()  # t section rotated
    np.testing.assert_array_equal(st[0, 2:half], 0.0)
    np.testing.assert_array_equal(sh[0, :2], 0.0)
    assert (np.abs(sh[0, 2:4]) > 0).all()  # h section rotated
    np.testing.assert_array_equal(sh[0, 4:half], 0.0)
    np.testing.assert_array_equal(sw[0, :4], 0.0)
    assert (np.abs(sw[0, 4:half]) > 0).all()  # w section rotated
    # duplicated halves (rotate-half convention)
    np.testing.assert_allclose(ct[0, :half], ct[0, half:])
    np.testing.assert_allclose(st[0, :half], st[0, half:])


def test_prompt_length_does_not_retrace(enc):
    enc.encode("one two three")
    n0 = len(enc._jit_cache)
    enc.encode("a different number of tokens here ok")  # same 128-bucket
    assert len(enc._jit_cache) == n0, "LM retraced on prompt-length change"


def test_windowed_attention_equals_masked_reference(tiny_preset):
    """The padded window-batched attention (O(nw·wmax²)) must equal the
    block-diagonal-masked full attention it replaced, on a ragged grid."""
    import jax
    import jax.numpy as jnp

    from qwen_image_edit_streamdiffusion_tpu.models import qwen_vl as qvl

    cfg = tiny_preset.vl
    wp = cfg.window_size // cfg.patch_size
    gh, gw = wp + 2, wp + 4  # ragged edges in both directions
    l = gh * gw
    nh = cfg.vision_heads
    hd = cfg.vision_hidden // nh
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((l, nh, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((l, nh, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((l, nh, hd)), jnp.float32)
    perm, win_ids = qvl._window_partition(cfg, gh, gw)

    # reference: full attention with a block-diagonal window mask
    mask = jnp.asarray(win_ids[:, None] == win_ids[None, :])
    qf = q.transpose(1, 0, 2)[None]
    kf = k.transpose(1, 0, 2)[None]
    vf = v.transpose(1, 0, 2)[None]
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf,
                   preferred_element_type=jnp.float32) * (hd ** -0.5)
    s = jnp.where(mask[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhqk,bhkd->bhqd", p, vf)[0].transpose(1, 0, 2)
    ref = np.asarray(ref.reshape(l, nh * hd))

    # batched ragged windows (the vision_forward implementation)
    counts = np.bincount(win_ids)
    nw, wmax = counts.size, int(counts.max())
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(l) - np.repeat(starts, counts)
    idx = np.zeros((nw, wmax), np.int32)
    valid = np.zeros((nw, wmax), bool)
    idx[win_ids, slot] = np.arange(l)
    valid[win_ids, slot] = True
    qw = q[jnp.asarray(idx)].transpose(0, 2, 1, 3)
    kw = k[jnp.asarray(idx)].transpose(0, 2, 1, 3)
    vw = v[jnp.asarray(idx)].transpose(0, 2, 1, 3)
    sw = jnp.einsum("whqd,whkd->whqk", qw, kw,
                    preferred_element_type=jnp.float32) * (hd ** -0.5)
    sw = jnp.where(jnp.asarray(valid)[:, None, None, :], sw, -1e30)
    pw = jax.nn.softmax(sw, axis=-1)
    ow = jnp.einsum("whqk,whkd->whqd", pw, vw).transpose(0, 2, 1, 3)
    got = np.asarray(
        ow.reshape(nw * wmax, nh * hd)[jnp.asarray(win_ids * wmax + slot)]
    )
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_patches_from_image_matches_extract_patches(tiny_preset):
    """The on-device patchify (uint8 upload, normalize+reshape inside the
    vision jit) must produce the same patch matrix as the numpy reference
    extract_patches — only the transfer format changed, not the math."""
    import jax.numpy as jnp

    cfg = tiny_preset.vl
    img = np.random.default_rng(3).integers(
        0, 255, (50, 70, 3)).astype(np.uint8)
    ref, gh, gw = qwen_vl.extract_patches(img, cfg)
    arr8, gh2, gw2 = qwen_vl.resize_for_vl(img, cfg)
    assert (gh, gw) == (gh2, gw2)
    dev = qwen_vl.patches_from_image(jnp.asarray(arr8), cfg, gh, gw)
    np.testing.assert_allclose(np.asarray(dev), ref, atol=1e-6, rtol=1e-6)


# ---------------------------------------------------------------------------
# Batched wave encoding (encode_many — the dynamic-batch leader's VL path)
# ---------------------------------------------------------------------------


def test_encode_many_matches_sequential(enc):
    """A coalesced wave (batched vision + vmapped LM groups) must match
    per-request encode() — same graphs for singleton groups, batched-GEMM
    reduction-order tolerance for vmapped ones."""
    rng = np.random.default_rng(7)
    img_a = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    img_b = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    reqs = [
        ("oil painting", (img_a,)),
        ("pencil sketch with many extra words to land in a longer text "
         "bucket than the others so the wave spans two LM groups "
         + "pad " * 40, (img_b,)),
        ("watercolor", (img_a,)),
        ("make it glow", (img_b,)),
    ]
    batch = enc.encode_many(reqs)
    for (p, imgs), got in zip(reqs, batch):
        solo = enc.encode(p, imgs)
        assert got.embeds.shape == solo.embeds.shape
        np.testing.assert_array_equal(got.mask, solo.mask)
        np.testing.assert_allclose(
            np.asarray(got.embeds), np.asarray(solo.embeds),
            rtol=2e-4, atol=2e-4)


def test_encode_many_shares_vision_work(enc, monkeypatch):
    """Identical images (a CFG request's pos+neg prompts) must run the
    vision tower ONCE per unique image — count vision dispatches."""
    calls = {"n": 0}
    orig = enc._vision_fn

    def counting(gh, gw):
        fn = orig(gh, gw)

        def wrapped(params, img):
            calls["n"] += 1
            return fn(params, img)

        return wrapped

    monkeypatch.setattr(enc, "_vision_fn", counting)
    img = np.random.default_rng(11).integers(
        0, 255, (64, 64, 3)).astype(np.uint8)
    enc.encode_many([("bright", (img,)), ("dark, blurry", (img,))])
    assert calls["n"] == 1  # one unique image → one (unbatched) dispatch


def test_encode_many_single_is_bit_equal(enc):
    """A 1-request wave routes through the exact same jit graphs as
    encode() — bit-identical output (goldens stay valid)."""
    img = np.random.default_rng(13).integers(
        0, 255, (64, 64, 3)).astype(np.uint8)
    a = enc.encode("stylize", [img])
    b = enc.encode_many([("stylize", (img,))])[0]
    np.testing.assert_array_equal(np.asarray(a.embeds), np.asarray(b.embeds))
    np.testing.assert_array_equal(a.mask, b.mask)


def test_prompt_cache_encode_many_dedups_and_caches(tiny_preset):
    """PromptCache.encode_many: hits skip the encoder; duplicate wave
    entries encode once; results land in the cache."""
    from qwen_image_edit_streamdiffusion_tpu.pipeline.cache import PromptCache

    class Counting:
        joint_dim = tiny_preset.vl.hidden_size
        max_len = 64

        def __init__(self):
            self.inner = QwenVLEncoder(tiny_preset.vl, seed=0, max_len=64)
            self.waves = []

        def encode_many(self, requests):
            self.waves.append(len(requests))
            return self.inner.encode_many(requests)

        def encode(self, prompt, images=()):
            return self.encode_many([(prompt, tuple(images))])[0]

    counting = Counting()
    pc = PromptCache(counting)
    img = np.random.default_rng(17).integers(
        0, 255, (64, 64, 3)).astype(np.uint8)
    reqs = [("bright", (img,)), ("ugly", (img,)), ("ugly", (img,))]
    out1 = pc.encode_many(reqs)
    assert counting.waves == [2]  # "ugly" deduped within the wave
    out2 = pc.encode_many(reqs)
    assert counting.waves == [2]  # all hits — no second encoder call
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a.embeds),
                                      np.asarray(b.embeds))


def test_lm_jit_cache_keys_include_interpret(enc):
    """ADVICE r4: toggling Pallas interpret mode after an LM graph is
    cached must not silently reuse the old-flag graph — the cache key
    carries self.interpret for both the single and batched LM twins."""
    old = enc.interpret
    try:
        enc.interpret = False
        f1 = enc._lm_fn(32, (4,), ((2, 8),))
        enc.interpret = True
        f2 = enc._lm_fn(32, (4,), ((2, 8),))
        assert f1 is not f2
        b1 = enc._lm_fn_batched(32, (4,), ((2, 8),), 2)
        enc.interpret = False
        b2 = enc._lm_fn_batched(32, (4,), ((2, 8),), 2)
        assert b1 is not b2
    finally:
        enc.interpret = old
