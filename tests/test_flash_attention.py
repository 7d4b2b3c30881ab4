"""Flash-attention kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.ops.attention import (
    reference_attention,
)
from qwen_image_edit_streamdiffusion_tpu.ops.flash_attention import (
    fits_resident,
    flash_attention,
    supported,
)


def _qkv(b, h, lq, lk, d, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, h, lq, d), dtype)
    k = jax.random.normal(ks[1], (b, h, lk, d), dtype)
    v = jax.random.normal(ks[2], (b, h, lk, d), dtype)
    return q, k, v


@pytest.mark.parametrize("lq,lk", [(256, 256), (384, 640), (100, 300)])
def test_matches_reference(lq, lk):
    q, k, v = _qkv(1, 2, lq, lk, 128)
    ref = reference_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_masked_matches_reference():
    b, h, lq, lk, d = 2, 2, 128, 256, 128
    q, k, v = _qkv(b, h, lq, lk, d, seed=1)
    mask = jnp.asarray(
        np.random.default_rng(0).random((b, lk)) > 0.3
    )
    ref = reference_attention(q, k, v, kv_mask=mask)
    out = flash_attention(q, k, v, kv_mask=mask, interpret=True,
                          block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_bf16_inputs():
    q, k, v = _qkv(1, 1, 128, 128, 128, dtype=jnp.bfloat16, seed=2)
    ref = reference_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True, block_q=128, block_k=128)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_bf16_scores_matches_reference():
    """bf16 score-domain variant (QIE_FLASH_BF16_SCORES): bf16 QK^T +
    bf16 online max/sub must stay within bf16 output resolution of the
    f32 reference, including under a key mask."""
    b, h, lq, lk, d = 2, 2, 128, 256, 128
    q, k, v = _qkv(b, h, lq, lk, d, dtype=jnp.bfloat16, seed=3)
    mask = jnp.asarray(np.random.default_rng(1).random((b, lk)) > 0.3)
    ref = reference_attention(q, k, v, kv_mask=mask)
    out = flash_attention(q, k, v, kv_mask=mask, interpret=True,
                          block_q=128, block_k=128, bf16_scores=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )
    # f32 scores on bf16 inputs agree with the bf16-score variant closely
    # (the opt-in changes precision, not semantics)
    base = flash_attention(q, k, v, kv_mask=mask, interpret=True,
                           block_q=128, block_k=128, bf16_scores=False)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(base, np.float32),
        atol=2e-2, rtol=2e-2,
    )
    # streaming variant honors it too
    out_s = flash_attention(q, k, v, kv_mask=mask, interpret=True,
                            block_q=128, block_k=128, bf16_scores=True,
                            stream=True)
    np.testing.assert_allclose(
        np.asarray(out_s, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_bf16_scores_causal():
    """Causal (VL decoder) variant under bf16 scores."""
    q, k, v = _qkv(1, 2, 256, 256, 128, dtype=jnp.bfloat16, seed=4)
    ref = _causal_ref(q, k, v)
    out = flash_attention(q, k, v, causal=True, interpret=True,
                          block_q=128, block_k=128, bf16_scores=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_supported_gate():
    q, k, v = _qkv(1, 1, 128, 128, 128)
    assert supported(q, k, v)
    q2, k2, v2 = _qkv(1, 1, 64, 64, 96)
    assert not supported(q2, k2, v2)  # head_dim not lane-aligned
    # K/V too large for VMEM residence → streaming kernel, still supported
    big_k = jnp.zeros((1, 1, 40000, 128), jnp.float32)
    assert not fits_resident(big_k)
    assert supported(q, big_k, big_k)


@pytest.mark.parametrize("lq,lk", [(256, 512), (300, 700)])
def test_streaming_kernel_matches_reference(lq, lk):
    # the HBM-streaming variant (multi-condition-image 1024² shapes whose
    # K/V exceed the resident kernel's VMEM budget), forced at small size
    b, h, d = 1, 2, 128
    q, k, v = _qkv(b, h, lq, lk, d, seed=3)
    mask = jnp.asarray(np.random.default_rng(1).random((b, lk)) > 0.2)
    ref = reference_attention(q, k, v, kv_mask=mask)
    out = flash_attention(q, k, v, kv_mask=mask, interpret=True,
                          block_q=128, block_k=128, stream=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_streaming_mask_len_prune_matches():
    b, h, lq, lk, d = 1, 1, 256, 640, 128
    q, k, v = _qkv(b, h, lq, lk, d, seed=4)
    # only the first 130 keys can be invalid (txt prefix semantics)
    m = np.ones((b, lk), bool)
    m[:, 40:130] = False
    mask = jnp.asarray(m)
    ref = reference_attention(q, k, v, kv_mask=mask)
    for stream in (False, True):
        out = flash_attention(q, k, v, kv_mask=mask, interpret=True,
                              block_q=128, block_k=128, mask_len=130,
                              stream=stream)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def _causal_ref(q, k, v, n_real=None):
    """Dense causal reference with repeated kv heads (GQA)."""
    b, h, l, d = q.shape
    hkv = k.shape[1]
    if hkv != h:
        k = jnp.repeat(k, h // hkv, axis=1)
        v = jnp.repeat(v, h // hkv, axis=1)
    mask = np.tril(np.ones((l, l), bool))
    if n_real is not None:
        mask = mask & (np.arange(l) < n_real)[None, :]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * (d ** -0.5)
    s = jnp.where(jnp.asarray(mask)[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("l", [256, 384, 300])
def test_causal_matches_reference(l):
    q, k, v = _qkv(1, 2, l, l, 128, seed=5)
    ref = _causal_ref(q, k, v)
    out = flash_attention(q, k, v, causal=True, interpret=True,
                          block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_causal_gqa_matches_reference():
    """GQA via kv-index maps: 8 q heads sharing 2 kv heads."""
    b, h, hkv, l, d = 1, 8, 2, 256, 128
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    q = jax.random.normal(ks[0], (b, h, l, d))
    k = jax.random.normal(ks[1], (b, hkv, l, d))
    v = jax.random.normal(ks[2], (b, hkv, l, d))
    ref = _causal_ref(q, k, v)
    out = flash_attention(q, k, v, causal=True, interpret=True,
                          block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_causal_suffix_padding_equivalence():
    """The kernel's no-mask argument: suffix key padding is neutralized by
    the causal mask for every real row, so kernel(padded)[:n] must equal a
    dense causal+key-mask reference on the real rows."""
    n_real, l = 200, 256
    q, k, v = _qkv(1, 2, l, l, 128, seed=7)
    ref = _causal_ref(q, k, v, n_real=n_real)
    out = flash_attention(q, k, v, causal=True, interpret=True,
                          block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out)[:, :, :n_real],
                               np.asarray(ref)[:, :, :n_real],
                               atol=2e-5, rtol=1e-4)


def test_causal_7b_lm_shape():
    """The real Qwen2.5-VL decoder shape (28 q heads / 4 kv heads,
    head_dim 128) through the kernel path (VERDICT r2 next #2)."""
    b, h, hkv, l, d = 1, 28, 4, 640, 128
    ks = jax.random.split(jax.random.PRNGKey(8), 3)
    q = jax.random.normal(ks[0], (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, hkv, l, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, hkv, l, d), jnp.bfloat16)
    ref = _causal_ref(q, k, v)
    out = flash_attention(q, k, v, causal=True, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_causal_rejects_kv_mask():
    q, k, v = _qkv(1, 1, 128, 128, 128)
    with pytest.raises(ValueError):
        flash_attention(q, k, v, kv_mask=jnp.ones((1, 128), bool),
                        causal=True, interpret=True)


def test_gqa_noncausal_matches_reference():
    """GQA through the non-causal resident kernel (joint-stream style)."""
    b, h, hkv, l, d = 1, 4, 2, 256, 128
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(ks[0], (b, h, l, d))
    k = jax.random.normal(ks[1], (b, hkv, l, d))
    v = jax.random.normal(ks[2], (b, hkv, l, d))
    ref = reference_attention(q, jnp.repeat(k, 2, axis=1),
                              jnp.repeat(v, 2, axis=1))
    out = flash_attention(q, k, v, interpret=True, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_lm_forward_flash_matches_xla(tiny_preset):
    """lm_forward's two dispatch paths (grouped-einsum XLA vs causal flash
    kernel in interpret mode) agree on the same params/inputs."""
    from qwen_image_edit_streamdiffusion_tpu.models import qwen_vl

    # head_dim must be 128 for the kernel: widen the tiny LM config
    import dataclasses

    cfg = dataclasses.replace(
        tiny_preset.vl, hidden_size=512, num_heads=4, num_kv_heads=2,
        intermediate_size=256, mrope_sections=(16, 24, 24),
        dtype="float32",
    )
    params = qwen_vl.lm_init(jax.random.PRNGKey(0), cfg)
    l = 160
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(rng.standard_normal((l, 512)), jnp.float32)
    pos = np.arange(l)[None, :].repeat(3, axis=0)
    cos, sin = qwen_vl._mrope_tables(cfg, pos)
    mask = np.ones((l,), bool)
    mask[150:] = False  # suffix padding
    ref = qwen_vl.lm_forward(params, cfg, embeds, jnp.asarray(cos),
                             jnp.asarray(sin), jnp.asarray(mask),
                             use_flash=False)
    # monkeypatch-free: call the kernel path directly via interpret mode
    from qwen_image_edit_streamdiffusion_tpu.ops import flash_attention as fa
    import functools
    orig = fa.flash_attention
    fa.flash_attention = functools.partial(orig, interpret=True)
    try:
        import unittest.mock as mock

        with mock.patch.object(qwen_vl, "_flash_on_tpu", lambda: True):
            out = qwen_vl.lm_forward(params, cfg, embeds, jnp.asarray(cos),
                                     jnp.asarray(sin), jnp.asarray(mask),
                                     use_flash=True)
    finally:
        fa.flash_attention = orig
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[:150],
        np.asarray(ref, np.float32)[:150],
        atol=5e-4, rtol=1e-3,
    )


def test_fallback_warns_once():
    from qwen_image_edit_streamdiffusion_tpu.ops import attention as am

    q = jnp.zeros((1, 1, 8, 96), jnp.float32)
    am._warned_shapes.clear()
    import warnings
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        am._warn_fallback_once(q)
        am._warn_fallback_once(q)
    assert len(w) == 1 and "flash attention unsupported" in str(w[0].message)


@pytest.mark.parametrize("pipelined", [True, False])
def test_pipelined_bulk_matches_reference(pipelined):
    """Software-pipelined unmasked bulk (QIE_FLASH_PIPELINE): block j+1's
    QK^T issues before block j's softmax chain — exact same math,
    reordered. Masked text prefix + block-padding tail force all three
    loop ranges (masked lo / pipelined bulk / masked hi)."""
    b, h, lq, lk, d = 1, 2, 256, 1000, 128  # lk pads to 1024 → masked tail
    q, k, v = _qkv(b, h, lq, lk, d, seed=5)
    mask = jnp.asarray(np.arange(lk)[None, :] >= 64).repeat(b, 0)
    ref = reference_attention(q, k, v, kv_mask=mask)
    out = flash_attention(q, k, v, kv_mask=mask, mask_len=128,
                          interpret=True, block_q=128, block_k=128,
                          pipelined=pipelined)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
