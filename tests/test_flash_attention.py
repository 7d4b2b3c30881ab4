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
