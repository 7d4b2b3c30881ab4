"""INT8 quantized linear: weight quant error bounds, Pallas kernel vs XLA
reference (interpret mode), transformer param-tree swap, memory halving."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.models import common, quantize
from qwen_image_edit_streamdiffusion_tpu.models import transformer as tfm
from qwen_image_edit_streamdiffusion_tpu.ops import int8 as int8_ops


def test_quantize_weight_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 128)) * 0.02
    q = int8_ops.quantize_weight(w)
    assert q.w_q.dtype == jnp.int8
    deq = np.asarray(q.w_q, np.float32) * np.asarray(q.scale)
    err = np.abs(deq - np.asarray(w)).max()
    assert err <= np.abs(np.asarray(w)).max() / 127.0 + 1e-7


def test_xla_int8_matmul_close_to_fp():
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 256))
    w = jax.random.normal(jax.random.PRNGKey(2), (256, 128)) * 0.05
    q = int8_ops.quantize_weight(w)
    ref = np.asarray(x @ w)
    out = np.asarray(int8_ops.int8_matmul_xla(x, q))
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.02, f"relative error {rel}"


@pytest.mark.parametrize("m,k,n", [(128, 256, 128), (100, 300, 200)])
def test_pallas_kernel_matches_fp(m, k, n):
    x = jax.random.normal(jax.random.PRNGKey(3), (m, k))
    w = jax.random.normal(jax.random.PRNGKey(4), (k, n)) * 0.05
    q = int8_ops.quantize_weight(w)
    ref = np.asarray(x @ w)
    out = np.asarray(int8_ops.int8_linear_v2(x, q, interpret=True))
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.02, f"relative error {rel}"


def test_common_linear_dispatches_on_quantized(tiny_preset):
    p = common.linear_init(jax.random.PRNGKey(5), 64, 32, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 64))
    ref = np.asarray(common.linear(p, x))
    qp = quantize._quantize_leaf_dict(p)
    out = np.asarray(common.linear(qp, x))
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.05


def test_quantize_transformer_tree_and_memory(tiny_preset):
    cfg = tiny_preset.model
    params = tfm.init(jax.random.PRNGKey(0), cfg)
    qparams = quantize.quantize_transformer(params)
    blk = qparams["blocks"][0]
    assert "w_q" in blk["attn"]["img_q"]
    assert "w_q" in blk["img_mod"]  # modulation quantized too (~50% target)
    assert "w" in qparams["proj_out"]  # head untouched
    # bf16 → int8 on the block linears roughly halves their bytes
    orig = quantize.quantized_bytes(params)
    new = quantize.quantized_bytes(qparams)
    assert new < 0.75 * orig


def test_quantized_forward_runs_and_close(tiny_preset):
    cfg = tiny_preset.model
    params = tfm.init(jax.random.PRNGKey(0), cfg)
    qparams = quantize.quantize_transformer(params)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.in_channels))
    txt = jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.joint_dim))
    ropes = tfm.make_rope(cfg, [(1, 4, 4)], 8)
    t = jnp.full((1,), 500.0)
    ref = np.asarray(
        tfm.forward(params, cfg, img, txt, t, ropes, use_flash=False),
        np.float32,
    )
    out = np.asarray(
        tfm.forward(qparams, cfg, img, txt, t, ropes, use_flash=False),
        np.float32,
    )
    assert np.isfinite(out).all()
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.25, f"relative error {rel}"  # random weights are a
    # worst case for int8; real checkpoints land far tighter


def test_quantized_sharding_specs(tiny_preset):
    from jax.sharding import PartitionSpec as P

    from qwen_image_edit_streamdiffusion_tpu.parallel import sharding

    cfg = tiny_preset.model
    params = quantize.quantize_transformer(tfm.init(jax.random.PRNGKey(0), cfg))
    specs = sharding.transformer_param_specs(params)
    blk = specs["blocks"][0]
    assert blk["attn"]["img_q"]["w_q"] == P(None, "model")
    assert blk["attn"]["img_q"]["scale"] == P("model")
    assert blk["img_mlp"]["fc2"]["w_q"] == P("model", None)
    assert blk["img_mlp"]["fc2"]["scale"] == P()


def test_int4_quantize_roundtrip():
    from qwen_image_edit_streamdiffusion_tpu.ops.int8 import (
        dequantize_int4,
        quantize_weight_int4,
    )

    w = jax.random.normal(jax.random.PRNGKey(7), (128, 64)) * 0.05
    q = quantize_weight_int4(w)
    assert q["w_q4"].shape == (64, 64) and q["w_q4"].dtype == jnp.uint8
    deq = np.asarray(dequantize_int4(q["w_q4"], q["scale4"], jnp.float32))
    # 4-bit symmetric: per-group error bounded by scale/2
    scale_full = np.repeat(np.asarray(q["scale4"]), 64, axis=0)
    assert (np.abs(deq - np.asarray(w)) <= scale_full * 0.5 + 1e-6).all()


def test_int4_linear_dispatch_and_memory(tiny_preset):
    cfg = tiny_preset.model
    params = tfm.init(jax.random.PRNGKey(0), cfg)
    q4 = quantize.quantize_transformer(params, bits=4)
    blk = q4["blocks"][0]
    assert "w_q4" in blk["attn"]["img_q"]
    new = quantize.quantized_bytes(q4)
    orig = quantize.quantized_bytes(params)
    q8_bytes = quantize.quantized_bytes(quantize.quantize_transformer(params))
    assert new < 0.6 * orig  # tiny preset: mod/embeds unquantized dominate
    assert new < q8_bytes  # int4 strictly beats int8
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.in_channels))
    txt = jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.joint_dim))
    ropes = tfm.make_rope(cfg, [(1, 4, 4)], 8)
    out = np.asarray(
        tfm.forward(q4, cfg, img, txt, jnp.full((1,), 500.0), ropes,
                    use_flash=False), np.float32)
    assert np.isfinite(out).all()


def test_quantize_vl_tree_memory_and_encode(tiny_preset):
    """VL encoder int8 branch (VERDICT r2 next #1): block linears swap to
    w_q/scale, the embed table stays dense, bytes shrink, and the full
    encode still runs finite and close to the bf16 encode."""
    from qwen_image_edit_streamdiffusion_tpu.models import qwen_vl

    enc = qwen_vl.QwenVLEncoder(tiny_preset.vl, seed=0, max_len=64)
    qp = quantize.quantize_vl(enc.params)
    blk = qp["lm"]["blocks"][0]
    assert "w_q" in blk["q_proj"] and "w_q" in blk["mlp"]["down"]
    assert "w_q" in qp["vision"]["blocks"][0]["qkv"]
    assert qp["lm"]["embed"].dtype == enc.params["lm"]["embed"].dtype
    assert (quantize.quantized_bytes(qp)
            < quantize.quantized_bytes(enc.params))

    img = np.random.default_rng(0).integers(
        0, 255, (64, 64, 3)).astype(np.uint8)
    ref = enc.encode("oil painting", [img])
    enc_q = qwen_vl.QwenVLEncoder(tiny_preset.vl, params=qp, max_len=64)
    out = enc_q.encode("oil painting", [img])
    r = np.asarray(ref.embeds, np.float32)
    o = np.asarray(out.embeds, np.float32)
    assert np.isfinite(o).all()
    rel = np.abs(o - r).mean() / (np.abs(r).mean() + 1e-9)
    assert rel < 0.35, f"int8 VL encode deviates: {rel}"  # random weights
    # are the worst case; real checkpoints land far tighter


def test_pallas_v2_matches_xla():
    from qwen_image_edit_streamdiffusion_tpu.ops.int8 import (
        int8_linear_v2,
        int8_matmul_xla,
        quantize_weight,
    )

    x = jax.random.normal(jax.random.PRNGKey(8), (100, 256))
    w = jax.random.normal(jax.random.PRNGKey(9), (256, 200)) * 0.05
    q = quantize_weight(w)
    ref = np.asarray(int8_matmul_xla(x, q))
    out = np.asarray(int8_linear_v2(x, q, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)
    # identical quantization scheme → near-identical results
    rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 5e-3, f"v2 deviates from XLA reference: {rel}"
