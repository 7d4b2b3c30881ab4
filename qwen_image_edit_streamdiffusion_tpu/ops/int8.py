"""INT8 quantized linear path: fused quantize → int8 GEMM → dequantize.

One Pallas kernel family replaces all four of the reference's GPU int8
surfaces (SURVEY.md §2.3 N4/N5/N6/N9: cuBLAS-Lt via CuPy, Triton fused
GEMM, torch._int_mm, BitsAndBytes):

- weights: per-output-channel symmetric int8 (absmax), quantized offline;
- activations: per-(row, k-block) symmetric int8, quantized *inside* the
  GEMM kernel (no separate pass, no int8 activation tensor in HBM);
- accumulation int32 on the MXU, dequant to f32 with the two scales fused
  into the epilogue, output in the activation dtype.

The XLA fallback (``int8_matmul_xla``) keeps CPU/tests runnable and is the
numerical reference for the kernel test.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class QuantizedLinear(NamedTuple):
    """Per-output-channel int8 weight. w_q: (in, out) int8; scale: (out,) f32;
    b: optional (out,) bias in compute dtype."""

    w_q: jnp.ndarray
    scale: jnp.ndarray
    b: Optional[jnp.ndarray] = None


def quantize_weight(w: jnp.ndarray) -> QuantizedLinear:
    """(in, out) float weight → symmetric per-output-channel int8."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=0)  # (out,)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return QuantizedLinear(w_q=w_q, scale=scale)


# ---------------------------------------------------------------------------
# INT4 (group-wise) — replaces the reference's BitsAndBytes NF4 ladder
# (test_quantized.py:46-51): ~75% weight-memory reduction, bf16 compute.
# ---------------------------------------------------------------------------

INT4_GROUP = 64  # input-dim group size for scales


def quantize_weight_int4(w: jnp.ndarray, group: int = INT4_GROUP):
    """(in, out) float → {packed (in/2, out) uint8 nibbles, scales
    (in/group, out) f32}. Symmetric signed 4-bit in [-7, 7] with per-
    (input-group, output-channel) scales. ``in`` must be divisible by
    max(group, 2)."""
    kin, out = w.shape
    if kin % group or kin % 2:
        raise ValueError(f"in_dim {kin} not divisible by group {group}")
    w32 = w.astype(jnp.float32).reshape(kin // group, group, out)
    absmax = jnp.max(jnp.abs(w32), axis=1)  # (groups, out)
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(w32 / scale[:, None, :]), -7, 7)
    q = q.reshape(kin, out).astype(jnp.int8) + 8  # [1, 15] unsigned nibbles
    lo = q[0::2].astype(jnp.uint8)
    hi = q[1::2].astype(jnp.uint8)
    packed = (lo | (hi << 4)).astype(jnp.uint8)  # (in/2, out)
    return {"w_q4": packed, "scale4": scale}


def dequantize_int4(packed: jnp.ndarray, scale: jnp.ndarray,
                    dtype=jnp.bfloat16, group: int = INT4_GROUP) -> jnp.ndarray:
    """Inverse of quantize_weight_int4 → (in, out) weight in ``dtype``.

    The arithmetic runs directly in ``dtype``: nibble values (±7) are
    exact in bf16 and the scale cast costs ~0.4% relative — noise next to
    int4's quantization step — while the materialized dequant temps XLA
    cannot fuse into the MXU dot are HALF the bytes of an f32
    intermediate. At 20B scale that is the difference between the 2-chip
    serving loop fitting and exceeding HBM by 31 MB (lower_full --int4)."""
    half, out = packed.shape
    kin = half * 2
    lo = (packed & 0xF).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    q = jnp.stack([lo, hi], axis=1).reshape(kin, out).astype(dtype)
    w = q.reshape(kin // group, group, out) * scale[:, None, :].astype(dtype)
    return w.reshape(kin, out)


def int4_linear(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Weight-only int4 matmul: dequant (fused by XLA into the consumer)
    then bf16 MXU GEMM. Saves HBM *capacity* (the fit-the-model goal of the
    reference's NF4 path), not bandwidth.

    The optimization barrier ties each layer's dequant to its activation:
    without it XLA's latency-hiding scheduler prefetches every layer's
    dequantized bf16 weight ahead of time, so all ~60 blocks' weight temps
    coexist (11 GB/chip at 20B — the 2-chip loop EXCEEDS HBM); sequenced,
    buffer assignment reuses one dequant temp per live layer."""
    packed, x = jax.lax.optimization_barrier((p["w_q4"], x))
    w = dequantize_int4(packed, p["scale4"], dtype=x.dtype)
    y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if p.get("b") is not None and "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# XLA fallback / reference
# ---------------------------------------------------------------------------


def int8_matmul_xla(x: jnp.ndarray, q: QuantizedLinear) -> jnp.ndarray:
    """Row-wise dynamic activation quant + int8 GEMM in plain XLA."""
    x32 = x.astype(jnp.float32)
    x_absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    x_scale = jnp.maximum(x_absmax, 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, q.w_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_scale * q.scale
    if q.b is not None:
        out = out + q.b.astype(jnp.float32)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel: quantize-once + int8-resident GEMM (the sole Pallas
# generation — an earlier single-pass per-(row, k-block) variant was pruned
# after measuring parity; see the int8 roofline decision in CLAUDE.md)
# ---------------------------------------------------------------------------


def _quantize_rows_kernel(x_ref, xq_ref, scale_ref):
    """Row-wise symmetric int8 quantization of one (bm, K) block."""
    x = x_ref[:].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    xq_ref[:] = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    scale_ref[:] = scale


def quantize_rows_pallas(x: jnp.ndarray, block_m: int = 256,
                         interpret: bool = False):
    """(M, K) float → ((M, K) int8, (M, 1) f32 scales), one pass."""
    m, k = x.shape
    bm = min(block_m, max(8, 1 << (m - 1).bit_length()))
    pad = (-m) % bm
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    mp = xp.shape[0]
    xq, scale = pl.pallas_call(
        _quantize_rows_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((mp, k), jnp.int8),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ),
        grid=(mp // bm,),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(xp)
    return xq[:m], scale[:m]


def _int8_gemm_v2_kernel(xq_ref, xscale_ref, wq_ref, wscale_ref, o_ref,
                         acc_ref):
    """Grid (M/bm, N/bn, K/bk). Pure int8×int8→int32 MXU accumulation —
    scales applied once in the epilogue (exact: int32 never overflows for
    K ≤ 2^17 at |q|≤127).

    xq_ref: (bm, bk) int8; xscale_ref: (bm, 1) f32; wq_ref: (bk, bn) int8;
    wscale_ref: (1, bn) f32; acc_ref: (bm, bn) int32 scratch.
    """
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        xq_ref[:], wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k_idx == nk - 1)
    def _():
        out = acc_ref[:].astype(jnp.float32)
        out = out * xscale_ref[:] * wscale_ref[0, :][None, :]
        o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "interpret", "out_dtype"))
def int8_matmul_pallas_v2(
    x_q: jnp.ndarray,
    x_scale: jnp.ndarray,
    w_q: jnp.ndarray,
    w_scale: jnp.ndarray,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Pre-quantized GEMM: x_q (M,K) int8 · w_q (K,N) int8 → (M,N) out_dtype.

    Reads are int8 (half the bandwidth of bf16 x), the MXU runs its 2×
    int8 path, and the accumulator stays int32 until one f32 epilogue.
    """
    m, k = x_q.shape
    n = w_q.shape[1]
    bm = min(block_m, max(32, 1 << (m - 1).bit_length()))
    bn = min(block_n, max(128, 1 << (n - 1).bit_length()))
    bk = min(block_k, max(128, 1 << (k - 1).bit_length()))

    def pad(a, axis, mult):
        p = (-a.shape[axis]) % mult
        if p == 0:
            return a
        w = [(0, 0)] * a.ndim
        w[axis] = (0, p)
        return jnp.pad(a, w)

    xp = pad(pad(x_q, 0, bm), 1, bk)
    sp_x = pad(x_scale.astype(jnp.float32), 0, bm)
    wp = pad(pad(w_q, 0, bk), 1, bn)
    sp_w = pad(w_scale.reshape(1, -1).astype(jnp.float32), 1, bn)
    mp, kp = xp.shape
    np_ = wp.shape[1]

    out = pl.pallas_call(
        _int8_gemm_v2_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        grid=(mp // bm, np_ // bn, kp // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * np_ * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, sp_x, wp, sp_w)
    return out[:m, :n]


def int8_linear_v2(x: jnp.ndarray, q: QuantizedLinear,
                   interpret: bool = False) -> jnp.ndarray:
    """Quantize-once + int8-resident GEMM (Pallas v2 path)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    x_q, x_scale = quantize_rows_pallas(x2, interpret=interpret)
    out = int8_matmul_pallas_v2(x_q, x_scale, q.w_q, q.scale,
                                interpret=interpret, out_dtype=x.dtype)
    if q.b is not None:
        out = out + q.b.astype(out.dtype)
    return out.reshape(*lead, -1)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def int8_linear(x: jnp.ndarray, q: QuantizedLinear,
                use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """Quantized replacement for ``common.linear``: (..., in) → (..., out).

    Default path is XLA (row-wise activation quant + native int8 dot):
    measured end-to-end on v5e it holds within ~6% of bf16 at 50% weight
    memory; the fused Pallas v2 kernel (quantize-once, int8-resident)
    matches it. Set QIE_INT8_PALLAS=1 to use the Pallas kernel.

    int8 is the MEMORY option, not a speed path, by measurement: the bf16
    GEMMs already run at ~89% of MXU peak and are compute- (not HBM-)
    bound, while attention — the majority of the model call — is bound by
    f32 score traffic that int8 weights cannot touch. Full roofline
    numbers in CLAUDE.md ("int8 roofline decision").
    """
    if use_pallas is None:
        import os

        use_pallas = _on_tpu() and os.environ.get("QIE_INT8_PALLAS") == "1"
    if use_pallas:
        return int8_linear_v2(x, q)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    return int8_matmul_xla(x2, q).reshape(*lead, -1)
