"""Pallas TPU flash attention for the MMDiT joint stream.

Replaces the reference's attention stack (SURVEY.md §2.3 N1/N8: cuDNN SDPA;
xformers was found incompatible with the Qwen transformer) with a single
online-softmax kernel designed for this workload:

- joint [txt ⊕ img] sequences of ~4k-9k tokens (1024² → 4096 target +
  4096 condition + text) — K/V for one (batch, head) fit comfortably in
  VMEM, so the kernel streams q blocks over the full K/V with a fori_loop
  over k blocks (no HBM re-reads of Q, single pass over K/V),
- optional key-side padding mask (bucketed text lengths never retrace),
- bf16 in / f32 online-softmax accumulators / input-dtype out.

Numerics: exact attention (not approximate) — same math as the XLA
reference path, verified bit-close in tests via interpret mode.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
# softmax runs in the base-2 domain: log2(e) is folded into the one-time q
# prescale so the per-element transcendental is exp2 (one VPU op) instead
# of exp (which lowers to exp2 + a multiply per element)
_LOG2E = 1.4426950408889634

# 512/512 measured fastest at the 1024² joint shape (7.3 ms vs 7.6 at
# 256/512; smaller k-blocks are strictly worse — the kernel is bound by
# f32 score traffic through VMEM, so fewer/larger blocks win)
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, block_k,
                  num_heads, n_masked_lo, n_unmasked_hi,
                  score_dtype=jnp.float32, pipelined=False):
    """One (batch·head, q-block) program: online softmax over k blocks.

    q_ref: (1, bq, D); k_ref/v_ref: (1, Lk, D); o_ref: (1, bq, D);
    mask_ref: the FULL (B, Lk) int8 mask — a (1, Lk) block would violate
    the TPU tiling rule (second-to-last block dim must be 8-divisible or
    equal the array dim) whenever B > 1, so each program takes the whole
    (tiny) mask and row-indexes by batch = program // num_heads.

    The softmax is VPU-bound, so per-element work is pruned statically:
    - both dots run bf16-in/f32-accumulate on the MXU (no f32 upcasts);
    - score_dtype=bfloat16 (QIE_FLASH_BF16_SCORES=1) additionally downcasts
      the QK^T scores to bf16 right after the MXU pass and runs the online
      max/sub in bf16 — halving vreg traffic through those VPU stages.
      The dot itself MUST keep preferred_element_type=f32: Mosaic rejects
      non-32-bit matmul accumulators on real TPUs ('tpu.matmul' op
      "Expected matmul acc to be 32-bit" — interpret mode accepts bf16,
      which is why only hardware caught it). Interpret-mode max-err 4.6e-3
      vs 2.9e-3 for f32 scores, inside the bf16 output resolution; the
      row-sum l and rescale alpha stay f32. Measured on v5e at the bench
      shape (L=8704, bq=bk=512): 5.42 ms vs 5.07 ms f32 — the downcast
      pass costs more than the bf16 max/sub saves, so f32 stays default
      and the option exists for experimentation only;
    - masking applies only to k-blocks that can contain invalid keys —
      [0, n_masked_lo) (the bucketed text prefix; image keys are always
      valid) and [n_unmasked_hi, nk) (block-size padding) — the bulk of
      the image blocks skip the select entirely.
    """
    bq = q_ref.shape[1]
    d = q_ref.shape[2]
    lk = k_ref.shape[1]
    nk = lk // block_k
    batch_row = pl.program_id(0) // num_heads

    # pre-scale once (softmax scale · log2e → base-2 softmax domain); cast
    # back so the QK^T dot is a bf16 MXU pass
    q = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)

    def dot_qk(j):
        k_blk = k_ref[0, pl.ds(j * block_k, block_k), :]  # (bk, D)
        return jax.lax.dot_general(
            q, k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(score_dtype)  # (bq, bk) score_dtype

    def consume(s, j, acc, m, l):
        v_blk = v_ref[0, pl.ds(j * block_k, block_k), :]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # exp2 at the VALUE precision (p multiplies bf16 V anyway, and
        # was cast to it before the dot regardless): for bf16 inputs
        # this halves the vregs through the transcendental + sum —
        # the kernel's VPU bottleneck. f32 inputs keep exact math.
        p = jnp.exp2((s - m_new).astype(v_blk.dtype))  # (bq, bk)
        alpha = jnp.exp2((m - m_new).astype(jnp.float32))  # (bq, 1)
        l_new = l * alpha + jnp.sum(
            p, axis=-1, keepdims=True, dtype=jnp.float32
        )
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    def make_body(masked):
        def body(j, carry):
            acc, m, l = carry
            s = dot_qk(j)
            if masked:
                # int8 sublane loads can't use a dynamic row index (Mosaic
                # needs a provable multiple-of-4); load all B rows and
                # select arithmetically
                mask_all = mask_ref[:, pl.ds(j * block_k, block_k)]
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, mask_all.shape, 0
                )
                mask_blk = jnp.max(
                    jnp.where(rows == batch_row,
                              mask_all.astype(jnp.int32), 0),
                    axis=0,
                )  # (bk,)
                s = jnp.where(mask_blk[None, :] != 0, s,
                              jnp.asarray(_NEG_INF, score_dtype))
            return consume(s, j, acc, m, l)

        return body

    carry = (
        jnp.zeros((bq, d), jnp.float32),
        jnp.full((bq, 1), _NEG_INF, score_dtype),
        jnp.zeros((bq, 1), jnp.float32),
    )
    lo, hi = n_masked_lo, max(n_masked_lo, n_unmasked_hi)
    carry = jax.lax.fori_loop(0, lo, make_body(True), carry)
    if pipelined and hi - lo >= 2:
        # Software-pipelined steady state over the unmasked bulk: block
        # j+1's QK^T dot (MXU, depends only on q/K) issues BEFORE block j's
        # softmax chain (VPU, depends on the carried running max) — the
        # two have no data dependence, so Mosaic can overlap the next dot
        # with the current max/exp2/sum instead of serializing MXU and VPU
        # each iteration (the ~2x gap in the denoise-loop roofline).
        def body_p(j, c):
            acc, m, l, s_cur = c
            s_next = dot_qk(j + 1)
            acc, m, l = consume(s_cur, j, acc, m, l)
            return acc, m, l, s_next

        acc, m, l, s_last = jax.lax.fori_loop(
            lo, hi - 1, body_p, (*carry, dot_qk(lo))
        )
        carry = consume(s_last, hi - 1, acc, m, l)
    else:
        carry = jax.lax.fori_loop(lo, hi, make_body(False), carry)
    carry = jax.lax.fori_loop(hi, nk, make_body(True), carry)
    acc, m, l = carry
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_kernel_causal(q_ref, k_ref, v_ref, o_ref, *, block_q, block_k,
                         score_dtype=jnp.float32):
    """One (batch·q-head, q-block) program: causal online softmax.

    Built for the Qwen2.5-VL language model (VERDICT r2 next #2): decoder
    attention over ~0.3-1k-token prompts. q arrives pre-scaled
    (d^-1/2·log2e folded in by the caller — base-2 softmax domain).

    Block-level causal pruning with *dynamic* loop bounds from the q-block
    index: blocks entirely below the diagonal run maskless; only the
    O(bq/bk) diagonal blocks pay the elementwise row≥col select; blocks
    above the diagonal are never read. No key-padding mask is needed:
    padding is a suffix, and for every real row r < n_real each padded key
    column c ≥ n_real > r is already causally masked.

    GQA is handled OUTSIDE via the k/v BlockSpec index maps (q head →
    shared kv head), so K/V are never materialized per-q-head.
    """
    qi = pl.program_id(1)
    bq = q_ref.shape[1]
    d = q_ref.shape[2]
    nk = k_ref.shape[1] // block_k
    q0 = qi * block_q  # global row offset of this q block

    q = q_ref[0]  # pre-scaled by the caller

    def make_body(diag):
        def body(j, carry):
            acc, m, l = carry
            k_blk = k_ref[0, pl.ds(j * block_k, block_k), :]
            v_blk = v_ref[0, pl.ds(j * block_k, block_k), :]
            s = jax.lax.dot_general(
                q, k_blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(score_dtype)  # (bq, bk) score_dtype
            if diag:
                rows = q0 + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, block_k), 0
                )
                cols = j * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, block_k), 1
                )
                s = jnp.where(cols <= rows, s,
                              jnp.asarray(_NEG_INF, score_dtype))

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2((s - m_new).astype(v_blk.dtype))
            alpha = jnp.exp2((m - m_new).astype(jnp.float32))
            l_new = l * alpha + jnp.sum(
                p, axis=-1, keepdims=True, dtype=jnp.float32
            )
            acc_new = acc * alpha + jax.lax.dot_general(
                p, v_blk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc_new, m_new, l_new

        return body

    # fully-visible blocks: last col (j+1)·bk − 1 ≤ q0 ⇔ j < q0 // bk + 1
    # iff divisible; q0 % bk == 0 or bk > bq both reduce to q0 // bk
    n_full = q0 // block_k
    # last block any row of this q block can see
    n_causal = jnp.minimum((q0 + bq + block_k - 1) // block_k, nk)
    carry = (
        jnp.zeros((bq, d), jnp.float32),
        jnp.full((bq, 1), _NEG_INF, score_dtype),
        jnp.zeros((bq, 1), jnp.float32),
    )
    carry = jax.lax.fori_loop(0, n_full, make_body(False), carry)
    carry = jax.lax.fori_loop(n_full, n_causal, make_body(True), carry)
    acc, m, l = carry
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def fits_resident(k: jnp.ndarray) -> bool:
    """True when K/V for one (batch, head) fit the resident kernel's VMEM
    budget (~6 MB of the ~16 MB/core). Larger sequences (e.g. two 1024²
    condition images) run the HBM-streaming kernel instead."""
    lk, d = k.shape[2], k.shape[3]
    kv_bytes = 2 * lk * d * jnp.dtype(k.dtype).itemsize
    return kv_bytes <= 6 * 1024 * 1024


def supported(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> bool:
    """Shape gate for either kernel variant: lane-aligned head_dim."""
    return q.shape[-1] % 128 == 0


# --------------------------------------------------------------------------
# HBM-streaming variant: K/V stay in HBM and stream through a double-
# buffered VMEM slot pair, once per (head, q-block) — for joint
# sequences whose K/V exceed the resident kernel's VMEM budget
# (VERDICT r1 weak #5: the multi-condition-image 1024² shape silently
# lost the flash win). One q block per program: q rounds up only to the
# block size (a 4096-row superblock grouping measured 23% padding waste
# at L=12544), and the per-block K/V re-stream is fully hidden by the
# double buffer (~8 µs DMA vs ~60 µs of dots per k-block).
# --------------------------------------------------------------------------

DEFAULT_STREAM_BLOCK_Q = 512  # less q padding waste at non-multiple L
DEFAULT_STREAM_BLOCK_K = 1024  # measured 10.9 ms @L=12544 vs 19.3 at bk=512


def _kv_dma(kv_hbm, kv_v, sem, bh, j, slot, which, block_k):
    return pltpu.make_async_copy(
        kv_hbm.at[bh, pl.ds(j * block_k, block_k), :],
        kv_v.at[slot, which], sem.at[slot, which],
    )


def _flash_kernel_hbm(q_ref, k_hbm, v_hbm, mask_ref, o_ref,
                      kv_v, sem, *, block_k, num_heads, kv_heads,
                      n_masked_lo, n_unmasked_hi,
                      score_dtype=jnp.float32):
    """q_ref/o_ref: (1, bq, D) VMEM; k_hbm/v_hbm: (B·Hkv, Lk, D) in HBM;
    kv_v: (2, 2, bk, D) double-buffered K/V slots. Online-softmax carry
    lives in registers (same as the resident kernel). q arrives pre-scaled
    (d^-1/2 · log2e folded in by the caller). GQA: the program's q head
    maps onto its shared kv row (kv_heads == num_heads ⇒ identity)."""
    bh = pl.program_id(0)
    lk = k_hbm.shape[1]
    d = q_ref.shape[2]
    nk = lk // block_k
    batch_row = bh // num_heads
    rep = num_heads // kv_heads
    kv_bh = batch_row * kv_heads + (bh % num_heads) // rep

    q = q_ref[0]  # (bq, D)

    def start(j, slot):
        _kv_dma(k_hbm, kv_v, sem, kv_bh, j, slot, 0, block_k).start()
        _kv_dma(v_hbm, kv_v, sem, kv_bh, j, slot, 1, block_k).start()

    def wait(j, slot):
        _kv_dma(k_hbm, kv_v, sem, kv_bh, j, slot, 0, block_k).wait()
        _kv_dma(v_hbm, kv_v, sem, kv_bh, j, slot, 1, block_k).wait()

    @pl.when(nk > 0)
    def _first():
        start(0, 0)

    def make_body(masked):
        def body(j, carry):
            acc, m, l = carry
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < nk)
            def _prefetch():
                start(j + 1, 1 - slot)

            wait(j, slot)
            k_blk = kv_v[slot, 0]  # (bk, D)
            v_blk = kv_v[slot, 1]
            s = jax.lax.dot_general(
                q, k_blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(score_dtype)
            if masked:
                mask_all = mask_ref[:, pl.ds(j * block_k, block_k)]
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, mask_all.shape, 0
                )
                mask_blk = jnp.max(
                    jnp.where(rows == batch_row,
                              mask_all.astype(jnp.int32), 0),
                    axis=0,
                )  # (bk,)
                s = jnp.where(mask_blk[None, :] != 0, s,
                              jnp.asarray(_NEG_INF, score_dtype))

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2((s - m_new).astype(v_blk.dtype))
            alpha = jnp.exp2((m - m_new).astype(jnp.float32))
            l_new = l * alpha + jnp.sum(
                p, axis=-1, keepdims=True, dtype=jnp.float32
            )
            acc_new = acc * alpha + jax.lax.dot_general(
                p, v_blk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc_new, m_new, l_new

        return body

    bq = q_ref.shape[1]
    carry = (
        jnp.zeros((bq, d), jnp.float32),
        jnp.full((bq, 1), _NEG_INF, score_dtype),
        jnp.zeros((bq, 1), jnp.float32),
    )
    carry = jax.lax.fori_loop(0, n_masked_lo, make_body(True), carry)
    carry = jax.lax.fori_loop(
        n_masked_lo, max(n_masked_lo, n_unmasked_hi), make_body(False), carry
    )
    carry = jax.lax.fori_loop(
        max(n_masked_lo, n_unmasked_hi), nk, make_body(True), carry
    )
    acc, m, l = carry
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


# resident-kernel score precision default: f32 (exact) unless opted into
# bf16 scores, which halve the remaining f32 VPU traffic (max/sub) per
# score element — read once at import so jit caching stays coherent
_BF16_SCORES = os.environ.get("QIE_FLASH_BF16_SCORES", "") == "1"
# software-pipelined unmasked bulk (next block's QK^T issued ahead of the
# current softmax chain, exposing MXU/VPU overlap to the compiler).
# MEASURED SLOWER on v5e at L=8704: 6.0-7.7 ms across block configs vs
# 5.1 ms serial — Mosaic does not schedule the independent dot against the
# VPU chain, and the loop-carried (bq, bk) f32 score block adds vreg/VMEM
# pressure instead. Kept as a flag because it is the natural next
# experiment anyone profiling this kernel would reach for; the measured
# answer is "no" (see CLAUDE.md denoise-loop roofline).
_PIPELINE = os.environ.get("QIE_FLASH_PIPELINE", "0") == "1"


# --------------------------------------------------------------------------
# Training path: custom VJP with FlashAttention-2-style backward kernels.
#
# The reference never trains (SURVEY §5.4 "inference-only"); this exists for
# the LoRA fine-tune harness (training/lora_train.py) so the 20B train step
# keeps the flash memory profile — the XLA backward would materialize the
# (L, L) score matrix per block (~7 GB/layer at the 1024² joint shape) and
# the train step would not fit a v5e chip group.
#
# Math: the forward runs softmax in the base-2 domain with q pre-scaled by
# d^-1/2·log2(e), carrying the running max m and row-sum l in that domain;
# the saved residual is LSE₂ = m + log2(l), so P = exp2(S₂ − LSE₂) is
# recomputed per block in the backward (never stored). With S_nat = S₂·ln2:
#   dS_nat = P ⊙ (dP − Δ),  Δ = rowsum(dO ⊙ O)
#   dq = (dS_nat @ K)·scale          (K raw)
#   dk = (dS_natᵀ @ Q_pre)·ln2       (Q_pre = q·scale·log2e — ·ln2 undoes it
#                                     up to the ·scale the gradient needs)
#   dv = Pᵀ @ dO
# Both backward kernels use the reduction-grid pattern: the innermost grid
# dimension sweeps the contraction blocks while the output block index stays
# fixed, so Mosaic keeps the f32 accumulator resident in VMEM across the
# sweep and every operand is a small double-buffered block (no full-K/V
# residency — the backward also covers sequences the resident forward
# kernel cannot hold).
# --------------------------------------------------------------------------

# lane-broadcast width for per-row LSE/Δ side arrays: f32 min tile is
# (8, 128), so scalars-per-row are stored broadcast across one 128-lane
# register (the layout jax.experimental.pallas.ops.tpu.flash_attention uses)
_LANES = 128


def _flash_kernel_fwd_lse(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *,
                          scale, block_k, num_heads, n_masked_lo,
                          n_unmasked_hi):
    """Resident forward + LSE residual for the VJP (mirrors _flash_kernel
    with score_dtype=f32; emits LSE₂ = m + log2(l) per q row)."""
    bq = q_ref.shape[1]
    d = q_ref.shape[2]
    lk = k_ref.shape[1]
    nk = lk // block_k
    batch_row = pl.program_id(0) // num_heads

    q = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)

    def make_body(masked):
        def body(j, carry):
            acc, m, l = carry
            k_blk = k_ref[0, pl.ds(j * block_k, block_k), :]
            v_blk = v_ref[0, pl.ds(j * block_k, block_k), :]
            s = jax.lax.dot_general(
                q, k_blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if masked:
                mask_all = mask_ref[:, pl.ds(j * block_k, block_k)]
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, mask_all.shape, 0
                )
                mask_blk = jnp.max(
                    jnp.where(rows == batch_row,
                              mask_all.astype(jnp.int32), 0),
                    axis=0,
                )
                s = jnp.where(mask_blk[None, :] != 0, s, _NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2((s - m_new).astype(v_blk.dtype))
            alpha = jnp.exp2(m - m_new)
            l_new = l * alpha + jnp.sum(
                p, axis=-1, keepdims=True, dtype=jnp.float32
            )
            acc_new = acc * alpha + jax.lax.dot_general(
                p, v_blk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc_new, m_new, l_new

        return body

    carry = (
        jnp.zeros((bq, d), jnp.float32),
        jnp.full((bq, 1), _NEG_INF, jnp.float32),
        jnp.zeros((bq, 1), jnp.float32),
    )
    lo, hi = n_masked_lo, max(n_masked_lo, n_unmasked_hi)
    carry = jax.lax.fori_loop(0, lo, make_body(True), carry)
    carry = jax.lax.fori_loop(lo, hi, make_body(False), carry)
    carry = jax.lax.fori_loop(hi, nk, make_body(True), carry)
    acc, m, l = carry
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    # fully-masked rows (cannot happen for the joint stream — image keys
    # are never masked — but keep the backward safe): LSE = +big ⇒ P ≡ 0
    lse = jnp.where(l > 0.0, m + jnp.log2(jnp.maximum(l, 1e-30)), 1e30)
    lse_ref[0] = jnp.broadcast_to(lse, (bq, _LANES))


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         mask_ref, dq_ref, *, scale, block_k, num_heads,
                         n_masked_lo, n_unmasked_hi):
    """Grid (B·H, nq, nk) — nk innermost, dq block accumulates in VMEM.

    q_ref arrives PRE-SCALED (scale·log2e); k_ref is raw, so
    dq += (dS_nat @ K)·scale with the ·scale folded into dS before the
    bf16 cast feeding the MXU."""
    j = pl.program_id(2)
    batch_row = pl.program_id(0) // num_heads
    bq = q_ref.shape[1]

    @pl.when(j == 0)
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk)
    # the block index is a traced program id here (no fori bounds to prune
    # statically as the forward does), so the mask select runs on every
    # block gated by a cheap scalar predicate — backward is MXU-dominated
    # (3 dots/block), the extra VPU select is noise
    needs_mask = jnp.logical_or(j < n_masked_lo,
                                j >= max(n_masked_lo, n_unmasked_hi))
    mask_all = mask_ref[:, pl.ds(j * block_k, block_k)]
    rows = jax.lax.broadcasted_iota(jnp.int32, mask_all.shape, 0)
    mask_blk = jnp.max(
        jnp.where(rows == batch_row, mask_all.astype(jnp.int32), 0),
        axis=0,
    )
    dead = jnp.logical_and(needs_mask, mask_blk[None, :] == 0)
    s = jnp.where(dead, _NEG_INF, s)
    lse = lse_ref[0, :, 0:1]      # (bq, 1)
    delta = delta_ref[0, :, 0:1]  # (bq, 1)
    p = jnp.exp2(s - lse)
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    dq_ref[0] += jax.lax.dot_general(
        (ds * scale).astype(k_ref.dtype), k_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


_LN2 = 0.6931471805599453


def _flash_bwd_dkv_kernel(q_ref, do_ref, k_ref, v_ref, lse_ref, delta_ref,
                          mask_ref, dk_ref, dv_ref, *, block_k, num_heads,
                          n_masked_lo, n_unmasked_hi):
    """Grid (B·H, nk, nq) — nq innermost, dk/dv blocks accumulate in VMEM.

    q_ref arrives PRE-SCALED, so dk = (dS_natᵀ @ Q_pre)·ln2 (·ln2 cancels
    the log2e in Q_pre, leaving the ·scale the gradient needs)."""
    jk = pl.program_id(1)
    i = pl.program_id(2)
    batch_row = pl.program_id(0) // num_heads

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk)
    needs_mask = jnp.logical_or(jk < n_masked_lo,
                                jk >= max(n_masked_lo, n_unmasked_hi))
    mask_all = mask_ref[:, pl.ds(jk * block_k, block_k)]
    rows = jax.lax.broadcasted_iota(jnp.int32, mask_all.shape, 0)
    mask_blk = jnp.max(
        jnp.where(rows == batch_row, mask_all.astype(jnp.int32), 0), axis=0,
    )
    dead = jnp.logical_and(needs_mask, mask_blk[None, :] == 0)
    s = jnp.where(dead, _NEG_INF, s)

    lse = lse_ref[0, :, 0:1]
    delta = delta_ref[0, :, 0:1]
    p = jnp.exp2(s - lse)  # (bq, bk) f32
    dv_ref[0] += jax.lax.dot_general(
        p.astype(do_ref.dtype), do_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bk, d)
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    dk_ref[0] += jax.lax.dot_general(
        (ds * _LN2).astype(q_ref.dtype), q_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bk, d)


@functools.partial(
    jax.jit,
    static_argnames=("mask_len", "block_q", "block_k", "interpret"),
)
def _flash_fwd_lse(q, k, v, maskf, mask_len, block_q=None, block_k=None,
                   interpret=False):
    """Forward returning (out, lse₂) — the VJP's fwd. Same padding/pruning
    plumbing as the inference entry point; resident kernel only."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bq = min(block_q or DEFAULT_BLOCK_Q,
             max(128, 1 << (lq - 1).bit_length()))
    bk = min(block_k or DEFAULT_BLOCK_K,
             max(128, 1 << (lk - 1).bit_length()))
    qp = _pad_to(q.reshape(b * h, lq, d), 1, bq)
    kp = _pad_to(k.reshape(b * h, lk, d), 1, bk)
    vp = _pad_to(v.reshape(b * h, lk, d), 1, bk)
    lq_p, lk_p = qp.shape[1], kp.shape[1]
    nk = lk_p // bk
    mask = _pad_to((maskf > 0).astype(jnp.int8), 1, bk)
    bound = lk if mask_len is None else mask_len
    n_masked_lo = min(nk, -(-bound // bk))
    n_unmasked_hi = nk - 1 if lk_p > lk else nk
    scale = d ** -0.5
    cost = pl.CostEstimate(
        flops=4 * b * h * lq_p * lk_p * d,
        bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
        transcendentals=b * h * lq_p * lk_p,
    )
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel_fwd_lse, scale=scale, block_k=bk,
                          num_heads=h, n_masked_lo=n_masked_lo,
                          n_unmasked_hi=n_unmasked_hi),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, lq_p, _LANES), jnp.float32),
        ),
        grid=(b * h, lq_p // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_p, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_p, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, lk_p), lambda bh, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, _LANES), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(qp, kp, vp, mask)
    return out[:, :lq].reshape(b, h, lq, d), lse


@functools.partial(
    jax.jit,
    static_argnames=("mask_len", "block_q", "block_k", "interpret"),
)
def _flash_bwd(q, k, v, o, lse, g, maskf, mask_len, block_q=None,
               block_k=None, interpret=False):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bq = min(block_q or DEFAULT_BLOCK_Q,
             max(128, 1 << (lq - 1).bit_length()))
    bk = min(block_k or DEFAULT_BLOCK_K,
             max(128, 1 << (lk - 1).bit_length()))
    scale = d ** -0.5
    # identical prescale + rounding to the forward kernel's in-kernel pass,
    # so the recomputed P matches the forward's bit-for-bit
    qp = _pad_to(q.reshape(b * h, lq, d), 1, bq)
    qp = (qp.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    kp = _pad_to(k.reshape(b * h, lk, d), 1, bk)
    vp = _pad_to(v.reshape(b * h, lk, d), 1, bk)
    dop = _pad_to(g.reshape(b * h, lq, d), 1, bq)
    lq_p, lk_p = qp.shape[1], kp.shape[1]
    nq, nk = lq_p // bq, lk_p // bk
    mask = _pad_to((maskf > 0).astype(jnp.int8), 1, bk)
    bound = lk if mask_len is None else mask_len
    n_masked_lo = min(nk, -(-bound // bk))
    n_unmasked_hi = nk - 1 if lk_p > lk else nk

    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = _pad_to(delta.reshape(b * h, lq), 1, bq)
    delta = jnp.broadcast_to(delta[..., None], (b * h, lq_p, _LANES))

    common = dict(block_k=bk, num_heads=h, n_masked_lo=n_masked_lo,
                  n_unmasked_hi=n_unmasked_hi)
    bwd_cost = pl.CostEstimate(
        flops=8 * b * h * lq_p * lk_p * d,
        bytes_accessed=2 * (qp.size + kp.size + vp.size) * qp.dtype.itemsize,
        transcendentals=2 * b * h * lq_p * lk_p,
    )
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, **common),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d), jnp.float32),
        grid=(b * h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, qi, kj: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bh, qi, kj: (bh, kj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bh, qi, kj: (bh, kj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda bh, qi, kj: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, _LANES), lambda bh, qi, kj: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, _LANES), lambda bh, qi, kj: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, lk_p), lambda bh, qi, kj: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bh, qi, kj: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=bwd_cost,
        interpret=interpret,
    )(qp, kp, vp, dop, lse, delta, mask)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, **common),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, lk_p, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, lk_p, d), jnp.float32),
        ),
        grid=(b * h, nk, nq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, kj, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda bh, kj, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bh, kj, qi: (bh, kj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bh, kj, qi: (bh, kj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, _LANES), lambda bh, kj, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, _LANES), lambda bh, kj, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, lk_p), lambda bh, kj, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, d), lambda bh, kj, qi: (bh, kj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda bh, kj, qi: (bh, kj, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=bwd_cost,
        interpret=interpret,
    )(qp, dop, kp, vp, lse, delta, mask)

    dq = dq[:, :lq].reshape(b, h, lq, d).astype(q.dtype)
    dk = dk[:, :lk].reshape(b, h, lk, d).astype(k.dtype)
    dv = dv[:, :lk].reshape(b, h, lk, d).astype(v.dtype)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 5))
def _flash_diff(mask_len, q, k, v, maskf, interpret):
    return flash_attention(q, k, v, kv_mask=maskf > 0, mask_len=mask_len,
                           stream=False, interpret=interpret)


def _flash_diff_fwd(mask_len, q, k, v, maskf, interpret):
    out, lse = _flash_fwd_lse(q, k, v, maskf, mask_len, interpret=interpret)
    return out, (q, k, v, out, lse, maskf)


def _flash_diff_bwd(mask_len, interpret, res, g):
    q, k, v, out, lse, maskf = res
    dq, dk, dv = _flash_bwd(q, k, v, out, lse, g, maskf, mask_len,
                            interpret=interpret)
    return dq, dk, dv, jnp.zeros_like(maskf)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def flash_attention_trainable(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    mask_len: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable flash attention (resident variant, H == Hkv).

    Under plain evaluation this is exactly :func:`flash_attention`; under
    `jax.grad` the custom VJP recomputes P blockwise from the saved LSE and
    streams the FlashAttention-2 backward through the MXU — no (L, L)
    score materialization, so training keeps the inference memory profile.
    """
    if q.shape[1] != k.shape[1]:
        raise ValueError("trainable flash attention requires H == Hkv "
                         "(GQA backward not implemented)")
    if kv_mask is None:
        maskf = jnp.ones((q.shape[0], k.shape[2]), jnp.float32)
        mask_len = 0 if mask_len is None else mask_len
    else:
        maskf = kv_mask.astype(jnp.float32)
    return _flash_diff(mask_len, q, k, v, maskf, interpret)


def flash_attention_auto(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    mask_len: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Dispatcher used by ops.attention: the differentiable wrapper when
    the shape is eligible (resident K/V, H == Hkv — i.e. the MMDiT joint
    stream), the plain kernel otherwise (streaming/GQA shapes stay
    inference-only; differentiating them falls back to XLA upstream)."""
    if fits_resident(k) and q.shape[1] == k.shape[1]:
        return flash_attention_trainable(q, k, v, kv_mask=kv_mask,
                                         mask_len=mask_len,
                                         interpret=interpret)
    return flash_attention(q, k, v, kv_mask=kv_mask, mask_len=mask_len,
                           interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "interpret", "mask_len", "stream",
                     "causal", "bf16_scores", "pipelined"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: Optional[jnp.ndarray] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
    mask_len: Optional[int] = None,
    stream: Optional[bool] = None,
    causal: bool = False,
    bf16_scores: Optional[bool] = None,
    pipelined: Optional[bool] = None,
) -> jnp.ndarray:
    """q: (B, H, Lq, D); k,v: (B, Hkv, Lk, D) with H % Hkv == 0 (GQA — the
    kernel maps each q head onto its shared kv head via the BlockSpec index
    maps, never materializing repeated K/V); kv_mask: (B, Lk) bool (True =
    attend).

    mask_len: static upper bound on the key prefix that can contain
    invalid positions (the joint stream is [txt ⊕ img] and only the
    bucketed text prefix is ever padded). None = no bound (every block
    applies the mask). stream: force (True) / forbid (False) the
    HBM-streaming kernel; None picks by K/V VMEM footprint.
    causal=True runs the decoder kernel (block-pruned lower-triangular
    mask; requires Lq == Lk and that any key padding is a *suffix* — a
    padded key col ≥ n_real is then causally masked for every real row, so
    kv_mask must be None). block_q/block_k: None = per-variant measured
    defaults (512/512 resident, 512/1024 streaming). bf16_scores: bf16
    QK^T scores + bf16 online max/sub in every kernel variant (None = the
    QIE_FLASH_BF16_SCORES env default; ~1.6e-3 extra max-err, inside bf16
    output resolution; only applies to bf16 inputs). pipelined: software-
    pipeline the resident kernel's unmasked bulk — block j+1's QK^T dot
    issues before block j's softmax chain (exact same math, reordered;
    None = QIE_FLASH_PIPELINE env, default OFF — measured slower on v5e,
    see the module-level note).
    Returns (B, H, Lq, D) in q's dtype.
    """
    b, h, lq, d = q.shape
    hkv = k.shape[1]
    rep = h // hkv
    lk = k.shape[2]

    if causal:
        if kv_mask is not None:
            raise ValueError(
                "causal=True handles suffix key padding implicitly; "
                "kv_mask must be None"
            )
        resident = True
    else:
        resident = not stream if stream is not None else fits_resident(k)
    if resident:
        bq_def, bk_def = DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K
    else:
        bq_def, bk_def = DEFAULT_STREAM_BLOCK_Q, DEFAULT_STREAM_BLOCK_K
    bq = min(block_q or bq_def, max(128, 1 << (lq - 1).bit_length()))
    bk = min(block_k or bk_def, max(128, 1 << (lk - 1).bit_length()))

    qp = _pad_to(q.reshape(b * h, lq, d), 1, bq)
    kp = _pad_to(k.reshape(b * hkv, lk, d), 1, bk)
    vp = _pad_to(v.reshape(b * hkv, lk, d), 1, bk)
    lq_p, lk_p = qp.shape[1], kp.shape[1]
    nk = lk_p // bk

    scale = d ** -0.5
    use_bf16 = _BF16_SCORES if bf16_scores is None else bf16_scores
    score_dtype = (jnp.bfloat16 if use_bf16 and q.dtype == jnp.bfloat16
                   else jnp.float32)
    use_pipe = _PIPELINE if pipelined is None else pipelined
    cost = pl.CostEstimate(
        flops=4 * b * h * lq_p * lk_p * d,
        bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
        transcendentals=b * h * lq_p * lk_p,
    )

    # GQA-aware kv index map: q-head program row → its shared kv row
    def kv_index(bh, qi):
        return ((bh // h) * hkv + (bh % h) // rep, 0, 0)

    if causal:
        # pre-fold scale · log2e (base-2 softmax domain)
        qp = (qp.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
        out = pl.pallas_call(
            functools.partial(_flash_kernel_causal, block_q=bq, block_k=bk,
                              score_dtype=score_dtype),
            out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype),
            grid=(b * h, lq_p // bq),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda bh, qi: (bh, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lk_p, d), kv_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lk_p, d), kv_index,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda bh, qi: (bh, qi, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=cost,
            interpret=interpret,
        )(qp, kp, vp)
        return out[:, :lq].reshape(b, h, lq, d)

    if kv_mask is None:
        kv_mask = jnp.ones((b, lk), bool)
        bound = 0 if mask_len is None else mask_len
    else:
        bound = lk if mask_len is None else mask_len
    mask = _pad_to(kv_mask.astype(jnp.int8), 1, bk)  # (B, Lk_p)

    n_masked_lo = min(nk, -(-bound // bk))
    # block-size padding at the tail (padded via mask=0) must stay masked
    n_unmasked_hi = nk - 1 if lk_p > lk else nk

    if resident:
        out = pl.pallas_call(
            functools.partial(_flash_kernel, scale=scale, block_k=bk,
                              num_heads=h, n_masked_lo=n_masked_lo,
                              n_unmasked_hi=n_unmasked_hi,
                              score_dtype=score_dtype, pipelined=use_pipe),
            out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype),
            grid=(b * h, lq_p // bq),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda bh, qi: (bh, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lk_p, d), kv_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lk_p, d), kv_index,
                             memory_space=pltpu.VMEM),
                # full (B, Lk) mask in every program (see kernel docstring)
                pl.BlockSpec((b, lk_p), lambda bh, qi: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda bh, qi: (bh, qi, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=cost,
            interpret=interpret,
        )(qp, kp, vp, mask)
        return out[:, :lq].reshape(b, h, lq, d)

    # streaming variant: pre-fold the scale (· log2e — the kernel's softmax
    # runs in the base-2 domain)
    qp = (qp.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    out = pl.pallas_call(
        functools.partial(_flash_kernel_hbm, block_k=bk,
                          num_heads=h, kv_heads=hkv,
                          n_masked_lo=n_masked_lo,
                          n_unmasked_hi=n_unmasked_hi,
                          score_dtype=score_dtype),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype),
        grid=(b * h, lq_p // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # K stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # V stays in HBM
            pl.BlockSpec((b, lk_p), lambda bh, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, bk, d), q.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(qp, kp, vp, mask)
    return out[:, :lq].reshape(b, h, lq, d)
