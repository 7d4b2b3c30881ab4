"""Flash-attention kernel micro-benchmark / block-size sweep.

Times one joint-stream attention layer (the bench-2b 1024² shape by
default: B=1, H=12, L=4096 target + 4096 cond + 512 text = 8704, D=128)
across (block_q, block_k) configurations and against the XLA reference
path, using the tunnel-safe fetch-sync protocol (CLAUDE.md: on the axon
tunnel ``block_until_ready`` does not reliably block, so each sample is
serialized through a scan and synced with a device→host fetch).

  python -m qwen_image_edit_streamdiffusion_tpu.benchmarks.bench_flash \
      --l 8704 --heads 12 --iters 20

Reference analog: benchmark_optimizations.py's attention-backend sweep
(xformers vs SDPA, reference benchmark_optimizations.py:59-117).
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from qwen_image_edit_streamdiffusion_tpu.core.rng import split_keys

from qwen_image_edit_streamdiffusion_tpu.ops import flash_attention as fa
from qwen_image_edit_streamdiffusion_tpu.ops.attention import (
    reference_attention,
)


def _time_fn(fn, q, k, v, iters, reps=3):
    """Median of `reps` timings of `iters` serialized calls; returns ms/call.

    The attention output feeds back into q so XLA cannot parallelize or
    elide iterations; one leaf fetch at the end is the sync barrier.
    """

    @jax.jit
    def many(q, k, v):
        def body(c, _):
            o = fn(c, k, v)
            return o.astype(c.dtype), ()

        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out[0, 0, 0, :1]

    np.asarray(many(q, k, v))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(many(q, k, v))
        ts.append(time.time() - t0)
    return float(np.median(ts)) / iters * 1000


def xla_attention(q, k, v):
    return reference_attention(q, k, v)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--l", type=int, default=8704)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--mask-len", type=int, default=512,
                    help="bucketed text prefix that carries the kv mask")
    ap.add_argument("--stream", action="store_true",
                    help="sweep the HBM-streaming kernel instead")
    ap.add_argument("--bf16-scores", action="store_true",
                    help="resident kernel with bf16 score domain "
                    "(QIE_FLASH_BF16_SCORES candidate)")
    ap.add_argument("--no-pipeline", action="store_true",
                    help="disable the software-pipelined unmasked bulk "
                    "(A/B for QIE_FLASH_PIPELINE)")
    ap.add_argument("--bq", type=int, help="restrict sweep to one block_q")
    ap.add_argument("--bk", type=int, help="restrict sweep to one block_k")
    ap.add_argument("--skip-xla", action="store_true",
                    help="skip the XLA reference timing")
    ap.add_argument("--grad", action="store_true",
                    help="time fwd+bwd (value_and_grad) through the "
                    "custom-VJP training path instead of the forward")
    args = ap.parse_args(argv)

    shape = (args.b, args.heads, args.l, args.d)
    key = jax.random.PRNGKey(0)
    kq, kk, kv = split_keys(key, 3)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)
    mask = jnp.ones((args.b, args.l), bool)

    flops = 4 * args.b * args.heads * args.l * args.l * args.d
    if args.grad:
        # fwd-with-LSE (2 dots) + dq kernel (3) + dkv kernel (4) ≈ 4.5×
        # the 2-dot forward's MXU work
        flops = flops * 9 // 2
    print(f"shape B{args.b} H{args.heads} L{args.l} D{args.d} "
          f"({flops / 1e9:.1f} GFLOP/layer{' fwd+bwd' if args.grad else ''})"
          f" device={jax.devices()[0]}")

    def grad_op(attn):
        """q-shaped fwd+bwd op for _time_fn: all three cotangents feed the
        output so no backward kernel is dead-code-eliminated."""
        def loss(q, k, v):
            return jnp.sum(attn(q, k, v).astype(jnp.float32))

        g = jax.grad(loss, argnums=(0, 1, 2))

        def op(q, k, v):
            dq, dk, dv = g(q, k, v)
            return (dq + dk + dv).astype(q.dtype)

        return op

    if not args.skip_xla:
        fn = grad_op(xla_attention) if args.grad else xla_attention
        ms = _time_fn(fn, q, k, v, args.iters)
        print(f"  {'XLA reference':<24} {ms:7.2f} ms  "
              f"{flops / ms / 1e9:6.1f} TF/s")

    if args.grad:
        # the trainable path uses the measured default blocks; per-block
        # sweeps apply to the inference kernel only
        fn = grad_op(functools.partial(
            fa.flash_attention_trainable, kv_mask=mask,
            mask_len=args.mask_len))
        ms = _time_fn(fn, q, k, v, args.iters)
        print(f"  {'flash custom VJP':<24} {ms:7.2f} ms  "
              f"{flops / ms / 1e9:6.1f} TF/s")
        return

    for bq in ((args.bq,) if args.bq else (256, 512, 1024)):
        for bk in ((args.bk,) if args.bk else (256, 512, 1024, 2048)):
            fn = functools.partial(
                fa.flash_attention, kv_mask=mask, block_q=bq, block_k=bk,
                mask_len=args.mask_len, stream=args.stream or None,
                bf16_scores=args.bf16_scores or None,
                pipelined=False if args.no_pipeline else None,
            )
            try:
                ms = _time_fn(fn, q, k, v, args.iters)
            except Exception as e:  # VMEM overflow etc.
                print(f"  bq={bq:<5} bk={bk:<5}        failed: "
                      f"{type(e).__name__}")
                continue
            print(f"  bq={bq:<5} bk={bk:<5}   {ms:7.2f} ms  "
                  f"{flops / ms / 1e9:6.1f} TF/s")


if __name__ == "__main__":
    main()
