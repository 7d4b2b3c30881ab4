"""Pallas TPU 3×3 conv for small-channel NHWC stages (the VAE hot path).

XLA's conv lowering runs the VAE decoder's full-resolution stages at ~8%
MXU: with C=64..96 channels it decomposes into per-tap GEMMs whose K=N=C
quarter-fill the 128×128 systolic array (measured 15 TF/s at
1024²×64→64 vs 45 TF/s at C=128 — CLAUDE.md round-1 notes; reference
analog: the VAE-slicing/tiling tricks at benchmark_optimizations.py:86).

This kernel keeps the whole conv on-chip per tile:

  per (row-tile, col-tile) program:
    double-buffered DMA of the (th+2, tw+8, C) halo window HBM → VMEM
    nine per-tap dots accumulated in f32, weights VMEM-resident
    fused bias epilogue

Measured on v5e @1024²: 1.3–1.6× over XLA's lowering (19 TF/s at C=64,
42 TF/s at C=96 vs XLA's 14/26). An explicit im2col (one K=9C dot)
measured the same as the 9-tap form — the extra VMEM passes to build A
cancel the deeper contraction — so the simpler form stays.

Used for stride-1 SAME 3×3 convs with C ≤ 128 (where XLA is weak);
everything else falls through to `lax.conv_general_dilated`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window_dma(x_hbm, x_v, sem, i, j, slot, th, tw):
    """Halo-window copy HBM → VMEM slot. Width tw+8 (not tw+2): DMA slice
    extents on the sublane dim must be 8-aligned; input is right-padded."""
    return pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * th, th + 2), pl.ds(j * tw, tw + 8), :],
        x_v.at[slot], sem.at[slot],
    )


def _conv_kernel(x_hbm, w_ref, b_ref, o_ref, x_v, sem,
                 *, th, tw, cin, nj):
    """Double-buffered: prefetch tile l+1's halo window while computing l."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    l = i * nj + j
    slot = jax.lax.rem(l, 2)

    @pl.when(l == 0)
    def _first():
        _window_dma(x_hbm, x_v, sem, i, j, 0, th, tw).start()

    @pl.when(l + 1 < pl.num_programs(0) * nj)
    def _prefetch():
        i2 = jax.lax.div(l + 1, nj)
        j2 = jax.lax.rem(l + 1, nj)
        _window_dma(x_hbm, x_v, sem, i2, j2, 1 - slot, th, tw).start()

    _window_dma(x_hbm, x_v, sem, i, j, slot, th, tw).wait()

    # nine per-tap dots accumulated in f32 — reads each shifted view once
    # straight into the MXU. (A materialized (th,tw,9C) im2col would make
    # one deeper dot but costs 2 extra VMEM passes over 9C lanes, which
    # measured slower than the quarter-filled K=C passes here; a direct
    # lane-concat of the views is unsupported by Mosaic.)
    f = o_ref.shape[-1]
    acc = jnp.zeros((th, tw, f), jnp.float32)
    for t, (dy, dx) in enumerate(
        (dy, dx) for dy in range(3) for dx in range(3)
    ):
        acc = acc + jax.lax.dot_general(
            x_v[slot, pl.ds(dy, th), pl.ds(dx, tw), pl.ds(0, cin)],
            w_ref[t],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[...] = (acc + b_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _pick_tiles(h: int, w: int):
    th = next((t for t in (16, 8) if h % t == 0), None)
    tw = next((t for t in (256, 128, 64) if w % t == 0), None)
    return th, tw


def supported(x: jnp.ndarray, w: jnp.ndarray, stride: int, padding) -> bool:
    """Gate: stride-1 SAME 3×3, batch small, C small enough that XLA's
    per-tap decomposition underfills the MXU, tile-divisible extent."""
    if stride != 1 or padding != "SAME":
        return False
    if w.shape[:2] != (3, 3):
        return False
    b, h, heightw, cin = x.shape
    f = w.shape[3]
    if cin > 128:
        return False  # XLA already runs ≥45 TF/s with full-lane channels
    if cin % 8 != 0:
        return False
    th, tw = _pick_tiles(h, heightw)
    if th is None or tw is None:
        return False
    # VMEM: 2 halo-window slots + f32 acc + weights, per program
    est = (2 * (th + 2) * (tw + 8) * 128 * 2
           + th * tw * max(f, 128) * 4 + 9 * cin * max(f, 128) * 2)
    return est < 10 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
            interpret: bool = False) -> jnp.ndarray:
    """x (B,H,W,C) · w (3,3,C,F) + b (F,) — stride-1 SAME, NHWC/HWIO."""
    bsz, h, wid, cin = x.shape
    f = w.shape[3]
    th, tw = _pick_tiles(h, wid)
    # channel dim padded to the 128-lane tile: HBM→VMEM DMA slices must
    # cover full lane tiles (the padded taps are sliced away in VMEM, so
    # they cost DMA bytes, not MXU flops)
    cpad = -cin % 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, cpad)))
    w2 = w.reshape(9, cin, f)
    b2 = b.reshape(1, f)

    kern = functools.partial(
        _conv_kernel, th=th, tw=tw, cin=cin, nj=wid // tw
    )
    call = pl.pallas_call(
        kern,
        grid=(h // th, wid // tw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # padded image in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=pl.BlockSpec(
            (th, tw, f), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((h, wid, f), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, tw + 8, cin + cpad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )

    outs = [call(xp[n], w2, b2) for n in range(bsz)]
    return jnp.stack(outs, axis=0)
