"""Load-time param-tree optimizations.

:func:`fuse_qkv` concatenates each stream's q/k/v projection weights into
one (D, 3D) matmul per block — 6 GEMM dispatches per block become 2 larger
ones, improving MXU utilization and reducing per-op overhead on a single
chip. Apply AFTER LoRA fusion, BEFORE int8 quantization; skip under tensor
parallelism (a contiguous [q|k|v] concat does not shard evenly over the
`model` axis — per-projection column sharding is the TP-correct layout).

The transformer forward transparently supports both layouts
(``attn.img_qkv`` / ``attn.txt_qkv`` fused leaves, or the separate
``img_q``.. leaves from checkpoints).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp


def _fuse_three(a: dict, b: dict, c: dict) -> dict:
    out = {"w": jnp.concatenate([a["w"], b["w"], c["w"]], axis=1)}
    if "b" in a:
        out["b"] = jnp.concatenate([a["b"], b["b"], c["b"]])
    return out


def fuse_qkv(params: Any) -> Any:
    """Return transformer params with per-stream fused qkv projections."""
    blocks = []
    for blk in params["blocks"]:
        attn = dict(blk["attn"])
        if "img_qkv" not in attn:
            attn["img_qkv"] = _fuse_three(
                attn.pop("img_q"), attn.pop("img_k"), attn.pop("img_v")
            )
            attn["txt_qkv"] = _fuse_three(
                attn.pop("txt_q"), attn.pop("txt_k"), attn.pop("txt_v")
            )
        b2 = dict(blk)
        b2["attn"] = attn
        blocks.append(b2)
    out = dict(params)
    out["blocks"] = blocks
    return out
