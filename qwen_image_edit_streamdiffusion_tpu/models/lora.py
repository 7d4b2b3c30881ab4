"""LoRA loading and weight fusion.

The reference loads the Lightning LoRA dynamically through diffusers/peft
(server.py:76-79) which *breaks torch.compile* (README.md:108 — documented
conflict; benchmark_lightning_compile.py exists to measure it). The TPU
design eliminates the conflict by construction: adapters are **fused into
the dense weights before trace** (SURVEY.md §2.3 N3), so the jitted graph
never knows LoRA existed — zero runtime overhead, no recompiles, and it
composes with int8 (fuse first, then quantize).

Format: diffusers/peft safetensors —
``transformer_blocks.{i}.<module>.lora_A.weight`` (r, in) /
``lora_B.weight`` (out, r) torch layout; fused as
w(in,out) += scale · Aᵀ(in,r) @ Bᵀ(r,out), scale = alpha/r (alpha from the
``.alpha`` tensors when present, else r → scale 1).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

# diffusers module path → our param tree path (block-relative); the same
# table drives full-checkpoint conversion in convert.py.
BLOCK_MODULE_MAP: Dict[str, Tuple[str, ...]] = {
    "attn.to_q": ("attn", "img_q"),
    "attn.to_k": ("attn", "img_k"),
    "attn.to_v": ("attn", "img_v"),
    "attn.add_q_proj": ("attn", "txt_q"),
    "attn.add_k_proj": ("attn", "txt_k"),
    "attn.add_v_proj": ("attn", "txt_v"),
    "attn.to_out.0": ("attn", "img_out"),
    "attn.to_add_out": ("attn", "txt_out"),
    "img_mlp.net.0.proj": ("img_mlp", "fc1"),
    "img_mlp.net.2": ("img_mlp", "fc2"),
    "txt_mlp.net.0.proj": ("txt_mlp", "fc1"),
    "txt_mlp.net.2": ("txt_mlp", "fc2"),
    "img_mod.1": ("img_mod",),
    "txt_mod.1": ("txt_mod",),
}

_BLOCK_RE = re.compile(
    r"^(?:diffusion_model\.|transformer\.)?transformer_blocks\.(\d+)\.(.+?)"
    r"\.(lora_A|lora_B|alpha|lora_A\.weight|lora_B\.weight)(?:\.weight)?$"
)


class LoRAEntry:
    __slots__ = ("a", "b", "alpha")

    def __init__(self):
        self.a: Optional[np.ndarray] = None  # (r, in) torch layout
        self.b: Optional[np.ndarray] = None  # (out, r)
        self.alpha: Optional[float] = None


def parse_lora_state_dict(
    tensors: Dict[str, np.ndarray],
) -> Dict[Tuple[int, Tuple[str, ...]], LoRAEntry]:
    """Group flat safetensors keys into per-target-module LoRA entries.

    Returns {(block_index, param_path): LoRAEntry}; unknown keys are
    collected and reported in one error so a format drift is loud.
    """
    entries: Dict[Tuple[int, Tuple[str, ...]], LoRAEntry] = {}
    unknown: List[str] = []
    for key, val in tensors.items():
        m = _BLOCK_RE.match(key)
        if not m:
            unknown.append(key)
            continue
        idx = int(m.group(1))
        module = m.group(2)
        kind = m.group(3).split(".")[0]
        if module not in BLOCK_MODULE_MAP:
            unknown.append(key)
            continue
        path = (idx, BLOCK_MODULE_MAP[module])
        e = entries.setdefault(path, LoRAEntry())
        arr = np.asarray(val)
        if kind == "lora_A":
            e.a = arr
        elif kind == "lora_B":
            e.b = arr
        else:
            e.alpha = float(arr)
    if unknown:
        raise ValueError(
            f"{len(unknown)} unrecognized LoRA keys, e.g. {unknown[:5]} — "
            "update models/lora.py:BLOCK_MODULE_MAP"
        )
    return entries


def fuse_lora(
    params: Any,
    tensors: Dict[str, np.ndarray],
    weight: float = 1.0,
) -> Any:
    """Return transformer params with LoRA deltas fused into the weights.

    Must be applied to *unquantized* weights (fuse → quantize → shard).
    """
    entries = parse_lora_state_dict(tensors)
    blocks = [dict(b) for b in params["blocks"]]

    def deep_update(d: dict, path: Tuple[str, ...], fn):
        if len(path) == 1:
            d[path[0]] = fn(d[path[0]])
            return
        d[path[0]] = dict(d[path[0]])
        deep_update(d[path[0]], path[1:], fn)

    # q/k/v leaves may have been concatenated by models.optimize.fuse_qkv;
    # a LoRA delta for e.g. attn.img_k then lands in columns [D, 2D) of
    # attn.img_qkv.
    _FUSED_SLOT = {"img_q": ("img_qkv", 0), "img_k": ("img_qkv", 1),
                   "img_v": ("img_qkv", 2), "txt_q": ("txt_qkv", 0),
                   "txt_k": ("txt_qkv", 1), "txt_v": ("txt_qkv", 2)}

    for (idx, path), e in entries.items():
        if e.a is None or e.b is None:
            raise ValueError(f"incomplete LoRA pair at block {idx} {path}")
        if idx >= len(blocks):
            raise ValueError(
                f"LoRA targets block {idx} but model has {len(blocks)}"
            )
        r = e.a.shape[0]
        scale = weight * ((e.alpha / r) if e.alpha is not None else 1.0)
        delta = (e.a.T.astype(np.float32) @ e.b.T.astype(np.float32)) * scale

        col_slot = None
        blk_attn = blocks[idx].get("attn", {})
        if (path[0] == "attn" and path[-1] in _FUSED_SLOT
                and path[-1] not in blk_attn):
            fused_name, col_slot = _FUSED_SLOT[path[-1]]
            path = ("attn", fused_name)

        def fuse(leaf, delta=delta, col_slot=col_slot):
            leaf = dict(leaf)
            if "w" not in leaf:
                raise ValueError(
                    "LoRA fusion requires dense weights — fuse before "
                    "quantize_transformer()"
                )
            w = leaf["w"]
            if col_slot is not None:
                d_out = delta.shape[1]
                expect = (delta.shape[0], 3 * d_out)
                if w.shape != expect:
                    raise ValueError(
                        f"LoRA delta {delta.shape} vs fused weight {w.shape}"
                    )
                w32 = w.astype(jnp.float32)
                sl = slice(col_slot * d_out, (col_slot + 1) * d_out)
                leaf["w"] = w32.at[:, sl].add(jnp.asarray(delta)).astype(
                    w.dtype
                )
                return leaf
            if w.shape != delta.shape:
                raise ValueError(
                    f"LoRA delta {delta.shape} vs weight {w.shape}"
                )
            leaf["w"] = (w.astype(jnp.float32) + jnp.asarray(delta)).astype(
                w.dtype
            )
            return leaf

        blk = dict(blocks[idx])
        deep_update(blk, path, fuse)
        blocks[idx] = blk

    out = dict(params)
    out["blocks"] = blocks
    return out


def load_lora_weights(path: str) -> Dict[str, np.ndarray]:
    """Read a .safetensors LoRA file into numpy (reference loads
    'lightx2v/Qwen-Image-Lightning' 4-step weights, server.py:76-79)."""
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out
