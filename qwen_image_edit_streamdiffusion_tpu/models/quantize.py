"""Weight-only INT8 quantization of the transformer.

TPU-native equivalent of the reference's quantize_transformer.py
(documented-absent; README.md:136-138 — "nn.Linear → Int8Linear swap,
~50% memory") and the BitsAndBytes config at benchmark_int8.py:72-76
(``components_to_quantize=["transformer"]``). Walks the param pytree and
swaps every block-level linear's ``{"w": ...}`` for
``{"w_q": int8, "scale": f32}``; ``common.linear`` dispatches on the key,
so the transformer forward code is unchanged and the swap composes with
jit, LoRA fusion (fuse first, then quantize), and TP sharding.
"""

from __future__ import annotations

from typing import Any, FrozenSet

from qwen_image_edit_streamdiffusion_tpu.ops.int8 import quantize_weight

# Linears worth quantizing: every block-level matmul, including the AdaLN
# modulation projections (BitsAndBytes quantizes them too, and they are a
# third of block params — needed to hit the reference's ~50% memory claim,
# README.md:136). Embeddings, output head, and norms stay high-precision.
DEFAULT_QUANTIZE = frozenset({
    "img_q", "img_k", "img_v", "txt_q", "txt_k", "txt_v",
    "img_out", "txt_out", "fc1", "fc2", "img_mod", "txt_mod",
    "img_qkv", "txt_qkv",
})

# Conservative subset if 2-step quality regresses on a real checkpoint:
# leave the modulation projections dense.
NO_MODULATION_QUANTIZE = frozenset(DEFAULT_QUANTIZE - {"img_mod", "txt_mod"})


def _quantize_leaf_dict(d: dict, bits: int = 8) -> dict:
    if bits == 4:
        from qwen_image_edit_streamdiffusion_tpu.ops.int8 import (
            INT4_GROUP,
            quantize_weight_int4,
        )

        kin = d["w"].shape[0]
        if kin % INT4_GROUP == 0 and kin % 2 == 0:
            out = quantize_weight_int4(d["w"])
        else:
            # group-wise int4 needs in_dim % group == 0 (e.g. the VL
            # vision MLP's 3420-dim down projection) — those few leaves
            # take the int8 rung instead of staying bf16
            q = quantize_weight(d["w"])
            out = {"w_q": q.w_q, "scale": q.scale}
    else:
        q = quantize_weight(d["w"])
        out = {"w_q": q.w_q, "scale": q.scale}
    if "b" in d:
        out["b"] = d["b"]
    return out


def _quantize_tree(params: Any, include: FrozenSet[str], bits: int) -> Any:
    """Walk a param tree, swapping every 2-D linear leaf-dict whose key is
    in `include` for its quantized form (shared by the transformer and VL
    entry points so container/dispatch fixes stay in one place)."""

    def walk(node, name=""):
        if isinstance(node, dict):
            if "w" in node and name in include and node["w"].ndim == 2:
                return _quantize_leaf_dict(node, bits)
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(walk(v, name) for v in node)
        return node

    return walk(params)


def quantize_transformer(
    params: Any, include: FrozenSet[str] = DEFAULT_QUANTIZE, bits: int = 8
) -> Any:
    """Return a new transformer param tree with int8 (default) or int4
    block linears (bits=4 ≈ the reference's NF4 rung, test_quantized.py:46-51)."""
    walk = lambda node: _quantize_tree(node, include, bits)
    return {
        "img_in": params["img_in"],
        "txt_norm": params["txt_norm"],
        "txt_in": params["txt_in"],
        "time_mlp": params["time_mlp"],
        "blocks": walk(params["blocks"]),
        "norm_out": params["norm_out"],
        "proj_out": params["proj_out"],
    }


# VL encoder linears worth quantizing (VERDICT r2 next #1: int8 halves the
# ~15.5 GB bf16 encoder): LM attention + SwiGLU, vision attention + SwiGLU,
# and the 2×2 merger MLP. The embed table, patch embed, and norms stay
# high-precision (the table dominates what's left and shards its hidden dim
# across the mesh anyway — parallel/sharding.vl_param_specs).
VL_QUANTIZE = frozenset({
    "q_proj", "k_proj", "v_proj", "o_proj", "gate", "up", "down",
    "qkv", "proj", "fc1", "fc2",
})


def quantize_vl(
    params: Any, include: FrozenSet[str] = VL_QUANTIZE, bits: int = 8
) -> Any:
    """Weight-only int8/int4 for the Qwen2.5-VL encoder param tree
    ({"vision": ..., "lm": ...}); ``common.linear`` dispatches on the leaf
    keys so the forward code is untouched, and the swap composes with the
    TP sharding rules (w_q/scale leaf specs)."""
    return _quantize_tree(params, include, bits)


def quantized_bytes(params: Any) -> int:
    import jax

    return sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params)
    )
