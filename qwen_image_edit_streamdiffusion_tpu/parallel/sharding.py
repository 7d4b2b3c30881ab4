"""Sharding rules: tensor parallelism over the `model` axis, CFG data
parallelism over the `cfg` axis.

This module is the TPU-native replacement for BOTH of the reference's
>VRAM strategies (SURVEY.md §2.4):

- CPU offload (qwen_realtime.py:122, test_minimal.py:52) → the 20B bf16
  transformer is *resident*, tensor-parallel over `model` (megatron layout:
  qkv/fc1/modulation column-parallel, out/fc2 row-parallel; XLA inserts the
  per-layer psum/all-gather over ICI from these NamedShardings).
- 2-GPU CUDA-stream CFG parallelism (documented-absent parallel_cfg_*,
  README.md:127-130) → cond/uncond stacked on the batch axis and sharded
  over `cfg`.

Everything is annotation-driven (GSPMD): no explicit collectives in model
code; ``jax.jit`` with these shardings compiles one SPMD program.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qwen_image_edit_streamdiffusion_tpu.core.meshes import CFG_AXIS, MODEL_AXIS

# Column-parallel leaves: weight (in, out) → split out; bias → split.
# (img_qkv/txt_qkv: fused layouts stay correct under GSPMD column sharding,
# though per-projection sharding is preferred — EditPipeline skips fusion
# when a mesh is active.)
_COL_PARALLEL = {
    "img_q", "img_k", "img_v", "txt_q", "txt_k", "txt_v",
    "img_qkv", "txt_qkv", "fc1", "img_mod", "txt_mod",
}
# Row-parallel leaves: weight (in, out) → split in; bias replicated
# (XLA adds the psum after the partial matmul).
_ROW_PARALLEL = {"img_out", "txt_out", "fc2"}


def _spec_for_path(path, leaf_val=None, axis_sizes=None) -> P:
    names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    names = [n for n in names if isinstance(n, str)]
    leaf = names[-1] if names else ""
    owner = names[-2] if len(names) >= 2 else ""
    # Only block-level tensors are sharded; top-level embeddings/heads are
    # small and stay replicated. Blocks are list entries → SequenceKey.
    in_block = any(isinstance(p, jax.tree_util.SequenceKey) for p in path)
    if not in_block:
        return P()
    shape = getattr(leaf_val, "shape", None)

    def spec(shard_dim: int, ndim: int) -> P:
        # even-tiling guard (needs axis_sizes + leaf shapes): a dim the
        # model axis doesn't divide stays replicated — e.g. int4 scale4 is
        # (in/64, out), and in/64 < model_axis at test scale. At 20B every
        # dim divides and the guard is a no-op.
        dim = None if shape is None else shape[shard_dim]
        if _fit_axes(MODEL_AXIS, dim, axis_sizes) is None:
            return P()
        parts: list = [None] * ndim
        parts[shard_dim] = MODEL_AXIS
        return P(*parts)

    if owner in _COL_PARALLEL:
        if leaf in ("w", "w_q", "w_q4", "scale4"):
            # int4 scale4 is (in_groups, out) → out-dim shard like the weight
            return spec(1, 2)
        if leaf in ("b", "scale"):  # int8 per-out-channel scale shards too
            return spec(0, 1)
    if owner in _ROW_PARALLEL:
        if leaf in ("w", "w_q", "w_q4", "scale4"):
            return spec(0, 2)
        if leaf in ("b", "scale"):
            return P()
    return P()


def transformer_param_specs(params: Any, axis_sizes=None):
    """PartitionSpec pytree matching the transformer param pytree.
    ``axis_sizes`` ({name: extent}, e.g. dict(mesh.shape)) enables the
    even-tiling guard: a leaf dim the model axis doesn't divide is
    replicated instead of producing an invalid NamedSharding."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: _spec_for_path(path, v, axis_sizes), params
    )


def shard_transformer_params(params: Any, mesh: Mesh):
    """Place transformer params on the mesh per the TP rules."""
    specs = transformer_param_specs(params, axis_sizes=dict(mesh.shape))
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


# ---------------------------------------------------------------------------
# Qwen2.5-VL encoder sharding (VERDICT r2 missing #1): the ~7.7B VL encoder
# (15.5 GB bf16) cannot ride along replicated next to a 10 GB transformer
# shard on a 16 GB chip. Megatron rules for the LM decoder and the vision
# tower; the embed table shards its hidden dim (row lookups stay local,
# GSPMD all-gathers the (L, hidden/n) activations once).
#
# Unlike the transformer (sharded over `model` only — its cond/uncond CFG
# batch lives on `cfg`), the VL encoder runs ONCE per request with no CFG
# batch axis, so its params shard over EVERY mesh axis (cfg × model
# flattened): n× the memory relief, zero interference with the denoise
# loop's TP layout.
# ---------------------------------------------------------------------------

# Column-parallel (weight (in, out) → split out): attention q/k/v, MLP
# gate/up, vision fused qkv, merger fc1, patch embed.
_VL_COL = {"q_proj", "k_proj", "v_proj", "gate", "up", "qkv", "fc1",
           "patch_embed"}
# Row-parallel (weight (in, out) → split in; bias replicated — XLA psums
# the partial products): attention out, MLP down, merger fc2.
_VL_ROW = {"o_proj", "down", "proj", "fc2"}


def _fit_axes(ax, dim: Optional[int], axis_sizes) -> Optional[Tuple[str, ...]]:
    """Largest suffix of the axes tuple whose product evenly divides
    ``dim`` (NamedSharding requires even tiling — e.g. the vision MLP's
    3420 width divides the 4-way `model` axis but not the 8-way cfg×model
    product). None sizes/dim skip the check (structure-only specs)."""
    ax = (ax,) if isinstance(ax, str) else tuple(ax)
    if dim is None or axis_sizes is None:
        return ax
    for start in range(len(ax) + 1):
        cand = ax[start:]
        if not cand:
            return None  # replicate
        prod = 1
        for a in cand:
            prod *= axis_sizes[a]
        if dim % prod == 0:
            return cand


def _vl_spec_for_path(path, ax, leaf_val=None, axis_sizes=None) -> P:
    names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    names = [n for n in names if isinstance(n, str)]
    leaf = names[-1] if names else ""
    owner = names[-2] if len(names) >= 2 else ""
    shape = getattr(leaf_val, "shape", None)

    def spec(shard_dim: int, ndim: int) -> P:
        dim = None if shape is None else shape[shard_dim]
        fitted = _fit_axes(ax, dim, axis_sizes)
        if fitted is None:
            return P()
        entry = fitted if len(fitted) > 1 else fitted[0]
        parts = [None] * ndim
        parts[shard_dim] = entry
        return P(*parts)

    if leaf == "embed":  # (vocab, hidden) token table → shard hidden
        return spec(1, 2)
    if owner in _VL_COL:
        if leaf in ("w", "w_q", "w_q4", "scale4"):
            return spec(1, 2)
        if leaf in ("b", "scale"):
            return spec(0, 1)
    if owner in _VL_ROW:
        if leaf in ("w", "w_q", "w_q4", "scale4"):
            return spec(0, 2)
        if leaf in ("b", "scale"):
            return P()
    return P()


def _vl_axes(mesh: Mesh):
    """Every mesh axis with extent > 1, cfg-first (deterministic order)."""
    return tuple(a for a in (CFG_AXIS, MODEL_AXIS)
                 if a in mesh.axis_names and mesh.shape[a] > 1)


def vl_param_specs(params: Any, axes=(CFG_AXIS, MODEL_AXIS),
                   axis_sizes=None):
    """PartitionSpec pytree for a QwenVLEncoder param pytree ({"vision":
    ..., "lm": ...}). axes: mesh axis name(s) the shards spread over — a
    tuple shards over the flattened product. axis_sizes ({name: extent})
    enables the even-tiling fallback ladder: a dim that doesn't divide the
    full product shards over an axes suffix (usually `model` alone) or
    stays replicated."""
    ax = axes if isinstance(axes, str) else tuple(axes)
    return jax.tree_util.tree_map_with_path(
        lambda path, v: _vl_spec_for_path(path, ax, v, axis_sizes), params
    )


def shard_vl_params(params: Any, mesh: Mesh):
    """Place VL encoder params on the mesh sharded over all axes (>1)."""
    axes = _vl_axes(mesh)
    if not axes:
        return replicate(params, mesh)
    specs = vl_param_specs(params, axes, axis_sizes=dict(mesh.shape))
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def replicate(tree: Any, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Activations batch-sharded over `cfg` (cond/uncond split), replicated
    over `model`."""
    return NamedSharding(mesh, P(CFG_AXIS))


def has_axis(mesh: Optional[Mesh], name: str) -> bool:
    return mesh is not None and name in mesh.axis_names and mesh.shape[name] > 1
