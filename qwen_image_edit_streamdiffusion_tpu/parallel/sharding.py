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

from typing import Any, Optional

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


def _spec_for_path(path) -> P:
    names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    names = [n for n in names if isinstance(n, str)]
    leaf = names[-1] if names else ""
    owner = names[-2] if len(names) >= 2 else ""
    # Only block-level tensors are sharded; top-level embeddings/heads are
    # small and stay replicated. Blocks are list entries → SequenceKey.
    in_block = any(isinstance(p, jax.tree_util.SequenceKey) for p in path)
    if not in_block:
        return P()
    if owner in _COL_PARALLEL:
        if leaf in ("w", "w_q", "w_q4", "scale4"):
            # int4 scale4 is (in_groups, out) → out-dim shard like the weight
            return P(None, MODEL_AXIS)
        if leaf in ("b", "scale"):  # int8 per-out-channel scale shards too
            return P(MODEL_AXIS)
    if owner in _ROW_PARALLEL:
        if leaf in ("w", "w_q", "w_q4", "scale4"):
            return P(MODEL_AXIS, None)
        if leaf in ("b", "scale"):
            return P()
    return P()


def transformer_param_specs(params: Any):
    """PartitionSpec pytree matching the transformer param pytree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _spec_for_path(path), params
    )


def shard_transformer_params(params: Any, mesh: Mesh):
    """Place transformer params on the mesh per the TP rules."""
    specs = transformer_param_specs(params)
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
