"""Device mesh construction for the (cfg × model) parallel layout.

The reference's multi-device story is 2-GPU CFG data parallelism with CUDA
streams (documented-absent parallel_cfg_* family, README.md:127-130) plus
CPU offload for the >VRAM model (qwen_realtime.py:122). The TPU-native
replacement for BOTH is a single 2D mesh (SURVEY.md §5.8):

- ``model`` axis — megatron-style tensor parallelism of the transformer
  (weights resident in HBM across chips; replaces CPU offload entirely),
- ``cfg`` axis — 2-way batch shard computing cond/uncond branches in
  parallel (replaces the CUDA-stream 2-GPU scheme).

All collectives are emitted by XLA from sharding annotations inside the
jitted step and ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CFG_AXIS = "cfg"
MODEL_AXIS = "model"


def make_mesh(
    cfg_axis: int = 1,
    model_axis: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (cfg, model) mesh.

    If ``model_axis`` is None, use all remaining devices. ICI-friendly
    layout: the ``model`` axis (which carries the per-layer all-reduces) is
    the fastest-varying axis so TP collectives ride adjacent ICI links; the
    ``cfg`` axis exchanges one latent-sized tensor per step and can span the
    slower hops.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_axis is None:
        if n % cfg_axis:
            raise ValueError(f"{n} devices not divisible by cfg={cfg_axis}")
        model_axis = n // cfg_axis
    need = cfg_axis * model_axis
    if need > n:
        raise ValueError(f"mesh {cfg_axis}x{model_axis} needs {need} devices, have {n}")
    grid = np.asarray(devices[:need]).reshape(cfg_axis, model_axis)
    return Mesh(grid, (CFG_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))
