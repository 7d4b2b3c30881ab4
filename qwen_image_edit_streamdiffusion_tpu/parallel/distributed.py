"""Multi-host runtime initialization.

The reference has no distributed backend at all (SURVEY.md §2.4: single
process, one visible GPU; its documented high-water mark is 2-GPU CFG
parallelism via CUDA streams). On TPU pods the equivalent plumbing is
``jax.distributed`` + GSPMD: every host runs the same program, XLA
compiles one SPMD executable, and collectives ride ICI/DCN — there is no
NCCL/MPI analog to manage by hand.

Usage (one call near process start, before device queries):

    from qwen_image_edit_streamdiffusion_tpu.parallel import distributed
    distributed.initialize()          # no-op off-pod / single host
    mesh = distributed.global_mesh(cfg_axis=2)
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from qwen_image_edit_streamdiffusion_tpu.core import meshes


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed when running multi-host.

    With no arguments, relies on the TPU environment's auto-detection
    (GCE metadata / megascale env). A plain single-host run (no
    coordinator configured) is a silent no-op, so the same entry points
    work on a laptop, one chip, or a pod.
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():
        return
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    multi = int(os.environ.get("JAX_NUM_PROCESSES", num_processes or 1) or 1)
    auto_pod = os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if not explicit and not auto_pod and multi <= 1:
        return  # single host
    try:
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        # Already initialized by the launcher, or single-process fallback.
        if "already" not in str(e).lower():
            raise


def global_mesh(cfg_axis: int = 1, model_axis: Optional[int] = None):
    """(cfg × model) mesh over ALL devices across hosts. The `model` axis
    is innermost so TP collectives stay on intra-host/adjacent ICI links
    and the `cfg` pair spans the slower dimension (SURVEY.md §5.8)."""
    return meshes.make_mesh(cfg_axis=cfg_axis, model_axis=model_axis,
                            devices=jax.devices())
