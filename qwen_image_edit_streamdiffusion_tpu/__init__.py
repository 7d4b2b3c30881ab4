"""qwen_image_edit_streamdiffusion_tpu — TPU-native real-time image editing.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of
shi3z/Qwen-Image-Edit-StreamDiffusion (reference layer map in /root/repo/SURVEY.md):

- ``models/``   — native JAX MMDiT transformer, VAE, flow-matching scheduler,
                  Qwen2.5-VL prompt encoder, LoRA fusion, weight conversion.
- ``ops/``      — Pallas TPU kernels: flash attention for the joint
                  text+image stream, fused int8 quantize+GEMM+dequant, RoPE.
- ``parallel/`` — device meshes and sharding rules (tensor-parallel `model`
                  axis, 2-way `cfg` axis for parallel classifier-free guidance).
- ``pipeline/`` — the jitted end-to-end edit pipeline, condition caches, and
                  StreamDiffusion-style temporal latent state.
- ``runtime/``  — persistent compiled-graph engine (shape buckets, AOT
                  warmup), request executor, native C++ host-side image ops.
- ``serving/``  — HTTP JSON API wire-compatible with the reference's
                  ``server.py`` (``/``, ``/health``, ``/edit``), web UI,
                  camera/stream loop.

Import alias convention: ``import qwen_image_edit_streamdiffusion_tpu as qie``.
"""

__version__ = "0.1.0"

from qwen_image_edit_streamdiffusion_tpu.core.config import (  # noqa: F401
    ModelConfig,
    SchedulerConfig,
    StreamConfig,
    VAEConfig,
    PRESETS,
    get_preset,
)
