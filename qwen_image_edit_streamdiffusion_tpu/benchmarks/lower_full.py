"""Abstract AOT check of the FULL 20B preset, tensor-parallel.

Lowers (no execution, no weight materialization — pure ShapeDtypeStructs)
one denoise model call of the `qwen-image-edit-2509` preset over an
(cfg × model) mesh, verifying that the megatron sharding rules partition
every block tensor and that XLA accepts the SPMD program at real scale —
the thing a single dev box cannot run for lack of 40 GB of HBM.

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python -m qwen_image_edit_streamdiffusion_tpu.benchmarks.lower_full
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding

from qwen_image_edit_streamdiffusion_tpu.core import meshes
from qwen_image_edit_streamdiffusion_tpu.core.config import get_preset
from qwen_image_edit_streamdiffusion_tpu.models import transformer as tfm
from qwen_image_edit_streamdiffusion_tpu.models.common import param_count
from qwen_image_edit_streamdiffusion_tpu.parallel import sharding


def main(n_devices: int = 8):
    preset = get_preset("qwen-image-edit-2509")
    cfg = preset.model

    devs = jax.devices()
    if len(devs) < n_devices:
        devs = jax.devices("cpu")
    mesh = meshes.make_mesh(cfg_axis=2, model_axis=n_devices // 2,
                            devices=devs[:n_devices])
    print(f"mesh: {dict(mesh.shape)}")

    t0 = time.time()
    shapes = jax.eval_shape(lambda: tfm.init(jax.random.PRNGKey(0), cfg))
    specs = sharding.transformer_param_specs(shapes)
    params_abs = jax.tree_util.tree_map(
        lambda s, p: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, p)),
        shapes, specs,
    )
    n_params = param_count(shapes)
    print(f"abstract params: {n_params / 1e9:.2f}B ({time.time() - t0:.1f}s)")

    # 1024² bucket: 4096 target + 4096 cond tokens, 256 text.
    img_shapes = ((1, 64, 64), (1, 64, 64))
    txt_len = 256
    l_img = sum(f * h * w for f, h, w in img_shapes)
    ropes = tfm.make_rope(cfg, img_shapes, txt_len)
    batch = NamedSharding(mesh, jax.sharding.PartitionSpec("cfg"))
    args = (
        params_abs,
        jax.ShapeDtypeStruct((2, l_img, cfg.in_channels), jnp.bfloat16,
                             sharding=batch),
        jax.ShapeDtypeStruct((2, txt_len, cfg.joint_dim), jnp.bfloat16,
                             sharding=batch),
        jax.ShapeDtypeStruct((2,), jnp.float32),
    )

    def fwd(params, img, txt, t):
        return tfm.forward(params, cfg, img, txt, t, ropes, use_flash=False)

    t0 = time.time()
    lowered = jax.jit(fwd).lower(*args)
    print(f"lowered in {time.time() - t0:.1f}s")
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compiled in {time.time() - t0:.1f}s")
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"per-device argument bytes: {mem.argument_size_in_bytes / 1e9:.2f} GB")
        print(f"per-device temp bytes:     {mem.temp_size_in_bytes / 1e9:.2f} GB")
        total = (mem.argument_size_in_bytes + mem.temp_size_in_bytes
                 + mem.output_size_in_bytes)
        print(f"per-device total:          {total / 1e9:.2f} GB "
              f"({'fits' if total < 16e9 else 'EXCEEDS'} one v5e's 16 GB)")
    print("OK: full 20B preset lowers+compiles TP-sharded")


if __name__ == "__main__":
    main()
