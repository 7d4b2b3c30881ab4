"""Multi-host init helper: must be a silent no-op off-pod."""

import jax

from qwen_image_edit_streamdiffusion_tpu.parallel import distributed


def test_initialize_noop_single_host(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    distributed.initialize()  # must not raise or hang
    assert jax.process_count() == 1


def test_global_mesh_axes():
    mesh = distributed.global_mesh(cfg_axis=2)
    assert mesh.axis_names == ("cfg", "model")
    assert mesh.shape["cfg"] == 2
    assert mesh.shape["cfg"] * mesh.shape["model"] == len(jax.devices())
