"""The latency-dossier machinery (benchmarks/project_flagship.py,
VERDICT r4 next #1): the HLO collective parser against a real GSPMD
compile, the attention-flops formula against the measured kernel rate,
and the e2e composition identities. The AOT topology runs themselves
(--validate / project) need libtpu and run as a CLI, not in CI."""

import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.benchmarks import project_flagship as pf


def test_attn_flops_formula_reproduces_measured_kernel_point():
    """4·L²·d·H at the measured 96.8 TF/s must give the measured
    4.81 ms/layer at the bench-2b point (L=8704, H=12, d=128) — the
    identity that ties the projection's attention term to the real
    kernel measurement."""
    f = pf.attn_flops_per_layer(8704, 12, 128)
    assert f / pf.R_FLASH_RESIDENT == pytest.approx(4.81e-3, rel=0.01)
    # causal halves the visited blocks
    assert pf.attn_flops_per_layer(512, 28, 128, causal=True) == f * 0 + \
        2.0 * 512 * 512 * 128 * 28


def test_collective_parser_on_real_gspmd_graph():
    """Parse the optimized HLO of an actually-partitioned matmul: a
    (cfg×model) contraction whose reduction axis is sharded forces GSPMD
    to insert an all-reduce (or reduce-scatter+all-gather pair) whose
    payload the parser must find."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qwen_image_edit_streamdiffusion_tpu.core import meshes

    mesh = meshes.make_mesh(cfg_axis=2, model_axis=4)
    x = jax.ShapeDtypeStruct((256, 512), jnp.float32,
                             sharding=NamedSharding(mesh, P(None, "model")))
    w = jax.ShapeDtypeStruct((512, 128), jnp.float32,
                             sharding=NamedSharding(mesh, P("model", None)))

    def f(a, b):
        return jax.lax.with_sharding_constraint(
            a @ b, NamedSharding(mesh, P()))

    compiled = jax.jit(f).lower(x, w).compile()
    txt = compiled.as_text()
    c = pf.collective_bytes(txt)
    total = sum(c.values())
    assert total >= 256 * 128 * 4  # at least the f32 result payload
    # ring time math: all-reduce over 4 chips moves 2·3/4·V per chip
    t = pf.collective_time_s(txt, 4, bw=1.0)
    assert t > 0
    assert pf.collective_time_s(txt, 1) == 0.0


def test_collective_parser_shapes_and_dtypes():
    hlo = """
  %ar = bf16[2,1024,3072]{2,1,0} all-reduce(bf16[2,1024,3072]{2,1,0} %x)
  %ag = f32[8,128]{1,0} all-gather(f32[1,128]{1,0} %y)
  %cp = s8[64]{0} collective-permute(s8[64]{0} %z)
  %no = f32[4,4]{1,0} add(f32[4,4]{1,0} %a, f32[4,4]{1,0} %b)
"""
    c = pf.collective_bytes(hlo)
    assert c["all-reduce"] == 2 * 1024 * 3072 * 2
    assert c["all-gather"] == 8 * 128 * 4
    assert c["collective-permute"] == 64
    assert "add" not in " ".join(c)


def test_compose_e2e_identities():
    vl = {"t_vl": 0.04}
    vae = {"t_vae_encode": 0.08, "t_vae_decode": 0.06}
    e = pf.compose_e2e(0.5, vl, vae, steps=2, attached=True)
    # rcfg-self serves guided at cond-only cost; parallel CFG uses the
    # cfg axis; batched CFG pays the extra forwards
    assert e["rcfg_self_s"] == e["fast_s"]
    assert e["parallel_cfg_s"] == e["fast_s"]
    assert e["batched_cfg_s"] == pytest.approx(e["fast_s"] + 2 * 0.5)
    # stream frame: tail (1 of 2) denoise + autoencoder pair + 1 dispatch
    assert e["stream_frame_s"] == pytest.approx(
        0.08 + 0.5 + 0.06 + pf.RTT_ATTACHED_S)
    assert e["stream_fps"] == pytest.approx(1 / e["stream_frame_s"])
    # tunnel column pays the measured RTT floor + pixel bytes
    et = pf.compose_e2e(0.5, vl, vae, steps=2, attached=False)
    assert et["fast_s"] > e["fast_s"] + 3 * pf.RTT_TUNNEL_S


def test_flash_rate_switches_to_streaming_variant():
    assert pf.flash_rate(8704) == pf.R_FLASH_RESIDENT
    assert pf.flash_rate(12544) == pf.R_FLASH_STREAMING
