"""LoRA fine-tuning harness (training/lora_train.py).

Reference parity note: the reference *serves* a pre-distilled Lightning
LoRA (server.py:76-79) but has no training side; this harness produces
adapters in the exact diffusers key layout models/lora.py fuses at serve
time, so the round-trip train → export → fuse → forward is the contract
under test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.core import imaging
from qwen_image_edit_streamdiffusion_tpu.core.config import get_preset
from qwen_image_edit_streamdiffusion_tpu.models import lora as lora_mod
from qwen_image_edit_streamdiffusion_tpu.models import transformer as tfm
from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
    EditPipeline,
)
from qwen_image_edit_streamdiffusion_tpu.training import lora_train as lt


@pytest.fixture(scope="module")
def pipe():
    return EditPipeline.create("tiny", seed=0)


@pytest.fixture(scope="module")
def tcfg():
    # remat off: the per-block checkpoint trades compute for memory — the
    # right default on a 16 GB chip, but ~6x slower on the CPU test grid;
    # test_remat_step_equivalence covers the remat path's math explicitly
    return lt.TrainConfig(rank=4, alpha=4.0, learning_rate=5e-3,
                          targets=("attn.to_q", "attn.to_v",
                                   "img_mlp.net.0.proj"),
                          remat=False)


@pytest.fixture(scope="module")
def batch(pipe):
    items = []
    for kind in ("gradient", "circle"):
        items.append({
            "image": imaging.make_test_image(96, 96, kind),
            "prompt": "draw a circle",
            "target": imaging.make_test_image(96, 96, "circle"),
        })
    return lt.build_batch(pipe, items)


def test_zero_init_is_identity(pipe, tcfg):
    """b=0 at init → apply_lora(params, lora) forward == base forward
    bit-for-bit (the adapter starts as a no-op)."""
    lora = lt.init_lora(pipe.tfm_params, tcfg, jax.random.PRNGKey(0))
    fused = lt.apply_lora(pipe.tfm_params, lora, tcfg.alpha / tcfg.rank)
    cfg = pipe.preset.model
    img_shapes = ((1, 4, 4),)
    ropes = tfm.make_rope(cfg, img_shapes, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.in_channels),
                          jnp.float32).astype(jnp.dtype(cfg.dtype))
    txt = jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.joint_dim),
                            jnp.float32).astype(jnp.dtype(cfg.dtype))
    t = jnp.asarray([500.0])
    base = tfm.forward(pipe.tfm_params, cfg, x, txt, t, ropes,
                       use_flash=False)
    with_lora = tfm.forward(fused, cfg, x, txt, t, ropes, use_flash=False)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(with_lora))


def test_loss_decreases(pipe, tcfg, batch):
    """A few optimizer steps on a fixed batch must reduce the
    flow-matching loss (fixed rng per step index for determinism)."""
    trainer = lt.LoRATrainer.from_pipeline(pipe, tcfg)
    losses = [trainer.step(batch, key=jax.random.PRNGKey(7))
              for _ in range(6)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_export_round_trips_through_fuse_lora(pipe, tcfg, batch):
    """export_lora_state_dict → models.lora.fuse_lora must equal
    apply_lora — the serving path consumes trained adapters unchanged."""
    trainer = lt.LoRATrainer.from_pipeline(pipe, tcfg)
    trainer.step(batch, key=jax.random.PRNGKey(3))  # make adapters nonzero
    sd = trainer_state_dict = lt.export_lora_state_dict(trainer.lora, tcfg)
    assert any("lora_A" in k for k in trainer_state_dict)
    fused_serving = lora_mod.fuse_lora(pipe.tfm_params, sd)
    fused_train = lt.apply_lora(pipe.tfm_params, trainer.lora,
                                tcfg.alpha / tcfg.rank)
    leaves_a = jax.tree_util.tree_leaves(fused_serving)
    leaves_b = jax.tree_util.tree_leaves(fused_train)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-2, rtol=1e-2)  # bf16 leaf storage


def test_train_step_matches_single_device_on_mesh(tcfg, batch):
    """One TP(model)×DP(cfg)-sharded train step equals the single-device
    step: same loss, same updated adapters (to bf16-forward tolerance)."""
    from qwen_image_edit_streamdiffusion_tpu.core.meshes import make_mesh

    pipe_s = EditPipeline.create("tiny", seed=0)
    mesh = make_mesh(cfg_axis=2, model_axis=4)
    pipe_m = EditPipeline.create("tiny", seed=0, mesh=mesh)

    t_s = lt.LoRATrainer.from_pipeline(pipe_s, tcfg)
    t_m = lt.LoRATrainer.from_pipeline(pipe_m, tcfg)
    k = jax.random.PRNGKey(11)
    loss_s = t_s.step(batch, key=k)
    loss_m = t_m.step(batch, key=k)
    assert abs(loss_s - loss_m) < 5e-2 * max(1.0, abs(loss_s))
    # Adam's first step is sign-like (update ≈ ±lr·m/√v̂), so a gradient
    # element near zero can flip sign under the mesh's different bf16
    # reduction order and land 2·lr away. Require elementwise agreement on
    # all but a vanishing fraction of adapter elements.
    total = bad = 0
    for a, b in zip(jax.tree_util.tree_leaves(t_s.lora),
                    jax.tree_util.tree_leaves(t_m.lora)):
        a, b = np.asarray(a), np.asarray(b)
        bad += int(np.sum(np.abs(a - b) > 5e-3 + 5e-2 * np.abs(b)))
        total += a.size
    assert bad <= max(2, total // 500), (bad, total)


def test_remat_grad_equivalence(pipe, tcfg, batch):
    """remat=True (the deployment default: per-block jax.checkpoint +
    in-remat LoRA fusion) computes the same loss AND adapter gradients as
    the plain path — checkpointing must change memory, never math.
    Gradients are compared directly (an Adam step collapses them to ±lr,
    which amplifies bf16 reordering noise into sign flips)."""
    cfg = pipe.preset.model
    lora = lt.init_lora(pipe.tfm_params, tcfg, jax.random.PRNGKey(9))
    scale = tcfg.alpha / tcfg.rank
    img_shapes = tuple(batch["img_shapes"])
    ropes = tfm.make_rope(cfg, img_shapes, int(batch["txt"].shape[1]))
    x0, cond = batch["x0_tokens"], batch["cond_tokens"]
    sigmas = jnp.asarray([0.3, 0.8])
    noise = jax.random.normal(jax.random.PRNGKey(10), x0.shape, jnp.float32)

    def loss(lo, remat):
        return lt.flow_match_loss(
            pipe.tfm_params, lo, scale, cfg, x0, cond, batch["txt"],
            batch["txt_mask"], sigmas, noise, ropes, remat=remat)

    vp, gp = jax.value_and_grad(lambda lo: loss(lo, False))(lora)
    vr, gr = jax.value_and_grad(lambda lo: loss(lo, True))(lora)
    assert abs(float(vp - vr)) < 1e-4 * max(1.0, abs(float(vp)))
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-2)


def test_quantized_base_rejected(tcfg):
    """Adapter training on int8/int4 base params must fail loudly."""
    pipe = EditPipeline.create("tiny", seed=0)
    from qwen_image_edit_streamdiffusion_tpu.models import quantize as qz

    qparams = qz.quantize_transformer(pipe.tfm_params, bits=8)
    with pytest.raises(ValueError, match="dense weights"):
        lt.init_lora(qparams, tcfg, jax.random.PRNGKey(0))


def test_train_state_resume_bit_exact(tmp_path, pipe, tcfg, batch):
    """2 steps → save → 2 steps must equal save-restore → 2 steps:
    adapters, Adam moments AND the RNG stream round-trip through the
    orbax train-state checkpoint (preemption-safe resume — the reference
    has no training/resume story at all, SURVEY §5.4)."""
    path = str(tmp_path / "train_state")
    t_a = lt.LoRATrainer.from_pipeline(pipe, tcfg)
    for _ in range(2):
        t_a.step(batch)
    lt.save_train_state(path, t_a)
    for _ in range(2):
        t_a.step(batch)

    t_b = lt.LoRATrainer.from_pipeline(pipe, tcfg)
    t_b = lt.restore_train_state(path, t_b)
    assert t_b._steps == 2
    for _ in range(2):
        t_b.step(batch)
    for a, b in zip(jax.tree_util.tree_leaves(t_a.lora),
                    jax.tree_util.tree_leaves(t_b.lora)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_lora_npz_fallback(tmp_path, pipe, tcfg, monkeypatch):
    """save_lora falls back to .npz when safetensors is missing, and the
    archive holds the diffusers keys."""
    import builtins

    lora = lt.init_lora(pipe.tfm_params, tcfg, jax.random.PRNGKey(0))
    real_import = builtins.__import__

    def no_safetensors(name, *a, **kw):
        if name.startswith("safetensors"):
            raise ImportError(name)
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_safetensors)
    p = str(tmp_path / "adapter")
    lt.save_lora(p, lora, tcfg)
    data = np.load(p + ".npz")
    assert any(k.endswith("lora_A.weight") for k in data.files)


def test_train_state_resume_on_mesh(tmp_path, tcfg, batch):
    """Mesh train-state resume (ADVICE r4 medium): restore must land each
    leaf on its OWN live sharding, not SingleDeviceSharding — a restore
    pinned to device 0 makes the next TP×DP step fail with 'incompatible
    devices'. save on mesh → restore into a fresh mesh trainer → step."""
    from qwen_image_edit_streamdiffusion_tpu.core.meshes import make_mesh

    mesh = make_mesh(cfg_axis=2, model_axis=4)
    pipe_m = EditPipeline.create("tiny", seed=0, mesh=mesh)
    t_a = lt.LoRATrainer.from_pipeline(pipe_m, tcfg)
    t_a.step(batch)
    path = str(tmp_path / "mesh_state")
    lt.save_train_state(path, t_a)

    pipe_b = EditPipeline.create("tiny", seed=0, mesh=mesh)
    t_b = lt.LoRATrainer.from_pipeline(pipe_b, tcfg)
    t_b = lt.restore_train_state(path, t_b)
    assert t_b._steps == 1
    loss_a = t_a.step(batch)
    loss_b = t_b.step(batch)  # raised pre-fix: incompatible devices
    assert abs(loss_a - loss_b) < 5e-2 * max(1.0, abs(loss_a))
