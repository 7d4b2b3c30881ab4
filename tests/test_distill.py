"""Progressive step distillation (training/distill.py).

Reference parity note: the reference SERVES a pre-distilled Lightning
LoRA (server.py:76-79) — the distillation that produced it lives off-repo.
These tests cover the in-repo recipe: teacher two-half-step targets on the
student's serving schedule, LoRA student, exportable adapters.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.core import imaging
from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
    EditPipeline,
)
from qwen_image_edit_streamdiffusion_tpu.training import distill as dt
from qwen_image_edit_streamdiffusion_tpu.training import lora_train as lt


@pytest.fixture(scope="module")
def pipe():
    return EditPipeline.create("tiny", seed=0)


@pytest.fixture(scope="module")
def dcfg():
    return dt.DistillConfig(
        train=lt.TrainConfig(rank=4, alpha=4.0, learning_rate=5e-3,
                             targets=("attn.to_q", "attn.to_v"),
                             remat=False),
        student_steps=2,
    )


@pytest.fixture(scope="module")
def batch(pipe):
    items = [{
        "image": imaging.make_test_image(96, 96, "gradient"),
        "prompt": "draw a circle",
        "target": imaging.make_test_image(96, 96, "circle"),
    }, {
        "image": imaging.make_test_image(96, 96, "circle"),
        "prompt": "remove the circle",
        "target": imaging.make_test_image(96, 96, "gradient"),
    }]
    return lt.build_batch(pipe, items)


def test_distill_loss_decreases(pipe, dcfg, batch):
    trainer = dt.DistillTrainer.from_pipeline(pipe, dcfg)
    losses = [trainer.step(batch, key=jax.random.PRNGKey(3))
              for _ in range(6)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_guided_equals_unguided_when_negative_is_positive(pipe, dcfg,
                                                          batch):
    """Exact property: with neg embeds == pos embeds the norm-rescaled CFG
    teacher velocity collapses to the unguided one (g = v + w·(v−v) = v,
    rescale = 1), so the guided step must produce the identical loss."""
    guided = dt.DistillTrainer.from_pipeline(
        pipe, dataclasses.replace(dcfg, teacher_cfg_scale=4.0))
    plain = dt.DistillTrainer.from_pipeline(pipe, dcfg)
    k = jax.random.PRNGKey(11)
    l_g = guided.step(batch, key=k)   # batch has no neg rows → neg := pos
    l_p = plain.step(batch, key=k)
    assert abs(l_g - l_p) < 1e-5 * max(1.0, abs(l_p))


def test_distilled_adapter_round_trips_into_serving(pipe, dcfg, batch):
    """Distilled adapters are ordinary LoRA state dicts: export → fuse →
    a 2-step edit runs finite (serve at num_inference_steps=student_steps
    exactly like the reference serves its Lightning adapter)."""
    from qwen_image_edit_streamdiffusion_tpu.models import lora as lora_mod

    trainer = dt.DistillTrainer.from_pipeline(pipe, dcfg)
    trainer.step(batch, key=jax.random.PRNGKey(5))
    sd = lt.export_lora_state_dict(trainer.lora, dcfg.train)
    fused = lora_mod.fuse_lora(pipe.tfm_params, sd)
    pipe2 = dataclasses.replace(pipe, tfm_params=fused)
    res = pipe2(imaging.make_test_image(96, 96, "gradient"),
                "draw a circle",
                num_inference_steps=dcfg.student_steps)
    arr = np.asarray(res.images[0], np.float32)
    assert np.isfinite(arr).all()


def test_guided_distill_with_real_negatives(pipe, dcfg):
    """build_batch emits neg_txt/neg_mask when items carry a
    negative_prompt, and a real (neg ≠ pos) CFG teacher produces a
    different, finite loss than the unguided teacher."""
    items = [{
        "image": imaging.make_test_image(96, 96, "gradient"),
        "prompt": "draw a circle",
        "negative_prompt": "blurry, low quality",
        "target": imaging.make_test_image(96, 96, "circle"),
    }, {
        "image": imaging.make_test_image(96, 96, "circle"),
        "prompt": "remove the circle",
        "negative_prompt": "blurry, low quality",
        "target": imaging.make_test_image(96, 96, "gradient"),
    }]
    nbatch = lt.build_batch(pipe, items)
    assert "neg_txt" in nbatch and "neg_mask" in nbatch
    assert nbatch["neg_txt"].shape == nbatch["txt"].shape

    guided = dt.DistillTrainer.from_pipeline(
        pipe, dataclasses.replace(dcfg, teacher_cfg_scale=4.0))
    plain = dt.DistillTrainer.from_pipeline(pipe, dcfg)
    k = jax.random.PRNGKey(13)
    l_g = guided.step(nbatch, key=k)
    l_p = plain.step(nbatch, key=k)
    assert np.isfinite(l_g) and np.isfinite(l_p)
    assert abs(l_g - l_p) > 1e-7  # the guided target actually differs


def test_teacher_target_is_two_half_steps(pipe, dcfg, batch):
    """v* wiring check at zero adapters: the student's initial prediction
    equals the teacher's σ_t velocity (b=0 ⇒ identical params), so the
    step-0 loss equals E‖v_teacher(x_t, σ_t) − v*‖² — strictly positive
    unless the teacher velocity field is constant across the interval
    (it isn't), and bounded by the two-velocity spread."""
    trainer = dt.DistillTrainer.from_pipeline(pipe, dcfg)
    loss0 = trainer.step(batch, key=jax.random.PRNGKey(7))
    assert np.isfinite(loss0) and loss0 > 0.0
