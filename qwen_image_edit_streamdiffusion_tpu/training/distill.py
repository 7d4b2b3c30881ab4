"""Progressive step distillation — train your own Lightning-style LoRA.

The reference's entire speed story rests on a pre-distilled few-step
adapter (`lightx2v/Qwen-Image-Lightning`, loaded at server.py:76-79;
README.md:15-17 credits it with the 20× headline) that it has no way to
produce. This module closes that loop with progressive distillation
(Salimans & Ho 2022) adapted to flow matching: a frozen teacher (the base
model) integrates TWO Euler half-steps across each interval of the
student's few-step serving schedule, and a LoRA student learns the ONE
velocity that lands at the same endpoint:

    x_t at σ_i of the student's own make_schedule grid (upstream-exact
    sigmas incl. the resolution-dependent exponential shift and the
    shift_terminal stretch — train exactly where serving evaluates)
    teacher: x_m = x_t + (σ_m − σ_i)·v(x_t);  x_e = x_m + (σ_e − σ_m)·v(x_m)
    target:  v* = (x_e − x_t) / (σ_e − σ_i)          (stop-gradient)
    loss:    ‖v_student(x_t, σ_i) − v*‖²

TPU shape: the teacher's two forwards run gradient-free (XLA frees their
activations — no backward residuals), the student forward reuses the LoRA
train machinery (per-block-rematerialized adapter fusion, flash-attention
custom VJP, rows DP over the `cfg` axis), so a distillation step costs one
LoRA train step plus two inference forwards and fits wherever the LoRA
fine-tune fits. Artifacts are ordinary LoRA state dicts — save_lora →
fuse_lora → serve at `num_inference_steps = student_steps`, exactly like
the reference serves its Lightning adapter.

Optional guided distillation (`teacher_cfg_scale > 1` + a negative batch):
the teacher velocity is the norm-rescaled CFG combination, so the student
internalizes guidance and serves CFG-free — how Lightning-style adapters
absorb the negative-prompt cost.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qwen_image_edit_streamdiffusion_tpu.core.config import (
    ModelConfig,
    SchedulerConfig,
)
from qwen_image_edit_streamdiffusion_tpu.models import scheduler as sched
from qwen_image_edit_streamdiffusion_tpu.models import transformer as tfm
from qwen_image_edit_streamdiffusion_tpu.training.lora_train import (
    LoRATrainer,
    TrainConfig,
    merge_block,
)


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    """Progressive-distillation hyperparameters on top of TrainConfig."""

    train: TrainConfig = TrainConfig()
    student_steps: int = 2       # the serving step count being distilled
    # teacher CFG: 0/1 disables; >1 requires neg_txt/neg_mask in the batch
    teacher_cfg_scale: float = 0.0


def _model_v(params, model_cfg, x_t, cond, txt, txt_mask, t, ropes,
             use_flash, mesh, remat=False, lora_blocks=None, scale=1.0):
    """Velocity prediction on the target tokens (cond tokens ride along,
    predictions discarded — the serving-forward contract)."""
    l_img = x_t.shape[1]
    inp = jnp.concatenate([x_t, cond.astype(x_t.dtype)], axis=1)
    kw = {}
    if lora_blocks is not None:
        kw = dict(blocks_extra=lora_blocks,
                  block_map=lambda blk, lb: merge_block(blk, lb, scale))
    v = tfm.forward(params, model_cfg, inp, txt, t, ropes,
                    txt_mask=txt_mask, use_flash=use_flash, mesh=mesh,
                    remat=remat, **kw)
    return v[:, :l_img].astype(jnp.float32)


def build_distill_step(
    model_cfg: ModelConfig,
    sched_cfg: SchedulerConfig,
    dcfg: DistillConfig,
    opt,
    img_shapes: Tuple[Tuple[int, int, int], ...],
    txt_len: int,
    batch: int,
    mesh=None,
    use_flash: bool = False,
):
    """Pure distillation step for one geometry bucket:

    step(base, lora, opt_state, x0, cond, txt, txt_mask,
         neg_txt, neg_mask, rng) -> (lora, opt_state, loss)

    neg_txt/neg_mask are ignored unless teacher_cfg_scale > 1 (pass the
    positive embeds again to keep one jitted signature)."""
    import optax

    cfg = dcfg.train
    ropes = tfm.make_rope(model_cfg, img_shapes, txt_len)
    scale = cfg.alpha / cfg.rank
    f, h0, w0 = img_shapes[0]
    image_seq_len = f * h0 * w0
    # the student's serving schedule — static, folds into the graph
    schedule = sched.make_schedule(dcfg.student_steps, image_seq_len,
                                   sched_cfg)
    guided = dcfg.teacher_cfg_scale and dcfg.teacher_cfg_scale > 1.0

    tp_mesh = mesh if (mesh is not None and "model" in mesh.axis_names
                       and mesh.shape["model"] > 1) else None
    dp = (mesh is not None and "cfg" in mesh.axis_names
          and mesh.shape["cfg"] > 1 and batch % mesh.shape["cfg"] == 0)

    def _dp(x):
        if dp:
            from qwen_image_edit_streamdiffusion_tpu.parallel.sharding \
                import batch_sharding
            return jax.lax.with_sharding_constraint(x, batch_sharding(mesh))
        return x

    def _after(x, *deps):
        """Data-dependency gate: forces XLA to schedule everything feeding
        `deps` BEFORE any consumer of the returned x. Without it the
        scheduler overlaps the teacher's cond/uncond forwards and the
        student forward, and their live activations stack — measured
        16.36 GB (EXCEEDS) vs in-budget with sequencing at 20B."""
        return jax.lax.optimization_barrier((x, *deps))[0]

    def teacher_v(base, x_t, cond, txt, txt_mask, neg_txt, neg_mask, t):
        v = _model_v(base, model_cfg, x_t, cond, txt, txt_mask, t, ropes,
                     use_flash, tp_mesh)
        if guided:
            v_neg = _model_v(base, model_cfg, _after(x_t, v), cond,
                             neg_txt, neg_mask,
                             t, ropes, use_flash, tp_mesh)
            g = v_neg + dcfg.teacher_cfg_scale * (v - v_neg)
            # norm-rescaled CFG — the serving combination
            # (pipeline/edit_pipeline.py), so the student learns exactly
            # the guided velocity the reference serves
            norm_v = jnp.linalg.norm(v, axis=-1, keepdims=True)
            norm_g = jnp.linalg.norm(g, axis=-1, keepdims=True)
            g = g * (norm_v / jnp.maximum(norm_g, 1e-6))
            return g
        return v

    def step(base, lora, opt_state, x0, cond, txt, txt_mask,
             neg_txt, neg_mask, rng):
        k_i, k_eps = jax.random.split(rng)
        x0 = _dp(x0).astype(jnp.float32)
        cond = _dp(cond)
        txt, txt_mask = _dp(txt), _dp(txt_mask)
        neg_txt, neg_mask = _dp(neg_txt), _dp(neg_mask)
        # per-row interval of the student schedule
        i = jax.random.randint(k_i, (batch,), 0, dcfg.student_steps)
        i = _dp(i)
        sig_t = schedule.sigmas[i]          # (B,)
        sig_e = schedule.sigmas[i + 1]
        sig_m = 0.5 * (sig_t + sig_e)
        eps = _dp(jax.random.normal(k_eps, x0.shape, jnp.float32))
        st = sig_t[:, None, None]
        x_t = ((1.0 - st) * x0 + st * eps)
        x_t_m = x_t.astype(jnp.dtype(model_cfg.dtype))

        # frozen teacher: two Euler half-steps across the student interval
        t1000 = lambda s: s * sched_cfg.num_train_timesteps
        v1 = teacher_v(base, x_t_m, cond, txt, txt_mask, neg_txt, neg_mask,
                       t1000(sig_t))
        x_m = sched.euler_step(x_t, v1, sig_t[:, None, None],
                               sig_m[:, None, None])
        v2 = teacher_v(base, x_m.astype(x_t_m.dtype), cond, txt, txt_mask,
                       neg_txt, neg_mask, t1000(sig_m))
        x_e = sched.euler_step(x_m, v2, sig_m[:, None, None],
                               sig_e[:, None, None])
        v_star = jax.lax.stop_gradient(
            (x_e - x_t) / (sig_e - sig_t)[:, None, None])
        # student runs strictly after the teacher (not overlapped)
        x_t_m = _after(x_t_m, v_star)

        def loss_fn(lo):
            v_s = _model_v(base, model_cfg, x_t_m, cond, txt, txt_mask,
                           t1000(sig_t), ropes, use_flash, tp_mesh,
                           remat=cfg.remat, lora_blocks=lo["blocks"],
                           scale=scale)
            return jnp.mean(jnp.square(v_s - v_star))

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_state = opt.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return step


class DistillTrainer(LoRATrainer):
    """LoRATrainer whose step optimizes the progressive-distillation
    objective. Same adapter tree / optimizer / export / resume machinery —
    only the jitted step differs. Batches come from the same
    :func:`~.lora_train.build_batch` (add ``neg_txt``/``neg_mask`` rows
    for guided distillation)."""

    def __init__(self, base_params, model_cfg, sched_cfg,
                 dcfg: DistillConfig, mesh=None, use_flash: bool = False):
        super().__init__(base_params, model_cfg, sched_cfg, dcfg.train,
                         mesh=mesh, use_flash=use_flash)
        self.dcfg = dcfg

    @classmethod
    def from_pipeline(cls, pipe, dcfg: DistillConfig) -> "DistillTrainer":
        return cls(pipe.tfm_params, pipe.preset.model, pipe.preset.scheduler,
                   dcfg, mesh=pipe.mesh,
                   use_flash=pipe.config.use_flash_attention)

    def _step_fn(self, img_shapes, txt_len, batch):
        key = (img_shapes, txt_len, batch)
        if key in self._jit_cache:
            return self._jit_cache[key]
        step = build_distill_step(
            self.model_cfg, self.sched_cfg, self.dcfg, self.opt,
            img_shapes, txt_len, batch, mesh=self.mesh,
            use_flash=self.use_flash)
        self._jit_cache[key] = jax.jit(step, donate_argnums=(1, 2))
        return self._jit_cache[key]

    def step(self, batch: Dict[str, Any],
             key: Optional[jax.Array] = None) -> float:
        if key is None:
            self._key, key = jax.random.split(self._key)
        x0 = jnp.asarray(batch["x0_tokens"])
        cond = jnp.asarray(batch["cond_tokens"])
        txt = jnp.asarray(batch["txt"])
        mask = jnp.asarray(batch["txt_mask"])
        neg_txt = jnp.asarray(batch.get("neg_txt", batch["txt"]))
        neg_mask = jnp.asarray(batch.get("neg_mask", batch["txt_mask"]))
        img_shapes = tuple(batch["img_shapes"])
        fn = self._step_fn(img_shapes, int(txt.shape[1]), int(x0.shape[0]))
        self.lora, self.opt_state, loss = fn(
            self.base_params, self.lora, self.opt_state, x0, cond, txt,
            mask, neg_txt, neg_mask, key)
        self._steps += 1
        return float(np.asarray(loss))


def main(argv=None):
    import argparse
    import time

    ap = argparse.ArgumentParser(
        description="Distill a few-step Lightning-style LoRA from the "
                    "base model (progressive distillation demo)")
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--student-steps", type=int, default=2)
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--cfg-scale", type=float, default=0.0,
                    help=">1 distills norm-rescaled teacher guidance into "
                    "the student (serves CFG-free)")
    ap.add_argument("--save", default=None, help="write LoRA .safetensors")
    args = ap.parse_args(argv)

    from qwen_image_edit_streamdiffusion_tpu.core import imaging
    from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
        EditPipeline,
    )
    from qwen_image_edit_streamdiffusion_tpu.training import lora_train as lt

    pipe = EditPipeline.create(args.preset, seed=0)
    dcfg = DistillConfig(
        train=TrainConfig(rank=args.rank, alpha=float(args.rank),
                          learning_rate=args.lr),
        student_steps=args.student_steps,
        teacher_cfg_scale=args.cfg_scale,
    )
    trainer = DistillTrainer.from_pipeline(pipe, dcfg)
    items = []
    for i in range(args.batch):
        src = imaging.make_test_image(96, 96, "gradient")
        tgt = imaging.make_test_image(96, 96, "circle")
        items.append({"image": src, "prompt": "draw a circle",
                      "target": tgt})
    batch = lt.build_batch(pipe, items)
    losses = []
    for i in range(args.steps):
        t0 = time.time()
        loss = trainer.step(batch)
        losses.append(loss)
        print(f"step {i:3d}  loss {loss:.5f}  {time.time() - t0:.2f}s",
              flush=True)
    print(f"loss first→last: {losses[0]:.5f} → {losses[-1]:.5f}")
    if args.save:
        lt.save_lora(args.save, trainer.lora, dcfg.train)
        print(f"saved {args.save} — serve with num_inference_steps="
              f"{args.student_steps}")


if __name__ == "__main__":
    main()
