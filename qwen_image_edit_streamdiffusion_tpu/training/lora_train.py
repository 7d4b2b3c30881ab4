"""LoRA fine-tuning of the edit transformer, TPU-native.

The reference serves a *pre-distilled* Lightning LoRA
(server.py:76-79 loads ``lightx2v/Qwen-Image-Lightning``) but ships no way
to produce or adapt one — the training side of its LoRA story lives
off-repo. This module closes that loop: a flow-matching LoRA fine-tune
harness whose artifacts round-trip into the exact serving path
(``export_lora_state_dict`` emits the diffusers/peft key layout that
``models.lora.fuse_lora`` consumes, so train → save → fuse → jit-serve
works end to end with zero format glue).

TPU-first design:

- **One jitted train step per geometry bucket** (img_shapes, txt bucket,
  batch rows) — same bucketing discipline as the serving pipeline, so step
  time is stable and nothing retraces mid-run.
- **Frozen base, trainable adapters**: gradients flow only through the
  low-rank ``a @ b`` deltas; the 20B base stays in bf16 exactly as served
  (TP-sharded over the ``model`` mesh axis when a mesh is active). Deltas
  are *applied functionally inside the step* — the fused weight
  ``w + scale·(a@b)`` is an XLA temporary, never materialized parameter
  state, so LoRA training fits wherever inference fits plus optimizer
  slots (rank·(in+out) per target, f32 Adam ≈ 12 bytes/element — MBs, not
  GBs).
- **Data parallelism over the ``cfg`` mesh axis**: batch rows shard over
  the axis parallel CFG uses at serve time (idle during training);
  adapters are replicated and XLA inserts the gradient ``psum``
  automatically from the GSPMD annotations.
- **Flow-matching objective matching the serving scheduler exactly**
  (models/scheduler.py conventions): x_σ = (1−σ)·x₀ + σ·ε, target
  v = ε − x₀, with logit-normal σ sampling pushed through the same
  resolution-dependent exponential shift the sampler uses
  (``compute_mu``/``_time_shift_exponential``) so training density
  concentrates where the few-step sampler actually evaluates.

Reference behavior this must compose with: LoRA fusion before jit
(models/lora.py; the reference documents the dynamic-LoRA-vs-compile
conflict at README.md:108).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qwen_image_edit_streamdiffusion_tpu.core.config import (
    ModelConfig,
    SchedulerConfig,
)
from qwen_image_edit_streamdiffusion_tpu.models import scheduler as sched
from qwen_image_edit_streamdiffusion_tpu.models import transformer as tfm
from qwen_image_edit_streamdiffusion_tpu.models.lora import BLOCK_MODULE_MAP

Params = Any

# Default adapter targets: every attention projection (the Lightning LoRA's
# target set). Keys are diffusers module names — the same table that drives
# checkpoint conversion and LoRA fusion (models/lora.py:BLOCK_MODULE_MAP).
DEFAULT_TARGETS: Tuple[str, ...] = (
    "attn.to_q", "attn.to_k", "attn.to_v", "attn.to_out.0",
    "attn.add_q_proj", "attn.add_k_proj", "attn.add_v_proj",
    "attn.to_add_out",
)
MLP_TARGETS: Tuple[str, ...] = (
    "img_mlp.net.0.proj", "img_mlp.net.2",
    "txt_mlp.net.0.proj", "txt_mlp.net.2",
)

# Reverse map: our block-relative param path -> diffusers module name
# (export needs it; modulation layers are single-path entries).
_PATH_TO_MODULE = {v: k for k, v in BLOCK_MODULE_MAP.items()}


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """LoRA fine-tune hyperparameters."""

    rank: int = 16
    alpha: float = 16.0  # fused scale = alpha / rank (peft convention)
    targets: Tuple[str, ...] = DEFAULT_TARGETS
    learning_rate: float = 1e-4
    weight_decay: float = 0.0  # on adapter weights only
    b1: float = 0.9
    b2: float = 0.999
    grad_clip: float = 1.0  # global-norm clip; 0 disables
    # Logit-normal timestep density (SD3 recipe): t = sigmoid(N(mean, std)),
    # then the serving scheduler's resolution shift is applied.
    timestep_mean: float = 0.0
    timestep_std: float = 1.0
    shift_timesteps: bool = True  # apply compute_mu exponential shift
    # jax.checkpoint each block: backward saves only block-boundary
    # residuals and recomputes within-block activations + the per-block
    # fused weights — what lets the 20B train step fit the serving pods
    remat: bool = True
    seed: int = 0


# ---------------------------------------------------------------------------
# Adapter parameter tree
# ---------------------------------------------------------------------------


def _target_paths(targets: Sequence[str]) -> List[Tuple[str, ...]]:
    paths = []
    for t in targets:
        if t not in BLOCK_MODULE_MAP:
            raise ValueError(
                f"unknown LoRA target {t!r}; known: "
                f"{sorted(BLOCK_MODULE_MAP)}"
            )
        paths.append(BLOCK_MODULE_MAP[t])
    return paths


# q/k/v may be concatenated by models.optimize.fuse_qkv (the default
# serving layout); adapters stay per-projection and their deltas land in
# the matching column block — mirror of models/lora.py's fusion logic.
_FUSED_SLOT = {"img_q": ("img_qkv", 0), "img_k": ("img_qkv", 1),
               "img_v": ("img_qkv", 2), "txt_q": ("txt_qkv", 0),
               "txt_k": ("txt_qkv", 1), "txt_v": ("txt_qkv", 2)}


def _resolve_target(block: dict, path: Tuple[str, ...]):
    """→ (leaf, col_slot, d_in, d_out): the param leaf a target path lands
    in, the fused-qkv column slot (None for a plain linear), and the
    adapter dims."""
    def dense_w(leaf):
        if "w" not in leaf:
            raise ValueError(
                "LoRA training requires dense weights — quantized "
                "(int8/int4) base params cannot be adapter-trained; train "
                "on bf16, then quantize the fused result"
            )
        return leaf["w"]

    node = block
    for p in path:
        if p not in node:
            if p in _FUSED_SLOT and _FUSED_SLOT[p][0] in node:
                fused_name, slot = _FUSED_SLOT[p]
                leaf = node[fused_name]
                d_in, d3 = dense_w(leaf).shape
                return leaf, slot, d_in, d3 // 3
            raise ValueError(f"param path {path} missing at {p!r}")
        node = node[p]
    d_in, d_out = dense_w(node).shape
    return node, None, d_in, d_out


def init_lora(params: Params, cfg: TrainConfig, key: jax.Array) -> Params:
    """Zero-effect adapter tree mirroring ``params['blocks']``.

    Per target linear: ``a`` (in, r) ~ N(0, 1/in) f32, ``b`` (r, out)
    zeros — the standard LoRA init (delta starts at exactly 0, so step 0
    reproduces the base model bit-for-bit through ``apply_lora``).
    """
    paths = _target_paths(cfg.targets)
    blocks = []
    for blk in params["blocks"]:
        lb: dict = {}
        for path in paths:
            _, _, d_in, d_out = _resolve_target(blk, path)
            key, k1 = jax.random.split(key)
            node = lb
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node[path[-1]] = {
                "a": (jax.random.normal(k1, (d_in, cfg.rank), jnp.float32)
                      / np.sqrt(d_in)),
                "b": jnp.zeros((cfg.rank, d_out), jnp.float32),
            }
        blocks.append(lb)
    return {"blocks": blocks}


def _is_lora_leaf(node) -> bool:
    return (isinstance(node, dict) and set(node) == {"a", "b"}
            and not isinstance(node["a"], dict))


def merge_block(p_node: dict, l_node: dict, scale: float) -> dict:
    """One block's effective params: w_eff = w + scale·(a @ b), cast to the
    base dtype (fused-qkv targets land in their column slot).

    Used per block INSIDE the rematerialized region of the train step
    (tfm.forward block_map), so the fused weights are recomputed in the
    backward instead of being saved — a second full parameter copy never
    becomes resident."""
    out = dict(p_node)
    for k, sub in l_node.items():
        if _is_lora_leaf(sub):
            delta = (sub["a"] @ sub["b"]) * scale
            name, slot = k, None
            if k not in out and k in _FUSED_SLOT:
                name, slot = _FUSED_SLOT[k]
            leaf = dict(out[name])
            w = leaf["w"]
            w32 = w.astype(jnp.float32)
            if slot is None:
                w32 = w32 + delta
            else:
                d_out = delta.shape[1]
                sl = slice(slot * d_out, (slot + 1) * d_out)
                w32 = w32.at[:, sl].add(delta)
            leaf["w"] = w32.astype(w.dtype)
            out[name] = leaf
        else:
            out[k] = merge_block(out[k], sub, scale)
    return out


def apply_lora(params: Params, lora: Params, scale: float) -> Params:
    """Functionally fuse adapters over the whole tree (export/equivalence
    checks; the train step fuses per block via :func:`merge_block`)."""
    out = dict(params)
    out["blocks"] = [merge_block(pb, lb, scale)
                     for pb, lb in zip(params["blocks"], lora["blocks"])]
    return out


# ---------------------------------------------------------------------------
# Objective
# ---------------------------------------------------------------------------


def sample_sigmas(
    key: jax.Array, batch: int, cfg: TrainConfig,
    image_seq_len: int, sched_cfg: SchedulerConfig,
) -> jnp.ndarray:
    """Per-row training sigmas: logit-normal in (0, 1), then the serving
    scheduler's resolution-dependent exponential shift (so the training
    noise-level density matches where ``make_schedule`` places the few-step
    sampler's evaluations)."""
    u = jax.random.normal(key, (batch,), jnp.float32)
    t = jax.nn.sigmoid(cfg.timestep_mean + cfg.timestep_std * u)
    t = jnp.clip(t, 1e-5, 1.0 - 1e-5)
    if cfg.shift_timesteps:
        mu = sched.compute_mu(image_seq_len, sched_cfg)
        t = sched._time_shift_exponential(mu, t)
    return t


def flow_match_loss(
    base_params: Params,
    lora: Params,
    scale: float,
    model_cfg: ModelConfig,
    x0_tokens: jnp.ndarray,      # (B, L_img, C) packed target latents
    cond_tokens: jnp.ndarray,    # (B, L_cond, C) packed condition latents
    txt: jnp.ndarray,            # (B, L_txt, joint_dim)
    txt_mask: jnp.ndarray,       # (B, L_txt) bool
    sigmas: jnp.ndarray,         # (B,) training noise levels
    noise: jnp.ndarray,          # (B, L_img, C)
    ropes: tfm.RopeTables,
    use_flash: bool = False,
    mesh=None,
    remat: bool = True,
) -> jnp.ndarray:
    """MSE between predicted and true velocity (v = ε − x₀) on the target
    tokens; condition tokens ride along in the sequence with predictions
    discarded — the exact serving-forward contract
    (pipeline/edit_pipeline.py model_call).

    Adapters fuse per block inside the (rematerialized) block body via
    tfm.forward's block_map hook: differentiable w.r.t. ``lora`` while the
    fused weights stay recompute-only."""
    l_img = x0_tokens.shape[1]
    s = sigmas[:, None, None]
    x0 = x0_tokens.astype(jnp.float32)
    eps = noise.astype(jnp.float32)
    x_t = ((1.0 - s) * x0 + s * eps).astype(x0_tokens.dtype)
    inp = jnp.concatenate([x_t, cond_tokens.astype(x_t.dtype)], axis=1)
    t = sigmas * 1000.0  # train-timestep units (scheduler convention)
    v = tfm.forward(
        base_params, model_cfg, inp, txt, t, ropes,
        txt_mask=txt_mask, use_flash=use_flash, mesh=mesh, remat=remat,
        blocks_extra=lora["blocks"],
        block_map=lambda blk, lb: merge_block(blk, lb, scale),
    )
    v = v[:, :l_img].astype(jnp.float32)
    target = eps - x0
    return jnp.mean(jnp.square(v - target))


def build_step(
    model_cfg: ModelConfig,
    sched_cfg: SchedulerConfig,
    cfg: TrainConfig,
    opt,
    img_shapes: Tuple[Tuple[int, int, int], ...],
    txt_len: int,
    batch: int,
    mesh=None,
    use_flash: bool = False,
):
    """Pure train-step function for one geometry bucket (shared by the
    trainer's jit cache and the 20B AOT memory budget in
    benchmarks/lower_full.py --train):

    step(base, lora, opt_state, x0, cond, txt, txt_mask, rng)
        -> (lora, opt_state, loss)

    Batch rows data-parallelize over the ``cfg`` mesh axis (idle at train
    time), the base transformer stays TP-sharded over ``model``; the
    adapter gradient psum is inserted by GSPMD from the annotations."""
    import optax

    ropes = tfm.make_rope(model_cfg, img_shapes, txt_len)
    scale = cfg.alpha / cfg.rank
    f, h0, w0 = img_shapes[0]
    image_seq_len = f * h0 * w0

    tp_mesh = mesh if (mesh is not None and "model" in mesh.axis_names
                       and mesh.shape["model"] > 1) else None
    dp = (mesh is not None and "cfg" in mesh.axis_names
          and mesh.shape["cfg"] > 1 and batch % mesh.shape["cfg"] == 0)

    def _dp(x):
        if dp:
            from qwen_image_edit_streamdiffusion_tpu.parallel.sharding \
                import batch_sharding
            return jax.lax.with_sharding_constraint(
                x, batch_sharding(mesh))
        return x

    def step(base, lora, opt_state, x0, cond, txt, txt_mask, rng):
        k_sig, k_eps = jax.random.split(rng)
        sigmas = sample_sigmas(k_sig, batch, cfg, image_seq_len, sched_cfg)
        noise = jax.random.normal(k_eps, x0.shape, jnp.float32)
        x0, cond = _dp(x0), _dp(cond)
        txt, txt_mask = _dp(txt), _dp(txt_mask)
        sigmas, noise = _dp(sigmas), _dp(noise)

        def loss_fn(lo):
            return flow_match_loss(
                base, lo, scale, model_cfg, x0, cond, txt, txt_mask,
                sigmas, noise, ropes, use_flash=use_flash, mesh=tp_mesh,
                remat=cfg.remat)

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_state = opt.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return step


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------


class LoRATrainer:
    """Geometry-bucketed jitted LoRA train steps over a frozen base.

    Usage::

        trainer = LoRATrainer.from_pipeline(pipe, TrainConfig(rank=16))
        batch = build_batch(pipe, items)        # or your own tokens
        for _ in range(steps):
            loss = trainer.step(batch)
        save_lora(path, trainer.lora, trainer.cfg)

    The saved file loads straight into serving:
    ``EditPipeline.create(..., lora=load_lora_weights(path))`` /
    ``models.lora.fuse_lora`` (same diffusers key layout the reference's
    Lightning LoRA uses).
    """

    def __init__(self, base_params: Params, model_cfg: ModelConfig,
                 sched_cfg: SchedulerConfig, cfg: TrainConfig,
                 mesh=None, use_flash: bool = False):
        import optax

        self.base_params = base_params
        self.model_cfg = model_cfg
        self.sched_cfg = sched_cfg
        self.cfg = cfg
        self.mesh = mesh
        self.use_flash = use_flash
        self.lora = init_lora(base_params, cfg,
                              jax.random.PRNGKey(cfg.seed))
        chain = []
        if cfg.grad_clip:
            chain.append(optax.clip_by_global_norm(cfg.grad_clip))
        chain.append(optax.adamw(cfg.learning_rate, b1=cfg.b1, b2=cfg.b2,
                                 weight_decay=cfg.weight_decay))
        self.opt = optax.chain(*chain)
        self.opt_state = self.opt.init(self.lora)
        self._key = jax.random.PRNGKey(cfg.seed + 1)
        self._jit_cache: Dict[Tuple, Any] = {}
        self._steps = 0

    @classmethod
    def from_pipeline(cls, pipe, cfg: TrainConfig) -> "LoRATrainer":
        return cls(pipe.tfm_params, pipe.preset.model, pipe.preset.scheduler,
                   cfg, mesh=pipe.mesh,
                   use_flash=pipe.config.use_flash_attention)

    # -- jitted step per geometry bucket --------------------------------

    def _step_fn(self, img_shapes: Tuple[Tuple[int, int, int], ...],
                 txt_len: int, batch: int):
        key = (img_shapes, txt_len, batch)
        if key in self._jit_cache:
            return self._jit_cache[key]
        step = build_step(self.model_cfg, self.sched_cfg, self.cfg,
                          self.opt, img_shapes, txt_len, batch,
                          mesh=self.mesh, use_flash=self.use_flash)
        self._jit_cache[key] = jax.jit(step, donate_argnums=(1, 2))
        return self._jit_cache[key]

    def step(self, batch: Dict[str, Any],
             key: Optional[jax.Array] = None) -> float:
        """One optimizer step on a batch dict (see :func:`build_batch`);
        returns the scalar loss (fetches it — the natural sync point)."""
        if key is None:
            self._key, key = jax.random.split(self._key)
        x0 = jnp.asarray(batch["x0_tokens"])
        cond = jnp.asarray(batch["cond_tokens"])
        txt = jnp.asarray(batch["txt"])
        mask = jnp.asarray(batch["txt_mask"])
        img_shapes = tuple(batch["img_shapes"])
        fn = self._step_fn(img_shapes, int(txt.shape[1]), int(x0.shape[0]))
        self.lora, self.opt_state, loss = fn(
            self.base_params, self.lora, self.opt_state, x0, cond, txt,
            mask, key)
        self._steps += 1
        return float(np.asarray(loss))


# ---------------------------------------------------------------------------
# Batch construction from an EditPipeline (instruction-edit fine-tuning)
# ---------------------------------------------------------------------------


def build_batch(pipe, items: Sequence[Dict[str, Any]],
                height: Optional[int] = None,
                width: Optional[int] = None) -> Dict[str, Any]:
    """Assemble a train batch from (condition image(s), prompt, target
    image) triples using the pipeline's own encoders — the data path is
    identical to serving (same resize rules, same VL conditioning, same
    VAE latent normalization), so what you train is what you serve.

    items: [{"image": PIL or [PIL...], "prompt": str, "target": PIL,
             "negative_prompt": str (optional)}, ...]
    All items must share one geometry bucket (output size, n condition
    images, prompt-length bucket) — mirror of the serving graph buckets.
    Any item with a ``negative_prompt`` adds ``neg_txt``/``neg_mask`` rows
    to the batch (items without one fall back to an empty negative) — the
    guided-distillation teacher consumes them (training/distill.py)."""
    from PIL import Image

    enc_reqs, metas = [], []
    want_neg = any("negative_prompt" in it for it in items)
    for it in items:
        image = it["image"]
        images = [image] if isinstance(image, Image.Image) else list(image)
        out_h, out_w, vae_images, vl_images = pipe._prepare_images(
            images, it.get("height", height), it.get("width", width))
        enc_reqs.append((it["prompt"], vl_images))
        if want_neg:
            enc_reqs.append((it.get("negative_prompt", " "), vl_images))
        metas.append((it, out_h, out_w, vae_images))

    all_embs = pipe._encode_prompts(enc_reqs)
    if want_neg:
        embs, neg_embs = all_embs[0::2], all_embs[1::2]
    else:
        embs, neg_embs = all_embs, None
    conds = pipe._encode_conditions_many([m[3] for m in metas])

    mdt = jnp.dtype(pipe.preset.model.dtype)
    l_txt = max(e.embeds.shape[0]
                for e in embs + (neg_embs if want_neg else []))

    def emb_row(emb):
        e = jnp.asarray(emb.embeds, mdt)
        m = jnp.asarray(emb.mask)
        if e.shape[0] < l_txt:
            e = jnp.pad(e, ((0, l_txt - e.shape[0]), (0, 0)))
            m = jnp.pad(m, (0, l_txt - m.shape[0]))
        return e[None], m[None]

    x0_rows, cond_rows, txt_rows, mask_rows = [], [], [], []
    neg_txt_rows, neg_mask_rows = [], []
    geom = None
    for i, ((it, out_h, out_w, _), emb, (cond_tokens, cond_shapes)) in \
            enumerate(zip(metas, embs, conds)):
        target = it["target"]
        from qwen_image_edit_streamdiffusion_tpu.core import imaging
        tgt = np.asarray(imaging.resize(target, out_w, out_h), np.uint8)
        x0_tok, x0_shapes = pipe.encode_condition_latents([tgt])
        g = (tuple(x0_shapes), tuple(cond_shapes))
        if geom is None:
            geom = g
        elif g != geom:
            raise ValueError(
                f"mixed geometry in batch: {g} vs {geom} — bucket items "
                "by (output size, condition count) like the server does")
        x0_rows.append(x0_tok)
        cond_rows.append(cond_tokens)
        e, m = emb_row(emb)
        txt_rows.append(e)
        mask_rows.append(m)
        if want_neg:
            ne, nm = emb_row(neg_embs[i])
            neg_txt_rows.append(ne)
            neg_mask_rows.append(nm)

    x0_shapes, cond_shapes = geom
    out = {
        "x0_tokens": jnp.concatenate(x0_rows, axis=0),
        "cond_tokens": jnp.concatenate(cond_rows, axis=0),
        "txt": jnp.concatenate(txt_rows, axis=0),
        "txt_mask": jnp.concatenate(mask_rows, axis=0),
        "img_shapes": tuple(list(x0_shapes) + list(cond_shapes)),
    }
    if want_neg:
        out["neg_txt"] = jnp.concatenate(neg_txt_rows, axis=0)
        out["neg_mask"] = jnp.concatenate(neg_mask_rows, axis=0)
    return out


# ---------------------------------------------------------------------------
# Export (diffusers/peft key layout — round-trips through models/lora.py)
# ---------------------------------------------------------------------------


def export_lora_state_dict(lora: Params,
                           cfg: TrainConfig) -> Dict[str, np.ndarray]:
    """Adapter tree → flat diffusers-format dict:
    ``transformer_blocks.{i}.{module}.lora_A.weight`` (r, in) /
    ``lora_B.weight`` (out, r) torch layout + ``.alpha`` scalars — exactly
    what ``models.lora.parse_lora_state_dict`` reads, so
    ``fuse_lora(params, export_lora_state_dict(lora, cfg))`` equals
    ``apply_lora(params, lora, alpha/rank)``."""
    out: Dict[str, np.ndarray] = {}

    def walk(node, path, idx):
        for k, sub in node.items():
            if _is_lora_leaf(sub):
                mod = _PATH_TO_MODULE[path + (k,)]
                base = f"transformer_blocks.{idx}.{mod}"
                out[f"{base}.lora_A.weight"] = np.asarray(
                    sub["a"], np.float32).T  # (r, in)
                out[f"{base}.lora_B.weight"] = np.asarray(
                    sub["b"], np.float32).T  # (out, r)
                # 0-d ndarray, not a numpy scalar — safetensors' save_file
                # rejects scalar types (no .ctypes buffer).
                out[f"{base}.alpha"] = np.asarray(cfg.alpha, np.float32)
            else:
                walk(sub, path + (k,), idx)

    for i, blk in enumerate(lora["blocks"]):
        walk(blk, (), i)
    return out


def save_train_state(path: str, trainer: "LoRATrainer") -> None:
    """Orbax checkpoint of the full training state — adapters, Adam
    moments, RNG, step counter — for preemption-safe resume (the reference
    has no training, hence no resume story at all: SURVEY §5.4). The
    frozen base is NOT saved (it's the serving checkpoint)."""
    from qwen_image_edit_streamdiffusion_tpu.models import checkpoint as ckpt

    ckpt.save(path, {
        "lora": trainer.lora,
        "opt_state": trainer.opt_state,
        "rng": trainer._key,
        "step": jnp.asarray(trainer._steps, jnp.int32),
    }, overwrite=True)


def restore_train_state(path: str, trainer: "LoRATrainer") -> "LoRATrainer":
    """Restore a :func:`save_train_state` checkpoint into a freshly built
    trainer (same base params / TrainConfig); returns the trainer resumed
    at the saved step with bit-identical adapters, optimizer moments and
    RNG stream."""
    from qwen_image_edit_streamdiffusion_tpu.models import checkpoint as ckpt

    like = {
        "lora": trainer.lora,
        "opt_state": trainer.opt_state,
        "rng": trainer._key,
        "step": jnp.asarray(trainer._steps, jnp.int32),
    }
    shardings = None
    if trainer.mesh is not None:
        # Adapters/moments are REPLICATED over the mesh (build_step's
        # design — grads psum, TP shards only the frozen base). Restoring
        # without this pins every leaf to device 0 as a COMMITTED array
        # and the next TP×DP step fails with "incompatible devices"
        # (ADVICE r4 medium).
        rep = jax.sharding.NamedSharding(trainer.mesh,
                                         jax.sharding.PartitionSpec())
        shardings = jax.tree_util.tree_map(lambda _: rep, like)
    state = ckpt.load(path, like=like, shardings=shardings)
    trainer.lora = state["lora"]
    trainer.opt_state = state["opt_state"]
    trainer._key = state["rng"]
    trainer._steps = int(np.asarray(state["step"]))
    return trainer


def save_lora(path: str, lora: Params, cfg: TrainConfig) -> None:
    """Write the adapter as .safetensors (readable by
    ``models.lora.load_lora_weights`` AND by diffusers/peft on a GPU box);
    falls back to ``.npz`` when safetensors is absent."""
    sd = export_lora_state_dict(lora, cfg)
    try:
        from safetensors.numpy import save_file

        save_file(sd, path)
    except ImportError:
        np.savez(path if path.endswith(".npz") else path + ".npz", **sd)


# ---------------------------------------------------------------------------
# CLI demo: overfit a tiny synthetic edit pair (smoke/benchmark)
# ---------------------------------------------------------------------------


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="LoRA fine-tune demo: overfit one synthetic edit pair")
    ap.add_argument("--preset", default="tiny")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--rank", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--save", default=None, help="write LoRA .safetensors")
    ap.add_argument("--state", default=None,
                    help="orbax train-state dir: resumed from if it "
                    "exists, saved to after the run (preemption-safe)")
    args = ap.parse_args(argv)

    from qwen_image_edit_streamdiffusion_tpu.core import imaging
    from qwen_image_edit_streamdiffusion_tpu.pipeline.edit_pipeline import (
        EditPipeline,
    )

    import os

    pipe = EditPipeline.create(args.preset, seed=0)
    cfg = TrainConfig(rank=args.rank, alpha=float(args.rank),
                      learning_rate=args.lr)
    trainer = LoRATrainer.from_pipeline(pipe, cfg)
    if args.state and os.path.isdir(args.state):
        trainer = restore_train_state(args.state, trainer)
        print(f"resumed from {args.state} at step {trainer._steps}")

    items = []
    for i in range(args.batch):
        src = imaging.make_test_image(96, 96, "gradient")
        tgt = imaging.make_test_image(96, 96, "circle")
        items.append({"image": src, "prompt": "draw a circle", "target": tgt})
    batch = build_batch(pipe, items)

    import time
    losses = []
    for i in range(args.steps):
        t0 = time.time()
        loss = trainer.step(batch)
        losses.append(loss)
        print(f"step {i:3d}  loss {loss:.5f}  {time.time() - t0:.2f}s",
              flush=True)
    print(f"loss first→last: {losses[0]:.5f} → {losses[-1]:.5f}")
    if args.save:
        save_lora(args.save, trainer.lora, cfg)
        print(f"saved {args.save}")
    if args.state:
        save_train_state(args.state, trainer)
        print(f"train state → {args.state} (step {trainer._steps})")


if __name__ == "__main__":
    main()
