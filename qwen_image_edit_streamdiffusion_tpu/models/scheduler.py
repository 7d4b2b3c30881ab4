"""Flow-matching Euler scheduler with dynamic (resolution-dependent)
exponential timestep shifting.

TPU-native re-design of the FlowMatchEulerDiscreteScheduler the reference
relies on upstream (named at qwen_realtime.py:10 and deliberately kept:
qwen_realtime.py:128-130 — "DPM-Solver++ is incompatible"). Instead of a
stateful scheduler object with ``set_timesteps``/``step`` methods, this is a
pair of pure functions:

- :func:`make_schedule` runs at trace time (static ``num_steps``) and returns
  the full sigma/timestep arrays, so the denoise loop can be a
  ``lax.fori_loop`` over a precomputed table — no data-dependent control
  flow, one compiled graph per (steps, resolution) bucket.
- :func:`euler_step` is the per-iteration update used inside the loop.

Flow-matching convention: the model predicts velocity v ≈ (noise − data), the
latent trajectory is x_σ = (1−σ)·x₀ + σ·ε, and the Euler update is
x_{σ′} = x_σ + (σ′ − σ)·v.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from qwen_image_edit_streamdiffusion_tpu.core.config import SchedulerConfig


class Schedule(NamedTuple):
    """Precomputed denoising schedule.

    sigmas:    (num_steps + 1,) float32, descending, final entry 0.0
    timesteps: (num_steps,) float32, = sigmas[:-1] * num_train_timesteps,
               fed to the transformer's timestep embedding.
    """

    sigmas: jnp.ndarray
    timesteps: jnp.ndarray


def compute_mu(image_seq_len: int, cfg: SchedulerConfig) -> float:
    """Resolution-dependent shift parameter.

    Linear interpolation between (base_image_seq_len → base_shift) and
    (max_image_seq_len → max_shift), evaluated at the actual number of image
    tokens. 1024² output → 4096 tokens → mu ≈ 0.694 with defaults.
    """
    m = (cfg.max_shift - cfg.base_shift) / (
        cfg.max_image_seq_len - cfg.base_image_seq_len
    )
    b = cfg.base_shift - m * cfg.base_image_seq_len
    return image_seq_len * m + b


def _time_shift_exponential(mu: float, sigmas: jnp.ndarray) -> jnp.ndarray:
    """sigma ↦ e^mu / (e^mu + (1/sigma − 1)) — the "exponential" shift."""
    return math.exp(mu) / (math.exp(mu) + (1.0 / sigmas - 1.0))


def make_schedule(
    num_steps: int,
    image_seq_len: int,
    cfg: SchedulerConfig = SchedulerConfig(),
) -> Schedule:
    """Build the sigma schedule for ``num_steps`` inference steps.

    Static-shape by construction: ``num_steps`` and ``image_seq_len`` are
    Python ints, so this folds to constants under jit.
    """
    if num_steps < 1:
        raise ValueError("num_steps must be >= 1")
    # Upstream pipelines seed the scheduler with linspace(1, 1/num_steps)
    # (NOT 1/num_train_timesteps): the trained few-step trajectory ends well
    # above sigma≈0 before the shift/stretch below place the terminus.
    sigmas = jnp.linspace(1.0, 1.0 / num_steps, num_steps, dtype=jnp.float32)
    if cfg.use_dynamic_shifting:
        mu = compute_mu(image_seq_len, cfg)
        sigmas = _time_shift_exponential(mu, sigmas)
    else:
        s = cfg.shift
        sigmas = s * sigmas / (1.0 + (s - 1.0) * sigmas)
    # Qwen-Image sets shift_terminal=0.02: affinely stretch so the final
    # sigma equals it (FlowMatchEulerDiscreteScheduler.stretch_shift_to_
    # terminal). Skipped at num_steps=1 where sigmas=[1.0] (the stretch is
    # 0/0 there; the reference documents 1-step as unstable anyway,
    # README.md:104).
    if cfg.shift_terminal and num_steps > 1:
        one_minus = 1.0 - sigmas
        scale = one_minus[-1] / (1.0 - cfg.shift_terminal)
        sigmas = 1.0 - one_minus / scale
    sigmas = jnp.concatenate([sigmas, jnp.zeros((1,), jnp.float32)])
    timesteps = sigmas[:-1] * cfg.num_train_timesteps
    return Schedule(sigmas=sigmas, timesteps=timesteps)


def euler_step(
    latents: jnp.ndarray,
    velocity: jnp.ndarray,
    sigma: jnp.ndarray,
    sigma_next: jnp.ndarray,
) -> jnp.ndarray:
    """One flow-matching Euler update: x ← x + (σ_next − σ)·v.

    Computed in float32 regardless of latent dtype (2-step stability is
    sensitive to accumulation precision — the reference documents a 1-step
    NaN floor, README.md:104), then cast back.
    """
    x32 = latents.astype(jnp.float32)
    v32 = velocity.astype(jnp.float32)
    out = x32 + (sigma_next - sigma) * v32
    return out.astype(latents.dtype)


def scale_noise(
    sample: jnp.ndarray, noise: jnp.ndarray, sigma: jnp.ndarray
) -> jnp.ndarray:
    """Forward process x_σ = (1−σ)·x₀ + σ·ε — used to re-noise a cached
    temporal latent to an intermediate sigma for the stream pipeline's
    partial-denoise path (reference's intended prepare_latent semantics,
    qwen_realtime.py:201-224)."""
    s = jnp.asarray(sigma, jnp.float32)
    return ((1.0 - s) * sample.astype(jnp.float32)
            + s * noise.astype(jnp.float32)).astype(sample.dtype)
