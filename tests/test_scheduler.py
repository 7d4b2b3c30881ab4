"""Scheduler unit tests: shape/monotonicity/shift math and the flow-matching
Euler identity (one step from sigma=1 with perfect velocity recovers x0)."""

import jax.numpy as jnp
import numpy as np
import pytest

from qwen_image_edit_streamdiffusion_tpu.core.config import SchedulerConfig
from qwen_image_edit_streamdiffusion_tpu.models import scheduler as sched


def test_schedule_shapes_and_bounds():
    for steps in (1, 2, 4, 8, 28):
        s = sched.make_schedule(steps, image_seq_len=4096)
        assert s.sigmas.shape == (steps + 1,)
        assert s.timesteps.shape == (steps,)
        sig = np.asarray(s.sigmas)
        assert sig[0] == pytest.approx(1.0)
        assert sig[-1] == 0.0
        assert np.all(np.diff(sig) < 0), "sigmas must be strictly decreasing"
        assert np.all(sig >= 0) and np.all(sig <= 1)


def test_dynamic_shift_increases_midpoint_sigma():
    # Exponential shifting with mu>0 pushes sigmas up (more time at high
    # noise), and larger resolutions shift more.
    cfg = SchedulerConfig()
    lo = np.asarray(sched.make_schedule(8, 1024, cfg).sigmas)
    hi = np.asarray(sched.make_schedule(8, 8192, cfg).sigmas)
    unshifted = np.linspace(1.0, 1.0 / cfg.num_train_timesteps, 8)
    assert np.all(lo[1:-1] >= unshifted[1:] - 1e-6)
    # (both tails are pinned to shift_terminal — compare with float tolerance)
    assert np.all(hi[1:-1] >= lo[1:-1] - 1e-6)


def test_upstream_timestep_parity():
    # Golden values for the stock diffusers usage the reference relies on:
    # pipeline passes sigmas=linspace(1, 1/num_steps); scheduler applies the
    # exponential shift (mu from dynamic shifting) then stretches the tail to
    # shift_terminal=0.02 (Qwen-Image scheduler_config.json).
    s4 = np.asarray(sched.make_schedule(4, image_seq_len=4096).timesteps)
    np.testing.assert_allclose(s4, [1000.0, 766.8, 455.7, 20.0], atol=0.5)
    s2 = np.asarray(sched.make_schedule(2, image_seq_len=4096).timesteps)
    np.testing.assert_allclose(s2, [1000.0, 20.0], atol=0.5)
    # Terminal sigma before the appended zero is exactly shift_terminal.
    for steps in (2, 4, 8, 28):
        sig = np.asarray(sched.make_schedule(steps, 4096).sigmas)
        assert sig[-2] == pytest.approx(0.02, abs=1e-5)


def test_mu_linear_interpolation_endpoints():
    cfg = SchedulerConfig()
    assert sched.compute_mu(cfg.base_image_seq_len, cfg) == pytest.approx(cfg.base_shift)
    assert sched.compute_mu(cfg.max_image_seq_len, cfg) == pytest.approx(cfg.max_shift)


def test_euler_full_denoise_identity():
    # x_1 = eps; v = eps - x0; one Euler step with (sigma 1 -> 0) gives x0.
    rng = np.random.default_rng(42)
    x0 = jnp.asarray(rng.normal(size=(2, 8, 4)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(2, 8, 4)), jnp.float32)
    v = eps - x0
    out = sched.euler_step(eps, v, jnp.float32(1.0), jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-6)


def test_euler_two_steps_compose():
    # Exact velocity field => any step split reaches the same endpoint.
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)
    v = eps - x0
    s = sched.make_schedule(2, 1024)
    x = sched.scale_noise(x0, eps, s.sigmas[0])
    for i in range(2):
        x = sched.euler_step(x, v, s.sigmas[i], s.sigmas[i + 1])
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-5)


def test_scale_noise_endpoints():
    x0 = jnp.ones((3, 3))
    eps = jnp.zeros((3, 3))
    np.testing.assert_allclose(sched.scale_noise(x0, eps, 0.0), np.ones((3, 3)))
    np.testing.assert_allclose(sched.scale_noise(x0, eps, 1.0), np.zeros((3, 3)))


def test_euler_preserves_dtype():
    x = jnp.ones((2, 2), jnp.bfloat16)
    v = jnp.ones((2, 2), jnp.bfloat16)
    out = sched.euler_step(x, v, jnp.float32(0.5), jnp.float32(0.25))
    assert out.dtype == jnp.bfloat16
