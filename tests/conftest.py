"""Test configuration: hermetic CPU backend with 8 virtual devices so the
multi-chip (cfg × model) sharding paths run everywhere (SURVEY.md §4:
"multi-chip tests runnable on CPU via xla_force_host_platform_device_count").

Must set env vars before the first jax import anywhere in the test process.
"""

import os
import sys

# Force CPU even when the ambient environment selects the TPU platform —
# tests are hermetic and exercise multi-device sharding on virtual devices.
# Note: this image's sitecustomize pre-registers the "axon" TPU plugin and
# sets jax_platforms="axon,cpu", so the env var alone is not enough; we
# must override the jax config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_preset():
    from qwen_image_edit_streamdiffusion_tpu.core.config import get_preset

    return get_preset("tiny")
