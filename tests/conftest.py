"""Test configuration: hermetic CPU backend with 8 virtual devices so the
multi-chip (cfg × model) sharding paths run everywhere (SURVEY.md §4:
"multi-chip tests runnable on CPU via xla_force_host_platform_device_count").

Must set env vars before the first jax import anywhere in the test process.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_preset():
    from qwen_image_edit_streamdiffusion_tpu.core.config import get_preset

    return get_preset("tiny")
