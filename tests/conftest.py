"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests run anywhere (the reference can't test its NCCL path on CPU; we can —
SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# env vars alone are not honored under the axon TPU plugin; force via config
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/focoos_tpu_test_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def sample_image(rng):
    return rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
