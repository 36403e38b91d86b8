"""Force an 8-device virtual CPU mesh for all tests (SURVEY.md §2.7).

Note: the environment may pre-import jax via a sitecustomize that targets a
remote TPU backend, so setting JAX_PLATFORMS here can be too late — we also
update the live jax config, which works any time before first backend use.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
