"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends (SURVEY.md §4:
multi-host collective paths are exercised on a CPU mesh in CI without TPUs).
"""
import os

# Force CPU: the session environment pins jax_platforms to the axon TPU tunnel
# (even overriding JAX_PLATFORMS), which would slow tests massively and change
# matmul precision defaults. Env var + post-import config.update covers both.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
