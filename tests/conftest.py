"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on the XLA CPU backend with
``xla_force_host_platform_device_count=8`` standing in for a v5e-8
(SURVEY.md §4). Must be set before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# Some environments register a TPU plugin that overrides JAX_PLATFORMS; the
# config update below is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
