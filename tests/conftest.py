"""Test harness: run on a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware. Must set env before jax import."""

import os

# Force CPU: the ambient environment registers a TPU PJRT plugin via
# sitecustomize and pins jax_platforms through jax.config (which overrides the
# JAX_PLATFORMS env var), so we must update the config itself — otherwise the
# suite silently runs on (and contends for) the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
