"""Test harness: run on a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware. Must set env before jax import.

B3D_TESTS_TPU=1 keeps the REAL device instead (serial use only — one
process may hold the chip): the tests marked ``onchip`` then run COMPILED
(non-interpret) kernels, the lane the CPU suite cannot cover (Mosaic
lowering bugs, bf16 MXU rounding).  Everything else still passes on the
chip, just slower."""

import os

ON_CHIP = os.environ.get("B3D_TESTS_TPU") == "1"

# Force CPU: the ambient environment registers a TPU PJRT plugin via
# sitecustomize and pins jax_platforms through jax.config (which overrides the
# JAX_PLATFORMS env var), so we must update the config itself — otherwise the
# suite silently runs on (and contends for) the real chip.
if not ON_CHIP:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not ON_CHIP:
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    if ON_CHIP:
        return
    skip = _pytest.mark.skip(
        reason="compiled-kernel test: run with B3D_TESTS_TPU=1 on the chip"
    )
    for item in items:
        if "onchip" in item.keywords:
            item.add_marker(skip)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "onchip: compiled (non-interpret) kernel test; needs the real TPU "
        "(B3D_TESTS_TPU=1)",
    )
