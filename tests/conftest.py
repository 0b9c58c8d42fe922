"""Test configuration: force an 8-virtual-device CPU JAX platform with x64.

Must set env vars before jax initializes (hence module top-level, and pytest
loads conftest before test modules import jax).  Mirrors the driver's
multi-chip dry-run environment (xla_force_host_platform_device_count).
"""

import os

# Force-override: the session environment may preset JAX_PLATFORMS to the real
# TPU (e.g. "axon"); tests must run on the virtual 8-device CPU mesh.
if not os.environ.get("HAMILTON_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "true"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
if not os.environ.get("HAMILTON_TEST_TPU"):
    # The axon sitecustomize force-sets jax_platforms="axon,cpu" in-process;
    # override back to cpu so tests run on the virtual 8-device CPU mesh.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs[:8]


@pytest.fixture
def rng():
    return np.random.default_rng(0)
