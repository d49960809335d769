"""Test harness: run JAX on CPU with 8 virtual devices.

Multi-chip sharding tests run on a spoofed 8-device CPU mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``), per SURVEY.md §4's
implication for the build. Must be set before jax initializes a backend.
"""
import os

# FORCE cpu, do not setdefault: the ambient environment here exports
# JAX_PLATFORMS=axon (TPU tunnel) and a sitecustomize that calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start, so both
# the env var AND the config must be overridden before backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8, (
    "test harness failed to force the 8-virtual-device CPU platform"
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-model parity tests (minutes of CPU compile)")


@pytest.fixture(autouse=True)
def _full_precision():
    """Parity tests compare against torch fp32; XLA's default matmul/conv
    precision on some backends uses bf16 passes, so pin the highest."""
    with jax.default_matmul_precision("highest"):
        yield


@pytest.fixture
def rng():
    return np.random.RandomState(0)
