"""Test harness: run JAX on CPU with 8 virtual devices.

Multi-chip sharding tests run on a spoofed 8-device CPU mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``), per SURVEY.md §4's
implication for the build. Must be set before jax initializes a backend.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _full_precision():
    """Parity tests compare against torch fp32; XLA's default matmul/conv
    precision on some backends uses bf16 passes, so pin the highest."""
    with jax.default_matmul_precision("highest"):
        yield


@pytest.fixture
def rng():
    return np.random.RandomState(0)
