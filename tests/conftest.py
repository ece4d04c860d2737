"""Test harness: force JAX onto CPU with 8 virtual devices so multi-chip
sharding paths compile and execute hermetically (the TPU analog of the
reference's 'replay recorded trajectories instead of a robot' strategy,
SURVEY.md §4).

NOTE: the sandbox registers the real-TPU PJRT plugin from sitecustomize before
any user code runs, so JAX_PLATFORMS in os.environ is too late — the platform
must be forced through jax.config."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
