"""Test config: force an 8-virtual-device CPU platform so sharding tests run
without TPU hardware, and keep XLA compilation deterministic.

The environment's sitecustomize force-registers the 'axon' TPU backend and
rewrites jax_platforms, so env vars alone are not enough — the jax config
must be overridden before any computation runs."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
