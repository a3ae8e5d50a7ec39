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

# Persistent XLA compile cache: the suite is compile-dominated (tiny tensors,
# big programs), and the cache works on CPU — repeat runs skip ~90% of the
# wall-clock. Safe to share across workers; keyed by HLO hash.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("LRPIC_TEST_CACHE", "/tmp/lrpic_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
