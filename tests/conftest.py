"""Test config: force an 8-virtual-device CPU platform so sharding tests run
without TPU hardware, and keep XLA compilation deterministic.

The environment's sitecustomize force-registers the 'axon' TPU backend and
rewrites jax_platforms, so env vars alone are not enough — the jax config
must be overridden before any computation runs."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is COMPILE-dominated (tiny tensors, hundreds of distinct
# programs); XLA:CPU's backend optimization pipeline buys nothing at these
# shapes but costs ~2x wall-clock (measured: test_train.py 240 s -> 123 s
# cold). Level 0 only changes LLVM optimization effort, not HLO semantics;
# the numerics-tolerance tests all pass (fusion differences are within the
# tolerances already calibrated for load-dependent reduction order).
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite is compile-dominated (tiny tensors,
# big programs), and the cache works on CPU — repeat runs skip ~90% of the
# wall-clock. Safe to share across workers; keyed by HLO hash. The cache dir
# is additionally keyed by a host-CPU fingerprint: XLA:CPU AOT artifacts
# record the compile machine's features and only WARN on mismatch at load
# ("could lead to execution errors such as SIGILL") — this VM migrates
# between hosts with different feature sets, and executing a stale foreign
# cache produced a one-off numerical flake in an equality test.


def _cpu_fingerprint() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            lines = f.readlines()
        # flags alone are NOT enough: two SKUs with identical cpuinfo flags
        # can differ in LLVM-derived tuning features (+prefer-no-scatter /
        # +prefer-no-gather are per-model preferences), and executing the
        # foreign AOT artifact produced ~0.4% numerical drift that failed
        # exactness tests (observed 2026-08-18). The VM's model name is the
        # GENERIC "Intel(R) Xeon(R) Processor @ 2.10GHz" on every host, so
        # key by family/model/stepping — the cpuid fields LLVM's host CPU
        # detection actually derives those preferences from — plus flags.
        keys = ("cpu family", "model", "stepping", "model name", "flags")
        ident = "".join(next((l for l in lines if l.startswith(k)), "")
                        for k in keys)
        # ... and even THAT is not enough: observed 2026-08-21, two hosts
        # with byte-identical virtualized cpuinfo (family 6 / model 207 /
        # stepping 2 / microcode 0x1) produced AOT artifacts with
        # conflicting LLVM preferences — the hypervisor passes through
        # cpuid leaves /proc/cpuinfo does not summarize, and drift
        # compounded over a 350-step training rehearsal broke its semantic
        # assertions. No userspace-visible field discriminates such hosts,
        # so the cache is additionally keyed PER BOOT: warm within a
        # session (where the suite recompiles identical programs dozens of
        # times — the dominant win), cold across host migrations.
        with open("/proc/sys/kernel/random/boot_id") as f:
            ident += f.read()
        return hashlib.sha1(ident.encode()).hexdigest()[:10]
    except OSError:
        return "nohost"


jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("LRPIC_TEST_CACHE", f"/tmp/lrpic_jax_cache_{_cpu_fingerprint()}"))
# cache EVERYTHING: the suite recreates identical-HLO programs across tests
# (each test builds its own jit closures), and sub-second compiles repeat
# dozens of times — at threshold 0 the second occurrence is a cache hit
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


# -- shared expensive params ---------------------------------------------
# Encoder param INIT is pure eager dispatch (hundreds of tiny random ops):
# measured 7.4 s for resnet50 and 12 s for inception_v3 on this 1-core host,
# re-paid by every test that built its own tree. Session scope pays each
# once. Tests must not mutate these (jax arrays are immutable; rebinding a
# fresh dict per test keeps tree-structure edits local).


@pytest.fixture(scope="session")
def resnet50_params():
    from lrp_imagecaptioning_tpu.models import resnet

    return resnet.init_resnet50_params(jax.random.PRNGKey(0))


@pytest.fixture(scope="session")
def resnet101_params():
    from lrp_imagecaptioning_tpu.models import resnet

    return resnet.init_resnet50_params(jax.random.PRNGKey(0), depth="resnet101")


@pytest.fixture(scope="session")
def inception_v3_params():
    from lrp_imagecaptioning_tpu.models import inception

    return inception.init_inception_v3_params(jax.random.PRNGKey(0))
