"""Test harness: force JAX onto CPU with 8 virtual devices so multi-chip
sharding paths compile and execute hermetically (the TPU analog of the
reference's 'replay recorded trajectories instead of a robot' strategy,
SURVEY.md §4).

NOTE: the sandbox registers the real-TPU PJRT plugin from sitecustomize before
any user code runs, so JAX_PLATFORMS in os.environ is too late — the platform
must be forced through jax.config."""

import os

# XLA 0.9's cpu_aot_loader logs feature-mismatch ERRORs on every
# cross-process reload of a cached CPU executable EVEN ON THE SAME MACHINE:
# the compile-time feature string carries XLA's +prefer-no-gather /
# +prefer-no-scatter tuning pseudo-features, which never appear in the host
# CPUID list the loader compares against.  Verified false positive (round 5):
# the load succeeds and warm runs are ~3x faster.  Genuinely-wrong-machine
# loads are prevented structurally by the machine-keyed cache dir below
# (utils/cachekey.py), so suppress the spam; FATAL still prints.  Unset or
# lower it when debugging native-side issues.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite is COMPILE-bound on the 1-core host
# (fused mapping programs dominate); caching compiled CPU executables across
# tests and runs cuts the wall time severalfold.  CPU only — through the TPU
# tunnel the disk-cache load path is SLOWER than recompiling (92 s vs 22 s
# measured, see CLAUDE.md).
#
# The cache dir is KEYED BY HOST CPU FEATURES + jax version: XLA:CPU AOT
# artifacts bake in the compile machine's feature set, and loading them on a
# different host spews cpu_aot_loader mismatch errors ("could lead to
# SIGILL") and can corrupt timing/results — observed when the sandbox
# migrated between rounds.
from holoagent_tpu.utils.cachekey import machine_cache_dir  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", machine_cache_dir("jax_cache_cpu")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
