"""Test harness: run everything on an 8-device virtual CPU mesh so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4)."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# zero-egress environment: fail fast instead of retrying HF hub downloads
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# In the axon environment, sitecustomize registers the TPU plugin before
# conftest runs, so the env vars above alone don't stick — but the backend is
# not *initialized* until first use, so jax.config can still pin the platform.
# Tests verify exact semantics on a virtual 8-device CPU mesh: tiny-model
# compiles are fastest there and multi-chip sharding is exercised without
# hardware. Force fp32 matmuls for golden comparisons, and persist compiled
# executables across runs (the dryrun/bench share the same cache dir).
import jax  # noqa: E402

# CPU executables are host-feature specific but the persistent-cache key is
# not: loading an entry compiled on a previous host generation segfaults
# (utils/cache.py). Tests run the CPU backend, so use the per-host subdir,
# exported as env so spawned children inherit it.
from robot3dlotus_tpu.utils.cache import jax_cache_dir  # noqa: E402

os.environ["JAX_COMPILATION_CACHE_DIR"] = jax_cache_dir(cpu=True)
jax.config.update("jax_platforms", "cpu")
# 8 virtual devices in THIS process only (jax.config, not XLA_FLAGS env):
# mesh/sharding tests exercise multi-chip logic, while spawned subprocesses
# (eval-server producers/consumers) inherit a plain 1-device CPU client —
# this machine has a single core, and an 8-way-oversubscribed client makes
# XLA compiles pathologically slow.
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

REFERENCE_ROOT = "/root/reference"

# Env for subprocess-based multi-device CPU tests (bypasses the axon
# sitecustomize via a scrubbed PYTHONPATH).
CPU_MESH_ENV = dict(
    os.environ,
    PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=8",
)


def reference_available():
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute integration tests (subprocess servers, "
        "end-to-end CLI flows); deselect with -m 'not slow' for a "
        "<5-minute warm-cache run")
