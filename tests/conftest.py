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

# NO persistent compilation cache on the CPU backend: XLA:CPU AOT entries
# segfault on deserialize in this jaxlib (see utils/cache.py) — tests and
# their spawned children compile in-memory each process.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
jax.config.update("jax_enable_compilation_cache", False)
jax.config.update("jax_platforms", "cpu")
# 8 virtual devices in THIS process only (jax.config, not XLA_FLAGS env):
# mesh/sharding tests exercise multi-chip logic, while spawned subprocesses
# (eval-server producers/consumers) inherit a plain 1-device CPU client —
# this machine has a single core, and an 8-way-oversubscribed client makes
# XLA compiles pathologically slow.
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

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


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_jit_executables_between_modules():
    """XLA:CPU JIT executables (code pages + baked constants) accumulate in
    jax's never-evicting jit caches; a full suite in one process crosses the
    kernel's vm.max_map_count (65530) and LLVM segfaults mid-compile when
    mmap starts failing (observed at 65k maps). Dropping the caches between
    test modules unmaps finished modules' executables and keeps the map
    count bounded; compiled fns don't usefully persist across modules."""
    yield
    jax.clear_caches()


def _n_memory_maps():
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


@pytest.fixture(autouse=True)
def _bound_jit_mappings_within_module():
    """Backstop for single modules that alone approach the map limit
    (test_policy peaks ~36k): clear mid-module once past a safety line."""
    yield
    if _n_memory_maps() > 45000:
        jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute integration tests (subprocess servers, "
        "end-to-end CLI flows); deselect with -m 'not slow' for a "
        "<5-minute warm-cache run")
