"""Test harness: run everything on an 8-device virtual CPU mesh so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4)."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# zero-egress environment: fail fast instead of retrying HF hub downloads
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

# The suite is COMPILE-bound, not run-bound: eager flax dispatch on tiny
# test models compiles ~1k XLA:CPU executables per heavy test (measured
# 99.6 s of a 128 s parity test inside backend_compile_and_load). Dropping
# the backend optimization level trades negligible runtime on toy shapes
# for ~40% less LLVM time per compile; numerics are unchanged (XLA applies
# no fast-math at any level) — golden/parity tolerances all hold.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_backend_optimization_level=0"
                           " --xla_llvm_disable_expensive_passes=true")

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
# GRAFT_TEST_TPU=1 runs the suite against the attached TPU chip instead of
# the virtual CPU mesh — this is how the TPU-marked tier (Mosaic kernel
# shape sweep, dropout-in-kernel, smallc gather) executes on hardware each
# round (VERDICT r03 items 2 and 8). Everything else still passes there,
# but CPU remains the default: tiny-model compiles are much faster and the
# multi-host subprocess tests need the virtual mesh.
if not os.environ.get("GRAFT_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
# 8 virtual devices in THIS process only (jax.config, not XLA_FLAGS env):
# mesh/sharding tests exercise multi-chip logic, while spawned subprocesses
# (eval-server producers/consumers) inherit a plain 1-device CPU client —
# this machine has a single core, and an 8-way-oversubscribed client makes
# XLA compiles pathologically slow.
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

# golden-parity tests compare against the upstream torch checkout here;
# point GRAFT_REFERENCE_ROOT elsewhere (or at a nonexistent dir to prove
# the suite passes with no reference present — parity tests skip)
REFERENCE_ROOT = os.environ.get("GRAFT_REFERENCE_ROOT", "/root/reference")

# Env for subprocess-based multi-device CPU tests (bypasses the axon
# sitecustomize via a scrubbed PYTHONPATH).
CPU_MESH_ENV = dict(
    os.environ,
    PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=8"
              " --xla_backend_optimization_level=0"
              " --xla_llvm_disable_expensive_passes=true",
)


def reference_available():
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


import pytest  # noqa: E402


def abstract_init(model, rngs, *args, **kwargs):
    """Shape-only flax init: eval_shape the init (ZERO op compiles) and
    materialize zeros. For converter-parity tests every leaf that affects
    the compared output is overwritten from the torch state_dict, so
    executing the real random init — hundreds of RNG kernels, the single
    biggest compile cost of the heavy tests — is pure waste. Returns a
    plain (unfrozen) dict."""
    import flax
    import jax.numpy as jnp
    shapes = jax.eval_shape(lambda: model.init(rngs, *args, **kwargs))
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), flax.core.unfreeze(shapes))


def distinct_init(model, rngs, *args, **kwargs):
    """Like abstract_init but fills each leaf with DISTINCT deterministic
    values (host-side iota mod prime) — zeros would let a transposed or
    permuted converter mapping pass a roundtrip bit-equality check."""
    import flax
    shapes = jax.eval_shape(lambda: model.init(rngs, *args, **kwargs))
    import numpy as np_

    def fill(s):
        n = int(np_.prod(s.shape)) if s.shape else 1
        return ((np_.arange(n) % 251 - 125).astype(s.dtype)
                .reshape(s.shape))
    return jax.tree_util.tree_map(fill, flax.core.unfreeze(shapes))


@pytest.fixture(autouse=True, scope="module")
def _release_jit_executables_between_modules():
    """XLA:CPU JIT executables (code pages + baked constants) accumulate in
    jax's never-evicting jit caches; a full suite in one process crosses the
    kernel's vm.max_map_count (65530) and LLVM segfaults mid-compile when
    mmap starts failing (observed at 65k maps). Dropping the caches between
    test modules unmaps finished modules' executables and keeps the map
    count bounded. The drop is CONDITIONAL on the live map count: modules
    share most tiny-op executables (same primitives at similar shapes), so
    an unconditional clear forces each module to recompile the shared set —
    measured as a large fraction of suite time on this 1-core host."""
    yield
    if _n_memory_maps() > 25000:
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
