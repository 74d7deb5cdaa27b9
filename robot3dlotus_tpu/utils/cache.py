"""Persistent-compilation-cache policy.

XLA:CPU AOT executables do not reliably survive a serialize/deserialize
round trip in this jaxlib: reloads fail the target-feature check (the
compile side records pseudo-features like +prefer-no-scatter that the host
check rejects) and segfault inside compilation_cache
get_executable_and_time — observed as full test-suite crashes, both with
entries from an older host generation AND with entries written minutes
earlier on the same machine. TPU entries have no such problem.

Policy: the persistent cache is enabled ONLY for non-CPU backends. CPU
runs (tests, dryrun children) compile in-memory each process.
"""
from __future__ import annotations

import os


def jax_cache_dir(base: str | None = None, cpu: bool | None = None):
    """Cache dir for this process, or None when the persistent cache must
    stay off (CPU backend — see module docstring). `cpu` defaults to
    whether JAX_PLATFORMS requests the CPU backend (the decision must be
    made BEFORE jax initializes, so it reads the env rather than
    jax.default_backend)."""
    if cpu is None:
        cpu = os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
    if cpu:
        return None
    if base is None:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        base = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                              os.path.join(repo, ".jax_cache"))
    return base


def enable_persistent_cache(jax, base: str | None = None,
                            cpu: bool | None = None,
                            min_compile_secs: float = 5.0):
    if cpu is None:
        # The env heuristic misses a process that switched platform via
        # jax.config (pytest does: JAX_PLATFORMS stays 'axon' while the
        # backend is CPU) — ask the live backend, which this call may
        # safely initialize since the config updates below remain legal
        # after backend init.
        try:
            cpu = jax.default_backend() == "cpu"
        except Exception:
            pass
    d = jax_cache_dir(base, cpu)
    if d is None:
        return None
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass
    return d
