"""Persistent-compilation-cache directory selection.

XLA:CPU caches AOT executables compiled for the EXACT host CPU feature set,
but jax's persistent-cache key does not include those features — an entry
written on one machine generation SIGILLs/segfaults when loaded on another
(observed: a full test-suite crash inside compilation_cache
get_executable_and_time after the dev host changed). TPU entries have no
such problem (the key covers the device kind).

Fix: CPU-backend runs use a per-host-fingerprint subdirectory of the cache
root; TPU runs keep the shared root.
"""
from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        import platform
        flags = platform.processor() or platform.machine()
    return hashlib.sha1(flags.encode()).hexdigest()[:10]


def jax_cache_dir(base: str | None = None, cpu: bool | None = None) -> str:
    """Cache dir for this process. `cpu` defaults to whether JAX_PLATFORMS
    requests the CPU backend (the decision must be made BEFORE jax
    initializes, so it reads the env rather than jax.default_backend)."""
    if base is None:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        base = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                              os.path.join(repo, ".jax_cache"))
    if cpu is None:
        cpu = os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
    if cpu:
        tag = "cpu-" + _host_fingerprint()
        if os.path.basename(base.rstrip("/")) == tag:  # already namespaced
            return base
        return os.path.join(base, tag)
    return base


def enable_persistent_cache(jax, base: str | None = None,
                            cpu: bool | None = None,
                            min_compile_secs: float = 5.0) -> str:
    d = jax_cache_dir(base, cpu)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass
    return d
