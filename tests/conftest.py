"""Test harness: run everything on an 8-device virtual CPU mesh so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4)."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# In the axon environment, sitecustomize registers the TPU backend before
# conftest runs, so the env vars above may not take effect and tests execute
# on the real chip. TPU matmuls default to bf16 inputs; tests verify exact
# semantics, so force full fp32 matmuls here. (Training picks its own policy.)
import jax  # noqa: E402

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
