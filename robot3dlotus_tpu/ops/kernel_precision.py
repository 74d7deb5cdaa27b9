"""Explicit matmul precision for dot_generals INSIDE Pallas kernels.

The global jax_default_matmul_precision otherwise leaks into Mosaic
lowering: tests pin it to 'highest' for fp32 golden comparisons, and
Mosaic rejects an fp32 contract precision on bf16 operands ('Bad lhs
type' — the r04 TPU kernel sweep failure). fp32 operands return None
(inherit the global setting — unchanged numerics); narrower operands
force DEFAULT, the native single-pass MXU mode and the only one Mosaic
accepts for them. One-hot gather matmuls are exact at any precision
(0/1 factors, one nonzero addend per output).
"""
import jax
import jax.numpy as jnp


def kernel_dot_precision(*operands):
    if all(o.dtype == jnp.float32 for o in operands):
        return None
    return jax.lax.Precision.DEFAULT
