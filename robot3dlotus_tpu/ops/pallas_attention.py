"""Pallas TPU kernel for serialized patch attention.

The hot op of PTv3: attention restricted to contiguous serialized patches
of P=128 points (reference flash_attn_varlen_qkvpacked, model.py:543-549).
After the duplicate-pad mapping (ops/patching.py) every patch is a dense
(P, Dh) tile — P equals the TPU lane width, so one grid step = one patch
head, entirely in VMEM:

    grid (B*NP, H):
      q,k,v blocks (P, Dh)  ->  logits (P, P) f32 on the MXU
      -> masked softmax (VPU, f32)  ->  out (P, Dh) on the MXU

No online-softmax tiling is needed (the whole patch fits VMEM), which is
exactly why serialized patch attention maps so well to the TPU: the
"flash" part of the CUDA kernel exists to stream KV from HBM, and here KV
IS the 128-point patch.

Autodiff: forward runs the kernel; backward recomputes attention with
plain XLA einsums (custom_vjp) — O(P^2) recompute per patch, the standard
flash trade. Dropout on attention probabilities is not implemented in the
kernel, so callers route through the XLA path when attn dropout is active
(training); the kernel serves the latency-critical inference path.

Numerics: compiled on a real TPU the kernel matches the XLA einsum path to
~1.4e-4 max abs (MXU f32 accumulation differs from the 'highest'-precision
einsum); interpret mode matches to 2e-5 (tests/test_pallas_attention.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale):
    q = q_ref[0, 0].astype(jnp.float32)        # (P, Dh)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    logits = jax.lax.dot_general(              # (P, P) on the MXU
        q * scale, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    mask = m_ref[0] > 0                        # (1, P) keys validity
    logits = jnp.where(mask, logits, NEG_INF)
    a = jax.nn.softmax(logits, axis=-1)
    o_ref[0, 0] = jax.lax.dot_general(         # (P, Dh)
        a.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _forward(q, k, v, key_valid, scale, interpret=False):
    """q/k/v: (G, H, P, Dh); key_valid: (G, P) bool. Returns (G, H, P, Dh)."""
    G, H, P, Dh = q.shape
    m = key_valid.astype(jnp.int32).reshape(G, 1, P)
    qkv_spec = pl.BlockSpec((1, 1, P, Dh), lambda g, h: (g, h, 0, 0),
                            memory_space=pltpu.ANY if interpret
                            else pltpu.VMEM)
    m_spec = pl.BlockSpec((1, 1, P), lambda g, h: (g, 0, 0),
                          memory_space=pltpu.ANY if interpret
                          else pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(G, H),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, m_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, m)


def _xla_reference(q, k, v, key_valid, scale):
    logits = jnp.einsum("ghpd,ghqd->ghpq", (q * scale).astype(jnp.float32),
                        k.astype(jnp.float32))
    logits = jnp.where(key_valid[:, None, None, :], logits, NEG_INF)
    a = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("ghpq,ghqd->ghpd", a.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def patch_attention(q, k, v, key_valid, scale, interpret=False):
    """Masked per-patch attention. q/k/v: (G, H, P, Dh) where G = B * NP;
    key_valid: (G, P). Pallas forward, XLA-recompute backward."""
    return _forward(q, k, v, key_valid, scale, interpret=interpret)


def _fwd(q, k, v, key_valid, scale, interpret):
    out = _forward(q, k, v, key_valid, scale, interpret=interpret)
    return out, (q, k, v, key_valid)


def _bwd(scale, interpret, res, g):
    q, k, v, key_valid = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_reference(q_, k_, v_, key_valid, scale),
        q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


patch_attention.defvjp(_fwd, _bwd)


def pallas_available():
    """Kernel path requires an actual TPU backend (the CPU interpreter is
    for tests only)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
