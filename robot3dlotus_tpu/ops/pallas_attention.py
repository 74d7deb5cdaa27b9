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
flash trade. For training with attention dropout (release config
attn_drop=0.1), patch_attention_dropout keeps the dropout INSIDE the
kernel: both forward and a full Pallas backward regenerate the
probabilities and the keep-mask from the per-(patch, head) PRNG seed, so
no (G, H, P, P) tensor ever reaches HBM (verified exactly on-chip against
an XLA reference using the dumped mask; see tests/test_pallas_attention.py).

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


from robot3dlotus_tpu.ops.kernel_precision import kernel_dot_precision


def _attn_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale):
    v = v_ref[0, 0]
    a = _probs(q_ref, k_ref, m_ref, scale)     # (P, P) on the MXU
    o_ref[0, 0] = jax.lax.dot_general(         # (P, Dh)
        a.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=kernel_dot_precision(v),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _forward(q, k, v, key_valid, scale, interpret=False):
    """q/k/v: (G, H, P, Dh); key_valid: (G, P) bool. Returns (G, H, P, Dh)."""
    G, H, P, Dh = q.shape
    m = key_valid.astype(jnp.int32).reshape(G, 1, P)
    qkv_spec = pl.BlockSpec((1, 1, P, Dh), lambda g, h: (g, h, 0, 0),
                            memory_space=pl.ANY if interpret
                            else pltpu.VMEM)
    m_spec = pl.BlockSpec((1, 1, P), lambda g, h: (g, 0, 0),
                          memory_space=pl.ANY if interpret
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
    """Whether 'auto' impl selection should pick the Pallas kernels.

    Requires an actual TPU backend (the CPU interpreter is for tests only)
    AND a single-device process: the training step is partitioned by GSPMD
    jit (train/trainer.py make_train_step), which cannot shard a pallas_call
    — on a multi-chip mesh it would replicate the kernel's operands across
    devices instead of splitting the batch. The XLA paths partition cleanly,
    so 'auto' falls back to them under a mesh; configs that run the kernels
    inside a per-device shard_map (or accept replication) can still force
    attn_impl/conv_impl='pallas'.

    ROBOT3DLOTUS_FORCE_XLA=1 disables the whole kernel family in one place
    (every 'auto' site: patch attention, windowed conv, row permutes, the
    small-C stem gather) — the A/B switch for healthy-hardware runs where
    XLA gathers may beat the one-hot MXU formulation (BENCH_IMPL=xla in
    bench.py sets it)."""
    import os
    if os.environ.get("ROBOT3DLOTUS_FORCE_XLA", "") == "1":
        return False
    try:
        return jax.default_backend() == "tpu" and jax.device_count() == 1
    except Exception:
        return False


# --------------------------------------------------------------------------
# training path: attention dropout inside the kernel
# --------------------------------------------------------------------------
#
# The XLA training path materializes the (G, H, P, P) probability tensor in
# HBM twice (forward activation + dropout mask) because autodiff saves it
# for the backward matmuls. Keeping dropout inside the kernel and
# REGENERATING both the probabilities and the mask from the per-program
# PRNG seed in a Pallas backward kernel (the standard flash-attention
# trade: O(P^2) recompute per patch, zero O(P^2) HBM residuals) removes
# that traffic entirely — only q/k/v and the (P, Dh) outputs ever touch
# HBM. No online-softmax tiling is needed at P=128: the whole patch lives
# in VMEM.

def _dropout_mask(shape, rate):
    """Keep-mask from the already-seeded per-program PRNG."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = jnp.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    return bits >= thresh


def _probs(q_ref, k_ref, m_ref, scale):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q * scale, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    mask = m_ref[0] > 0
    logits = jnp.where(mask, logits, NEG_INF)
    return jax.nn.softmax(logits, axis=-1)


def _attn_drop_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, m_ref, o_ref, *,
                          scale, rate):
    # Mosaic caps prng_seed at 2 words: fold (patch, head) into one
    pltpu.prng_seed(seed_ref[0, 0],
                    pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))
    a = _probs(q_ref, k_ref, m_ref, scale)
    keep = _dropout_mask(a.shape, rate)
    a = jnp.where(keep, a / (1.0 - rate), 0.0)
    v = v_ref[0, 0]
    o_ref[0, 0] = jax.lax.dot_general(
        a.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=kernel_dot_precision(v),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attn_drop_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, m_ref, g_ref,
                          dq_ref, dk_ref, dv_ref, *, scale, rate):
    # Mosaic caps prng_seed at 2 words: fold (patch, head) into one
    pltpu.prng_seed(seed_ref[0, 0],
                    pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))
    a = _probs(q_ref, k_ref, m_ref, scale)           # (P, P) f32, pre-drop
    keep = _dropout_mask(a.shape, rate)              # same bits as forward
    inv_keep = 1.0 / (1.0 - rate)
    ad = jnp.where(keep, a * inv_keep, 0.0)

    g = g_ref[0, 0].astype(jnp.float32)              # (P, Dh)
    v = v_ref[0, 0].astype(jnp.float32)
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)

    dv = jax.lax.dot_general(                        # ad^T @ g
        ad, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dad = jax.lax.dot_general(                       # g @ v^T
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    da = jnp.where(keep, dad * inv_keep, 0.0)
    # softmax vjp: ds = a * (da - sum(da * a, axis=-1))
    ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(                        # ds @ k
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(                        # ds^T @ q
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _drop_specs(P, Dh, interpret):
    space = pl.ANY if interpret else pltpu.VMEM
    qkv_spec = pl.BlockSpec((1, 1, P, Dh), lambda g, h: (g, h, 0, 0),
                            memory_space=space)
    m_spec = pl.BlockSpec((1, 1, P), lambda g, h: (g, 0, 0),
                          memory_space=space)
    seed_spec = pl.BlockSpec((1, 1), lambda g, h: (0, 0),
                             memory_space=pltpu.SMEM)
    return qkv_spec, m_spec, seed_spec


def _drop_forward(q, k, v, key_valid, seed, scale, rate, interpret=False):
    G, H, P, Dh = q.shape
    m = key_valid.astype(jnp.int32).reshape(G, 1, P)
    qkv_spec, m_spec, seed_spec = _drop_specs(P, Dh, interpret)
    return pl.pallas_call(
        functools.partial(_attn_drop_fwd_kernel, scale=scale, rate=rate),
        grid=(G, H),
        in_specs=[seed_spec, qkv_spec, qkv_spec, qkv_spec, m_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(seed.reshape(1, 1).astype(jnp.int32), q, k, v, m)


def _drop_backward(q, k, v, key_valid, seed, g, scale, rate,
                   interpret=False):
    G, H, P, Dh = q.shape
    m = key_valid.astype(jnp.int32).reshape(G, 1, P)
    qkv_spec, m_spec, seed_spec = _drop_specs(P, Dh, interpret)
    return pl.pallas_call(
        functools.partial(_attn_drop_bwd_kernel, scale=scale, rate=rate),
        grid=(G, H),
        in_specs=[seed_spec, qkv_spec, qkv_spec, qkv_spec, m_spec, qkv_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        interpret=interpret,
    )(seed.reshape(1, 1).astype(jnp.int32), q, k, v, m, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def patch_attention_dropout(q, k, v, key_valid, seed, scale, rate,
                            interpret=False):
    """Masked per-patch attention with in-kernel attention dropout.

    q/k/v: (G, H, P, Dh); key_valid: (G, P); seed: int32 scalar array (the
    per-step dropout rng folded to one word — each (patch, head) program
    reseeds with (seed, g, h) so masks are independent). Both forward and
    backward regenerate probabilities and the keep-mask in Pallas; nothing
    O(P^2) is ever written to HBM.
    """
    if interpret and rate > 0:
        # the CPU Pallas interpreter stubs prng_random_bits to zeros, which
        # makes the keep-mask all-False — every output (and gradient) would
        # be silently zero. Fail loudly instead (models/layers.py routes
        # interpret-mode dropout to the XLA path for this reason).
        raise ValueError(
            "patch_attention_dropout(rate>0) cannot run in interpret mode: "
            "interpreter prng returns zeros (all-dropped mask); use the "
            "XLA attention path off-TPU")
    return _drop_forward(q, k, v, key_valid, seed, scale, rate,
                         interpret=interpret)


def _drop_fwd(q, k, v, key_valid, seed, scale, rate, interpret):
    out = _drop_forward(q, k, v, key_valid, seed, scale, rate,
                        interpret=interpret)
    return out, (q, k, v, key_valid, seed)


def _drop_bwd(scale, rate, interpret, res, g):
    q, k, v, key_valid, seed = res
    dq, dk, dv = _drop_backward(q, k, v, key_valid, seed, g, scale, rate,
                                interpret=interpret)
    return dq, dk, dv, None, None


patch_attention_dropout.defvjp(_drop_fwd, _drop_bwd)
