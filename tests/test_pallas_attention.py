"""Pallas patch-attention kernel vs the XLA einsum path (interpret mode on
CPU; the compiled kernel runs on real TPU via attn_impl='auto'/'pallas')."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robot3dlotus_tpu.ops.pallas_attention import (
    patch_attention, _xla_reference)


def _inputs(G=4, H=2, P=128, Dh=32, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(G, H, P, Dh).astype(np.float32) * 0.3
    k = rng.randn(G, H, P, Dh).astype(np.float32) * 0.3
    v = rng.randn(G, H, P, Dh).astype(np.float32)
    valid = np.ones((G, P), bool)
    valid[0, 100:] = False  # a partially dead patch
    valid[1, 1:] = False    # nearly empty patch
    return (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(valid))


def test_kernel_matches_xla_reference():
    q, k, v, valid = _inputs()
    scale = 32 ** -0.5
    ref = _xla_reference(q, k, v, valid, scale)
    out = patch_attention(q, k, v, valid, scale, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_kernel_gradients_flow():
    q, k, v, valid = _inputs(G=2, P=32, Dh=8)
    scale = 8 ** -0.5

    def loss(q, k, v):
        return jnp.sum(patch_attention(q, k, v, valid, scale, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_reference(q, k, v, valid, scale) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


def test_model_level_pallas_interpret_matches_xla():
    """Full backbone forward with attn_impl='pallas_interpret' must match
    the XLA path (the kernel only swaps the attention inner loop)."""
    from robot3dlotus_tpu.models.simple_policy import SimplePolicyTPU
    from tests.test_policy import PTV3_CFG, ACT_CFG, fake_batch

    batch = fake_batch(B=2, N=128, T=4)
    key = jax.random.PRNGKey(0)
    cfg_x = dict(PTV3_CFG, shuffle_orders=False)
    cfg_p = dict(cfg_x, attn_impl="pallas_interpret")
    mx = SimplePolicyTPU(ptv3_cfg=cfg_x, act_cfg=ACT_CFG, variant="ca")
    mp = SimplePolicyTPU(ptv3_cfg=cfg_p, act_cfg=ACT_CFG, variant="ca")
    v = jax.jit(lambda b: mx.init(
        {"params": key, "dropout": key, "shuffle": key},
        b, deterministic=True))(batch)
    px = mx.apply(v, batch, deterministic=True)
    pp = mp.apply(v, batch, deterministic=True)
    for k2 in ("pos", "rot", "open"):
        np.testing.assert_allclose(
            np.asarray(px[k2]), np.asarray(pp[k2]), atol=5e-5, rtol=1e-4)
