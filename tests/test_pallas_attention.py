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


@pytest.mark.slow
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


TPU_ONLY = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="in-kernel dropout needs the hardware PRNG (the CPU "
           "interpreter stubs prng_random_bits to zeros)")


def _drop_setup(P=128, Dh=64):
    rng = np.random.RandomState(0)
    G, H = 2, 2
    q, k, v = (jnp.asarray(rng.randn(G, H, P, Dh).astype(np.float32))
               for _ in range(3))
    kvalid = jnp.asarray(rng.rand(G, P) > 0.2)
    return q, k, v, kvalid, rng


@TPU_ONLY
def test_dropout_kernel_deterministic_and_seed_sensitive():
    from robot3dlotus_tpu.ops.pallas_attention import patch_attention_dropout
    q, k, v, kvalid, _ = _drop_setup()
    f = jax.jit(lambda *a: patch_attention_dropout(*a, 0.125, 0.5, False))
    s7 = jnp.asarray(7, jnp.int32)
    o1, o2 = f(q, k, v, kvalid, s7), f(q, k, v, kvalid, s7)
    o3 = f(q, k, v, kvalid, jnp.asarray(8, jnp.int32))
    assert bool(jnp.all(o1 == o2))
    assert bool(jnp.any(o1 != o3))


@TPU_ONLY
def test_dropout_kernel_exact_vs_masked_reference():
    """Dump the kernel's keep-mask with a twin kernel, then require the
    forward AND all three custom-vjp gradients to match an XLA reference
    that applies that exact mask."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from robot3dlotus_tpu.ops import pallas_attention as pa

    q, k, v, kvalid, rng = _drop_setup()
    G, H, P, Dh = q.shape
    seed = jnp.asarray(7, jnp.int32)
    scale, rate = 0.125, 0.3

    def mask_kernel(seed_ref, o_ref, *, rate):
        pltpu.prng_seed(seed_ref[0, 0],
                        pl.program_id(0) * pl.num_programs(1) +
                        pl.program_id(1))
        keep = pa._dropout_mask((o_ref.shape[-2], o_ref.shape[-1]), rate)
        o_ref[0, 0] = keep.astype(jnp.int32)

    mask = pl.pallas_call(
        functools.partial(mask_kernel, rate=rate),
        grid=(G, H),
        in_specs=[pl.BlockSpec((1, 1), lambda g, h: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1, P, P), lambda g, h: (g, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, H, P, P), jnp.int32),
    )(seed.reshape(1, 1))
    mask = jnp.asarray(np.asarray(mask).astype(bool))
    frac = float(mask.mean())
    assert abs(frac - (1 - rate)) < 0.01, frac

    def ref_fn(q_, k_, v_):
        logits = jnp.einsum("ghpd,ghqd->ghpq",
                            (q_ * scale).astype(jnp.float32),
                            k_.astype(jnp.float32))
        logits = jnp.where(kvalid[:, None, None, :], logits, -1e9)
        a = jax.nn.softmax(logits, -1)
        ad = jnp.where(mask, a / (1 - rate), 0.0)
        return jnp.einsum("ghpq,ghqd->ghpd", ad, v_.astype(jnp.float32))

    fwd_k = jax.jit(lambda *a: pa.patch_attention_dropout(
        *a, scale, rate, False))(q, k, v, kvalid, seed)
    np.testing.assert_allclose(np.asarray(fwd_k), np.asarray(ref_fn(q, k, v)),
                               atol=2e-4)

    g = jnp.asarray(rng.randn(G, H, P, Dh).astype(np.float32))
    _, vjp = jax.vjp(ref_fn, q, k, v)
    refs = vjp(g)
    kers = pa._drop_backward(q, k, v, kvalid, seed, g, scale, rate)
    for name, a, b in zip(("dq", "dk", "dv"), kers, refs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                                   err_msg=name)


def test_dropout_interpret_mode_raises():
    """interpret-mode prng returns zeros (all-dropped mask): the op must
    fail loudly instead of silently zeroing outputs and gradients."""
    import pytest as _pytest
    from robot3dlotus_tpu.ops.pallas_attention import patch_attention_dropout
    q = jnp.zeros((1, 1, 16, 8), jnp.float32)
    kv = jnp.ones((1, 16), bool)
    seed = jnp.zeros((), jnp.int32)
    with _pytest.raises(ValueError, match="interpret"):
        patch_attention_dropout(q, q, q, kv, seed, 1.0, 0.1, interpret=True)
