"""Windowed Pallas submanifold conv (ops/pallas_conv.py) vs the XLA paths.

Runs the kernel in interpreter mode on CPU; exact-equivalence is against
ops.sparse_conv.subm_conv_apply, which is itself golden-tested against a
brute-force stencil (tests/test_structural_ops.py).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from robot3dlotus_tpu.ops.sparse_conv import subm_conv_apply
from robot3dlotus_tpu.ops.pallas_conv import (
    build_window_map, subm_conv_windowed,
)


def _random_cloud(rng, B, N, depth, span=None):
    """span: restrict coords to [0, span)^3 — small spans make dense
    neighborhoods (more far links for a given window)."""
    hi = span if span is not None else 2 ** depth
    gcs = []
    for _ in range(B):
        seen, pts = set(), []
        while len(pts) < N:
            c = tuple(rng.randint(0, hi, 3))
            if c not in seen:
                seen.add(c)
                pts.append(c)
        gcs.append(pts)
    return np.array(gcs, np.int32)


def _setup(rng, B=2, N=64, depth=4, Cin=8, Cout=8, counts=None, span=None):
    gc = _random_cloud(rng, B, N, depth, span=span)
    m = np.asarray(counts if counts is not None else [N, N - 11][:B])
    mask = np.arange(N)[None] < m[:, None]
    feat = rng.randn(B, N, Cin).astype(np.float32) * (
        mask[..., None].astype(np.float32))
    w = rng.randn(27, Cin, Cout).astype(np.float32) * 0.2
    bias = rng.randn(Cout).astype(np.float32)
    return (jnp.asarray(gc), jnp.asarray(mask), jnp.asarray(feat),
            jnp.asarray(w), jnp.asarray(bias))


def test_windowed_full_window_matches_dense():
    """halo >= N: one window covers the cloud, no far links, exact match."""
    rng = np.random.RandomState(3)
    gc, mask, feat, w, bias = _setup(rng)
    nm_out = subm_conv_apply(
        feat,
        build_window_map(gc, mask, 3, 4, halo=64).nmap, w, bias)
    wmap = build_window_map(gc, mask, 3, 4, halo=64)
    assert wmap.window == feat.shape[1]
    out = subm_conv_windowed(feat, wmap, w, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(nm_out),
                               rtol=1e-5, atol=1e-5)


def test_windowed_small_halo_uses_far_path_and_matches():
    """Tiny halo forces out-of-window links through the compacted far pass."""
    rng = np.random.RandomState(5)
    gc, mask, feat, w, bias = _setup(rng, depth=5, span=4)
    wmap = build_window_map(gc, mask, 3, 5, halo=4, tile=16,
                            far_capacity=2048)
    assert wmap.window < feat.shape[1]
    assert int(jnp.sum(wmap.far_ok)) > 0, "test needs far links to exercise"
    assert int(jnp.max(wmap.far_dropped)) == 0
    ref = subm_conv_apply(feat, wmap.nmap, w, bias)
    out = subm_conv_windowed(feat, wmap, w, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_windowed_far_overflow_is_counted():
    rng = np.random.RandomState(7)
    gc, mask, feat, w, bias = _setup(rng, depth=5, span=4)
    wmap = build_window_map(gc, mask, 3, 5, halo=0, tile=8, far_capacity=4)
    assert int(jnp.max(wmap.far_dropped)) > 0


def test_far_lists_grouped_by_tap():
    """far_capacity is PER TAP: lists come out (B, K, Fk), each tap's
    entries carry that tap's links with destinations ascending, and the
    drop counter equals total far links minus kept ones."""
    rng = np.random.RandomState(9)
    gc, mask, feat, w, bias = _setup(rng, depth=5, span=4)
    wmap = build_window_map(gc, mask, 3, 5, halo=4, tile=16, far_capacity=8)
    B, N = feat.shape[:2]
    assert wmap.far_src.shape == (B, 27, 8)
    assert wmap.far_dst.shape == (B, 27, 8)
    dst = np.asarray(wmap.far_dst)
    ok = np.asarray(wmap.far_ok)
    for b in range(B):
        for k in range(27):
            d = dst[b, k][ok[b, k]]
            assert np.all(np.diff(d) > 0), "per-tap dsts must ascend"
    # conservation: every valid link is near (rel != -1), kept-far, or
    # counted dropped — nothing vanishes silently
    total_valid = np.asarray(wmap.nmap.ok).reshape(B, -1).sum(-1)
    near_kept = (np.asarray(wmap.rel) != -1).reshape(B, -1).sum(-1)
    far_kept = ok.reshape(B, -1).sum(-1)
    np.testing.assert_array_equal(
        np.asarray(wmap.far_dropped),
        total_valid - near_kept - far_kept)


def test_heavy_tail_cloud_exact_with_small_halo():
    """Two spatially separate clusters force long SFC jumps (the tabletop
    regime that motivated the k-grouped far path): a tight window plus
    per-tap far lists must still reproduce the XLA conv exactly."""
    rng = np.random.RandomState(13)
    B, N, depth = 2, 128, 6
    gcs = []
    for _ in range(B):
        a = _random_cloud(rng, 1, N // 2, depth, span=5)[0]
        bcl = _random_cloud(rng, 1, N // 2, depth, span=5)[0] + 48
        gcs.append(np.concatenate([a, bcl]))
    gc = jnp.asarray(np.stack(gcs).astype(np.int32))
    mask = jnp.ones((B, N), bool)
    feat = jnp.asarray(rng.randn(B, N, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32) * 0.2)
    wmap = build_window_map(gc, mask, 3, depth, halo=8, tile=16)
    assert wmap.window < N
    assert int(jnp.max(wmap.far_dropped)) == 0
    ref = subm_conv_apply(feat, wmap.nmap, w, None)
    out = subm_conv_windowed(feat, wmap, w, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_windowed_gradients_match_xla_autodiff():
    rng = np.random.RandomState(11)
    gc, mask, feat, w, bias = _setup(rng, depth=5, span=4)
    wmap = build_window_map(gc, mask, 3, 5, halo=8, tile=16,
                            far_capacity=2048)
    cot = jnp.asarray(rng.randn(*feat.shape[:2], w.shape[-1])
                      .astype(np.float32))

    def f_win(feat_, w_, b_):
        return jnp.sum(subm_conv_windowed(feat_, wmap, w_, b_,
                                          interpret=True) * cot)

    def f_ref(feat_, w_, b_):
        return jnp.sum(subm_conv_apply(feat_, wmap.nmap, w_, b_) * cot)

    gw = jax.grad(f_win, argnums=(0, 1, 2))(feat, w, bias)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(feat, w, bias)
    for a, b, name in zip(gw, gr, ("dfeat", "dweight", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"gradient mismatch: {name}")


@pytest.mark.slow
def test_model_level_windowed_conv_matches_xla():
    """Full backbone forward with conv_impl='pallas_interpret' must match
    conv_impl='xla' (the windowed kernel only swaps the CPE conv engine)."""
    import jax
    from robot3dlotus_tpu.models.simple_policy import SimplePolicyTPU
    from tests.test_policy import PTV3_CFG, ACT_CFG, fake_batch

    batch = fake_batch(B=2, N=128, T=4)
    key = jax.random.PRNGKey(0)
    cfg_x = dict(PTV3_CFG, shuffle_orders=False, conv_impl="xla")
    cfg_p = dict(cfg_x, conv_impl="pallas_interpret", conv_halo=16)
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
