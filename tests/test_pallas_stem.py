"""Windowed stem gather (ops/pallas_stem.py): exactness vs the full-N
smallc path through subm_conv_apply (near + far + missing links), far
overflow telemetry, host-shipped far lists, the label-categorical
(motion-planner) path, and VJP parity. Runs interpreted off-TPU and
compiled on the chip (GRAFT_TEST_TPU=1)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import robot3dlotus_tpu.ops.sparse_conv as sc
from robot3dlotus_tpu.ops.sparse_conv import NeighborMap, subm_conv_apply
from robot3dlotus_tpu.ops import pallas_stem

ON_TPU = jax.default_backend() == "tpu"


@pytest.fixture(autouse=True)
def _interpret_off_tpu(monkeypatch):
    if not ON_TPU:
        monkeypatch.setattr(sc, "_SMALLC_INTERPRET", True)


def _setup(B=2, N=512, C=7, K=125, Cout=32, seed=0, far_frac=0.01):
    rng = np.random.RandomState(seed)
    idx = np.clip(np.arange(N)[None, :, None]
                  + rng.randint(-200, 200, (B, N, K)), 0, N - 1)
    idx[rng.rand(B, N, K) < 0.1] = -1                    # missing links
    fp = rng.rand(B, N, K) < far_frac                    # genuine far links
    idx[fp] = rng.randint(0, N, fp.sum())
    nmap = NeighborMap(idx=jnp.maximum(jnp.asarray(idx), 0).astype(jnp.int32),
                       ok=jnp.asarray(idx) >= 0)
    feat = jnp.asarray(rng.randn(B, N, C), jnp.float32)
    w = jnp.asarray(rng.randn(K, C, Cout) * 0.1, jnp.float32)
    return feat, nmap, w, idx, rng


def test_windowed_matches_smallc():
    feat, nmap, w, _, _ = _setup()
    ref = subm_conv_apply(feat, nmap, w, window_frame=False)
    tele = {}
    out = subm_conv_apply(feat, nmap, w, window_frame=True, telemetry=tele)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    assert int(tele["stem_far_dropped"]) == 0


def test_vjp_matches_smallc():
    feat, nmap, w, _, _ = _setup()

    def loss(window_frame):
        return lambda f: jnp.sum(
            subm_conv_apply(f, nmap, w, window_frame=window_frame) ** 2)

    g_win = jax.grad(loss(True))(feat)
    g_ref = jax.grad(loss(False))(feat)
    scale = float(jnp.max(jnp.abs(g_ref))) or 1.0
    np.testing.assert_allclose(np.asarray(g_win) / scale,
                               np.asarray(g_ref) / scale,
                               atol=1e-5, rtol=1e-4)


def test_far_overflow_is_counted_not_silent():
    # N=1024 so the window (P + 2*halo = 512) does NOT cover the cloud
    feat, nmap, w, _, _ = _setup(N=1024, far_frac=0.2)
    g, far_info = pallas_stem.stem_gather_windowed(
        feat, nmap, far_per_tap=8, interpret=not ON_TPU)
    assert far_info is not None
    assert int(jnp.sum(far_info[3])) > 0


def test_host_far_lists_match_device_compaction():
    from robot3dlotus_tpu.train.datasets.structure import _far_lists_np
    feat, nmap, w, idx, _ = _setup(N=1024)
    N = feat.shape[1]
    tile = pallas_stem._stem_tile(N)
    fk = min(pallas_stem.DEFAULT_STEM_FAR_PER_TAP, N)
    host = _far_lists_np(np.asarray(idx, np.int16),
                         pallas_stem.DEFAULT_STEM_HALO, fk, tile)
    assert host is not None
    far, dropped, halo, p = host
    assert (halo, p) == (pallas_stem.DEFAULT_STEM_HALO, tile)
    g_dev, f_dev = pallas_stem.stem_gather_windowed(
        feat, nmap, interpret=not ON_TPU)
    g_host, f_host = pallas_stem.stem_gather_windowed(
        feat, nmap, host_far=(jnp.asarray(far), jnp.asarray(dropped)),
        interpret=not ON_TPU)
    np.testing.assert_allclose(np.asarray(g_host), np.asarray(g_dev),
                               atol=1e-5, rtol=1e-5)
    # identical far rows/destinations either way, and matching telemetry
    np.testing.assert_allclose(np.asarray(f_host[0]), np.asarray(f_dev[0]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(f_host[1]),
                                  np.asarray(f_dev[1]))
    np.testing.assert_array_equal(np.asarray(f_host[3]), dropped)
    np.testing.assert_array_equal(np.asarray(f_dev[3]), dropped)


def test_categorical_label_channel():
    """Motion-planner shape: 7 features + 1 raw label-index channel -> the
    windowed path must agree with the smallc path including the
    label-embedding reconstruct and its gradient into the table."""
    feat, nmap, w, _, rng = _setup(C=7, Cout=24)
    Kcat, E = 4, 5
    K = nmap.idx.shape[-1]
    cat_idx = jnp.asarray(rng.randint(0, Kcat, feat.shape[:2]), jnp.int32)
    table = jnp.asarray(rng.randn(Kcat, E) * 0.3, jnp.float32)
    w_cat = jnp.asarray(rng.randn(K, 7 + E, 24) * 0.1, jnp.float32)

    def run(window_frame, tbl):
        return subm_conv_apply(feat, nmap, w_cat,
                               categorical=(cat_idx, tbl),
                               window_frame=window_frame)

    ref = run(False, table)
    out = run(True, table)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    gt_w = jax.grad(lambda t: jnp.sum(run(True, t) ** 2))(table)
    gt_r = jax.grad(lambda t: jnp.sum(run(False, t) ** 2))(table)
    scale = float(jnp.max(jnp.abs(gt_r))) or 1.0
    np.testing.assert_allclose(np.asarray(gt_w) / scale,
                               np.asarray(gt_r) / scale,
                               atol=1e-5, rtol=1e-4)


def test_unaligned_n_falls_back():
    feat, nmap, w, _, _ = _setup(N=120)  # not a 128-multiple
    ref = subm_conv_apply(feat, nmap, w, window_frame=False)
    out = subm_conv_apply(feat, nmap, w, window_frame=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.tpu
@pytest.mark.skipif(not ON_TPU, reason="needs the TPU chip")
def test_compiled_on_chip_matches_interpret():
    feat, nmap, w, _, _ = _setup(N=1024)
    g_c, f_c = pallas_stem.stem_gather_windowed(feat, nmap, interpret=False)
    g_i, f_i = pallas_stem.stem_gather_windowed(feat, nmap, interpret=True)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_i),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(f_c[3]), np.asarray(f_i[3]))


def _pool_from_idx(idx, N, pool=None):
    from robot3dlotus_tpu.train.datasets.structure import _far_pool_np
    tile = pallas_stem._stem_tile(N)
    pool = pool or pallas_stem.DEFAULT_STEM_FAR_POOL_FACTOR * N
    return _far_pool_np(np.asarray(idx, np.int32),
                        pallas_stem.DEFAULT_STEM_HALO, int(pool), tile)


def test_pooled_far_matches_smallc():
    """The pooled far list (host layout) through subm_conv_apply must match
    the full-N reference path bit-for-tolerance, including gradients into
    the input features and the stencil weight."""
    feat, nmap, w, idx, _ = _setup(N=1024, far_frac=0.05)
    farp, dropped, halo, tile = _pool_from_idx(idx, 1024)
    assert dropped.sum() == 0, "capacity must cover this fixture"
    host_farp = (jnp.asarray(farp), jnp.asarray(dropped))
    ref = subm_conv_apply(feat, nmap, w, window_frame=False)
    tele = {}
    out = subm_conv_apply(feat, nmap, w, window_frame=True,
                          host_farp=host_farp, telemetry=tele)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    assert int(tele["stem_far_dropped"]) == 0

    def loss(path_kwargs):
        def f(ft, wt):
            return jnp.sum(subm_conv_apply(ft, nmap, wt, **path_kwargs) ** 2)
        return f

    gf_p, gw_p = jax.grad(loss(dict(window_frame=True,
                                    host_farp=host_farp)), (0, 1))(feat, w)
    gf_r, gw_r = jax.grad(loss(dict(window_frame=False)), (0, 1))(feat, w)
    for gp, gr in ((gf_p, gf_r), (gw_p, gw_r)):
        scale = float(jnp.max(jnp.abs(gr))) or 1.0
        np.testing.assert_allclose(np.asarray(gp) / scale,
                                   np.asarray(gr) / scale,
                                   atol=1e-5, rtol=1e-4)


def test_pooled_far_matches_per_tap_path():
    """Pooled and per-tap host layouts are two packagings of the SAME link
    set — outputs must agree (scatter-order association noise only)."""
    from robot3dlotus_tpu.train.datasets.structure import _far_lists_np
    feat, nmap, w, idx, _ = _setup(N=1024, far_frac=0.05)
    N = 1024
    tile = pallas_stem._stem_tile(N)
    per_tap = _far_lists_np(np.asarray(idx, np.int16),
                            pallas_stem.DEFAULT_STEM_HALO,
                            min(pallas_stem.DEFAULT_STEM_FAR_PER_TAP, N),
                            tile)
    farp, dropped, _, _ = _pool_from_idx(idx, N)
    assert per_tap[1].sum() == 0 and dropped.sum() == 0
    out_t = subm_conv_apply(
        feat, nmap, w, window_frame=True,
        host_far=(jnp.asarray(per_tap[0]), jnp.asarray(per_tap[1])))
    out_p = subm_conv_apply(
        feat, nmap, w, window_frame=True,
        host_farp=(jnp.asarray(farp), jnp.asarray(dropped)))
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_t),
                               atol=1e-4, rtol=1e-4)


def test_pooled_far_categorical():
    """Motion-planner stem: pooled far path must reproduce the label
    embedding exactly (it pre-applies on materialized channels instead of
    the raw-index gather trick)."""
    feat, nmap, w, idx, rng = _setup(C=7, Cout=24, N=1024, far_frac=0.05)
    Kcat, E = 4, 5
    K = nmap.idx.shape[-1]
    cat_idx = jnp.asarray(rng.randint(0, Kcat, feat.shape[:2]), jnp.int32)
    table = jnp.asarray(rng.randn(Kcat, E) * 0.3, jnp.float32)
    w_cat = jnp.asarray(rng.randn(K, 7 + E, 24) * 0.1, jnp.float32)
    farp, dropped, _, _ = _pool_from_idx(idx, 1024)
    assert dropped.sum() == 0
    host_farp = (jnp.asarray(farp), jnp.asarray(dropped))

    def run(tbl, **kw):
        return subm_conv_apply(feat, nmap, w_cat,
                               categorical=(cat_idx, tbl), **kw)

    ref = run(table, window_frame=False)
    out = run(table, window_frame=True, host_farp=host_farp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    gt_p = jax.grad(lambda t: jnp.sum(
        run(t, window_frame=True, host_farp=host_farp) ** 2))(table)
    gt_r = jax.grad(lambda t: jnp.sum(run(t, window_frame=False) ** 2))(table)
    scale = float(jnp.max(jnp.abs(gt_r))) or 1.0
    np.testing.assert_allclose(np.asarray(gt_p) / scale,
                               np.asarray(gt_r) / scale,
                               atol=1e-5, rtol=1e-4)


def test_pooled_truncation_counts_dropped():
    feat, nmap, w, idx, _ = _setup(N=1024, far_frac=0.2)
    farp, dropped, _, _ = _pool_from_idx(idx, 1024, pool=64)
    assert dropped.sum() > 0
    assert farp.shape[1] == 64
    tele = {}
    subm_conv_apply(feat, nmap, w, window_frame=True,
                    host_farp=(jnp.asarray(farp), jnp.asarray(dropped)),
                    telemetry=tele)
    assert int(tele["stem_far_dropped"]) == int(dropped.sum())
