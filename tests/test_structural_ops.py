"""Unit tests for patch maps, segment pooling, and submanifold conv neighbor
discovery, verified against small numpy brute-force implementations."""
import numpy as np
import jax.numpy as jnp

from robot3dlotus_tpu.ops.patching import (
    build_pad_maps, gather_sorted, scatter_back,
)
from robot3dlotus_tpu.ops.pooling import (
    build_pool_maps, segment_reduce, gather_heads, unpool_gather,
)
from robot3dlotus_tpu.ops.sparse_conv import (
    build_neighbor_map, subm_conv_apply, stencil_offsets,
)
from robot3dlotus_tpu.ops.serialization import (
    serialize_codes, argsort_with_inverse,
)


def test_pad_maps_reference_semantics():
    P, N = 4, 16
    # m > P, not multiple: duplicates from previous patch
    src, kv = build_pad_maps(jnp.asarray([10]), N, P)
    src, kv = np.asarray(src[0]), np.asarray(kv[0])
    np.testing.assert_array_equal(src[:10], np.arange(10))
    # npad = 12; slots 10,11 duplicate slots 6,7 (reference model.py:441-450)
    np.testing.assert_array_equal(src[10:12], [6, 7])
    assert kv[:12].all() and not kv[12:].any()

    # m <= P: single short segment, masked tail
    src, kv = build_pad_maps(jnp.asarray([3]), N, P)
    src, kv = np.asarray(src[0]), np.asarray(kv[0])
    np.testing.assert_array_equal(src[:3], np.arange(3))
    assert kv[:3].all() and not kv[3:].any()

    # exact multiple: no padding
    src, kv = build_pad_maps(jnp.asarray([8]), N, P)
    assert np.asarray(kv[0])[:8].all() and not np.asarray(kv[0])[8:].any()


def test_gather_scatter_roundtrip():
    rng = np.random.RandomState(0)
    B, N, C, P = 2, 32, 5, 8
    m = np.array([30, 12])
    gc = rng.randint(0, 64, size=(B, N, 3)).astype(np.int32)
    mask = np.arange(N)[None] < m[:, None]
    codes = serialize_codes(jnp.asarray(gc), jnp.asarray(mask), 6)
    order, inverse = argsort_with_inverse(codes)
    o0, i0 = order[0], inverse[0]  # first SFC order

    x = rng.randn(B, N, C).astype(np.float32)
    src, kv = build_pad_maps(jnp.asarray(m), N, P)
    xs = gather_sorted(jnp.asarray(x), o0, src)
    back = np.asarray(scatter_back(xs, i0))
    # identity on valid points
    np.testing.assert_allclose(back[mask], x[mask], atol=0)


def test_pooling_matches_bruteforce():
    rng = np.random.RandomState(1)
    B, N, C, cap = 2, 64, 7, 64
    m = np.array([60, 23])
    gc = rng.randint(0, 32, size=(B, N, 3)).astype(np.int32)
    mask = np.arange(N)[None] < m[:, None]
    codes = serialize_codes(jnp.asarray(gc), jnp.asarray(mask), 5)
    order, inverse = argsort_with_inverse(codes)
    o0, i0 = order[0], inverse[0]

    feat = rng.randn(B, N, C).astype(np.float32)
    coord = rng.randn(B, N, 3).astype(np.float32)

    codes0_sorted = np.take_along_axis(np.asarray(codes[0]), np.asarray(o0), -1)
    maps = build_pool_maps(jnp.asarray(codes0_sorted), o0, i0,
                           jnp.asarray(m), cap)

    feat_sorted = np.take_along_axis(
        feat, np.asarray(o0)[..., None].repeat(C, -1), axis=1)
    pooled = np.asarray(segment_reduce(jnp.asarray(feat_sorted), maps, cap, "max"))
    coord_sorted = np.take_along_axis(
        coord, np.asarray(o0)[..., None].repeat(3, -1), axis=1)
    pooled_coord = np.asarray(
        segment_reduce(jnp.asarray(coord_sorted), maps, cap, "mean"))

    for b in range(B):
        parent = (np.asarray(codes[0])[b] >> 3)[mask[b]]
        uniq = np.unique(parent)
        assert np.asarray(maps.child_counts)[b] == len(uniq)
        for j, u in enumerate(np.sort(uniq)):
            sel = (np.asarray(codes[0])[b] >> 3 == u) & mask[b]
            np.testing.assert_allclose(
                pooled[b, j], feat[b, sel].max(0), atol=1e-6)
            np.testing.assert_allclose(
                pooled_coord[b, j], coord[b, sel].mean(0), atol=1e-5)
        # cluster: original point -> its parent's rank among sorted uniques
        cl = np.asarray(maps.cluster)[b][mask[b]]
        expect = np.searchsorted(np.sort(uniq), parent)
        np.testing.assert_array_equal(cl, expect)

    # unpool gather: child feature broadcast back to parents
    up = np.asarray(unpool_gather(jnp.asarray(pooled), maps.cluster, cap))
    for b in range(B):
        parent = np.asarray(codes[0])[b] >> 3
        uniq = np.sort(np.unique(parent[mask[b]]))
        for i in np.where(mask[b])[0]:
            j = np.searchsorted(uniq, parent[i])
            np.testing.assert_allclose(up[b, i], pooled[b, j], atol=0)

    # head grid coords
    heads = np.asarray(gather_heads(jnp.asarray(gc), o0, maps))
    for b in range(B):
        parent = np.asarray(codes[0])[b] >> 3
        uniq = np.sort(np.unique(parent[mask[b]]))
        for j, u in enumerate(uniq):
            assert (parent[mask[b]] == u).any()
            # head's parent voxel must match the cluster's
            hp = heads[b, j]
            members = gc[b][mask[b] & (parent == u)]
            assert any((hp == mm).all() for mm in members)


def test_neighbor_map_and_conv():
    rng = np.random.RandomState(2)
    B, N, depth = 2, 48, 5
    m = np.array([48, 20])
    # unique coords per cloud to mimic voxelized input
    gcs = []
    for b in range(B):
        seen, pts = set(), []
        while len(pts) < N:
            c = tuple(rng.randint(0, 2 ** depth, 3))
            if c not in seen:
                seen.add(c)
                pts.append(c)
        gcs.append(pts)
    gc = np.array(gcs, np.int32)
    mask = np.arange(N)[None] < m[:, None]

    nmap = build_neighbor_map(jnp.asarray(gc), jnp.asarray(mask), 3, depth)
    offs = stencil_offsets(3)
    idx, ok = np.asarray(nmap.idx), np.asarray(nmap.ok)
    for b in range(B):
        lookup = {tuple(gc[b, i]): i for i in range(m[b])}
        for i in range(N):
            for k, off in enumerate(offs):
                tgt = tuple(gc[b, i] + off)
                if mask[b, i] and tgt in lookup and all(
                        0 <= t < 2 ** depth for t in tgt):
                    assert ok[b, i, k], (b, i, k)
                    assert idx[b, i, k] == lookup[tgt]
                else:
                    assert not ok[b, i, k]

    Cin, Cout = 6, 4
    feat = rng.randn(B, N, Cin).astype(np.float32)
    w = rng.randn(len(offs), Cin, Cout).astype(np.float32) * 0.1
    bias = rng.randn(Cout).astype(np.float32)
    out = np.asarray(subm_conv_apply(jnp.asarray(feat), nmap,
                                     jnp.asarray(w), jnp.asarray(bias)))
    for b in range(B):
        lookup = {tuple(gc[b, i]): i for i in range(m[b])}
        for i in range(min(10, int(m[b]))):
            acc = bias.copy()
            for k, off in enumerate(offs):
                j = lookup.get(tuple(gc[b, i] + off))
                if j is not None:
                    acc = acc + feat[b, j] @ w[k]
            np.testing.assert_allclose(out[b, i], acc, rtol=2e-3, atol=1e-3)


def test_farthest_point_sample_matches_numpy():
    import numpy as np
    import jax.numpy as jnp
    from robot3dlotus_tpu.ops.sampling import (
        farthest_point_sample, farthest_point_sample_np)
    rng = np.random.RandomState(3)
    pts = rng.randn(200, 6).astype(np.float32)
    ref = farthest_point_sample_np(pts, 32, start=7)
    idxs = np.asarray(farthest_point_sample(jnp.asarray(pts[:, :3]), 32,
                                            start=7))
    np.testing.assert_allclose(pts[idxs], ref, atol=1e-6)
    # masked variant never selects padded slots
    mask = np.ones(200, bool); mask[150:] = False
    idxs = np.asarray(farthest_point_sample(
        jnp.asarray(pts[:, :3]), 32, mask=jnp.asarray(mask), start=7))
    assert idxs.max() < 150


def test_pool_overflow_counter():
    """More unique parents than child capacity must surface a nonzero
    pool_overflow instead of silently dropping geometry."""
    import jax.numpy as jnp
    from robot3dlotus_tpu.ops.pooling import build_pool_maps
    import numpy as np
    # 16 points, every point its own parent voxel (codes spaced 8 apart so
    # code >> 3 is unique), capacity only 4 -> overflow = 12
    codes = jnp.asarray(np.arange(16, dtype=np.int32)[None] * 8)
    order = jnp.asarray(np.arange(16, dtype=np.int32)[None])
    maps = build_pool_maps(codes, order, order, jnp.asarray([16]), 4)
    assert int(maps.child_counts[0]) == 16
    overflow = int(jnp.maximum(maps.child_counts - 4, 0).sum())
    assert overflow == 12
    assert bool(maps.child_mask[0].all())


def test_native_voxelizer_matches_numpy():
    import os
    import numpy as np
    from robot3dlotus_tpu.native import (
        voxelize_trace_native, crop_voxelize_trace_native)
    rng = np.random.RandomState(7)
    xyz = rng.uniform(-0.5, 0.9, (20000, 3)).astype(np.float32)
    nat = voxelize_trace_native(xyz, 0.01)
    if nat is None:
        import pytest
        pytest.skip("no g++ / native disabled")
    # numpy reference path (force fallback)
    os.environ["ROBOT3DLOTUS_NATIVE"] = "0"
    try:
        import robot3dlotus_tpu.native as native_mod
        lib, tried = native_mod._LIB, native_mod._TRIED
        native_mod._LIB, native_mod._TRIED = None, True
        from robot3dlotus_tpu.ops.voxel import voxelize_pcd_np
        ref_means, ref_first = voxelize_pcd_np(xyz, 0.01)
    finally:
        native_mod._LIB, native_mod._TRIED = lib, tried
        os.environ.pop("ROBOT3DLOTUS_NATIVE")
    means, first = nat
    np.testing.assert_array_equal(first, ref_first)
    np.testing.assert_allclose(means, ref_means, atol=1e-6)

    # fused crop+voxelize against the two-stage pipeline
    from robot3dlotus_tpu.configs.rlbench.constants import get_robot_workspace
    from robot3dlotus_tpu.ops.voxel import workspace_mask_np
    ws = get_robot_workspace()
    fused = crop_voxelize_trace_native(xyz, 0.01, ws, rm_table=True)
    assert fused is not None
    f_means, f_first, keep = fused
    ref_keep = workspace_mask_np(xyz, ws, rm_table=True)
    np.testing.assert_array_equal(keep, ref_keep)
    from robot3dlotus_tpu.ops.voxel import voxelize_pcd_np as vox
    r_means, r_first = vox(xyz[ref_keep], 0.01)
    orig = np.where(ref_keep)[0]
    np.testing.assert_array_equal(f_first, orig[r_first])
    np.testing.assert_allclose(f_means, r_means, atol=1e-6)


def test_subm_conv_streaming_matches_dense():
    """The scan-over-offsets dataflow (low-HBM path, ops/sparse_conv.py) is
    numerically identical to the materialize-and-matmul dataflow."""
    from robot3dlotus_tpu.ops.sparse_conv import NeighborMap
    rng = np.random.RandomState(7)
    B, N, K, Cin, Cout = 2, 40, 27, 6, 8
    feat = jnp.asarray(rng.randn(B, N, Cin).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, N, K)).astype(np.int32))
    ok = jnp.asarray(rng.rand(B, N, K) > 0.4)
    w = jnp.asarray(rng.randn(K, Cin, Cout).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(Cout).astype(np.float32))
    nmap = NeighborMap(idx=idx, ok=ok)
    dense = np.asarray(subm_conv_apply(feat, nmap, w, bias, streaming=False))
    stream = np.asarray(subm_conv_apply(feat, nmap, w, bias, streaming=True))
    np.testing.assert_allclose(dense, stream, rtol=1e-5, atol=1e-5)


def test_dense_neighbor_map_matches_searchsorted():
    """Dense occupancy-table neighbor lookup (sparse_conv.py extent path)
    vs the z-order searchsorted path: identical idx/ok on in-extent coords,
    including duplicate-coordinate lowest-index-winner semantics."""
    import numpy as np
    import jax.numpy as jnp
    from robot3dlotus_tpu.ops.sparse_conv import build_neighbor_map

    rng = np.random.RandomState(3)
    B, N = 2, 192
    gc = rng.randint(0, 20, (B, N, 3)).astype(np.int32)
    gc[0, 5] = gc[0, 9]  # duplicate coordinate
    mask = np.ones((B, N), bool)
    mask[1, 170:] = False
    gc = jnp.asarray(gc)
    mask = jnp.asarray(mask)
    for k in (3, 5):
        a = build_neighbor_map(gc, mask, k, depth=6)
        b = build_neighbor_map(gc, mask, k, depth=6, extent=32)
        np.testing.assert_array_equal(np.asarray(a.ok), np.asarray(b.ok))
        np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))


def test_subm_conv_categorical_split_matches_concat():
    """The motion planner's stem passes its semantic-label embedding as a
    (index, table) categorical instead of materialized channels; the smallc
    one-hot gather path (interpret mode) must match the concat+streaming
    dataflow exactly — the one-hot reconstruct is a row-select, not an
    approximation (ops/sparse_conv.py categorical path)."""
    import robot3dlotus_tpu.ops.sparse_conv as sc
    rng = np.random.RandomState(11)
    B, N, K, Cin, E, Cout = 2, 64, 27, 7, 16, 8
    feat = jnp.asarray(rng.randn(B, N, Cin).astype(np.float32))
    lab = jnp.asarray(rng.randint(0, 4, (B, N)).astype(np.int32))
    table = jnp.asarray(rng.randn(4, E).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, N, K)).astype(np.int32))
    ok = jnp.asarray(rng.rand(B, N, K) > 0.3)
    w = jnp.asarray(rng.randn(K, Cin + E, Cout).astype(np.float32) * 0.1)
    nmap = sc.NeighborMap(idx=idx, ok=ok)

    concat = jnp.concatenate([feat, table[lab]], axis=-1)
    ref = np.asarray(sc.subm_conv_apply(concat, nmap, w, streaming=True))

    sc._SMALLC_INTERPRET = True
    try:
        got = np.asarray(sc.subm_conv_apply(
            feat, nmap, w, streaming=True, categorical=(lab, table)))
    finally:
        sc._SMALLC_INTERPRET = False
    np.testing.assert_allclose(ref, got, rtol=1e-5, atol=1e-5)


def test_native_voxelizer_nonfinite_points():
    """A NaN coordinate must never reach the dense-grid binning (it would
    cast to an arbitrary int64 cell index): without a crop box the native
    path declines (numpy-twin fallback), with a crop box the point is
    dropped by the NaN-false comparisons (native/voxelize.cpp pass 1)."""
    from robot3dlotus_tpu.native import (
        get_lib, voxelize_trace_native, crop_voxelize_trace_native,
    )
    if get_lib() is None:
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.RandomState(0)
    xyz = rng.uniform(-1, 1, (5000, 3)).astype(np.float32)
    bad = xyz.copy()
    bad[17, 1] = np.nan

    assert voxelize_trace_native(xyz, 0.01) is not None
    assert voxelize_trace_native(bad, 0.01) is None

    ws = {"X_BBOX": (-0.5, 0.7), "Y_BBOX": (-0.6, 0.6),
          "Z_BBOX": (-0.8, 2.0), "TABLE_HEIGHT": -0.7}
    out = crop_voxelize_trace_native(bad, 0.01, ws, rm_table=True)
    assert out is not None
    _, _, keep = out
    assert not keep[17]


def test_host_neighbor_map_matches_device():
    """The loader's host twin (build_neighbor_map_np, -1 = missing) must
    reproduce the device builder on both its paths (dense table and
    z-order searchsorted), including duplicate-coordinate winners."""
    import jax.numpy as jnp
    from robot3dlotus_tpu.ops.sparse_conv import (
        build_neighbor_map, build_neighbor_map_np)
    rng = np.random.RandomState(3)
    B, N, depth = 3, 160, 9
    for kernel, extent in ((3, 64), (5, 64), (3, 0)):
        gc = rng.randint(0, 24, (B, N, 3)).astype(np.int32)
        gc[1, 10] = gc[1, 11]  # duplicate coordinate: lowest index wins
        counts = np.array([N, N - 37, 5], np.int32)
        mask = np.arange(N)[None] < counts[:, None]
        dev = build_neighbor_map(jnp.asarray(gc), jnp.asarray(mask),
                                 kernel, depth,
                                 extent=extent if extent else None)
        host = build_neighbor_map_np(gc, counts, kernel, depth,
                                     extent=extent if extent else None)
        ok_h = host >= 0
        np.testing.assert_array_equal(ok_h, np.asarray(dev.ok),
                                      err_msg=f"k={kernel} extent={extent}")
        np.testing.assert_array_equal(np.where(ok_h, host, 0),
                                      np.asarray(dev.idx),
                                      err_msg=f"k={kernel} extent={extent}")


def test_native_neighbor_map_matches_numpy():
    """The C++ dense-table stencil builder (native/voxelize.cpp
    neighbor_map_dense) must be bit-identical to build_neighbor_map_np,
    including duplicate-coordinate winners, short clouds, and the all
    -1 padding tail; out-of-extent coords must make it bail (None)."""
    from robot3dlotus_tpu.native import neighbor_map_dense_native
    from robot3dlotus_tpu.ops.sparse_conv import (
        build_neighbor_map_np, stencil_offsets)
    lib_out = neighbor_map_dense_native(
        np.zeros((1, 4, 3), np.int32), np.array([4], np.int32),
        stencil_offsets(3), 8)
    if lib_out is None:
        import pytest
        pytest.skip("native library unavailable on this host")
    rng = np.random.RandomState(11)
    B, N = 3, 200
    for kernel, extent in ((3, 32), (5, 64)):
        gc = rng.randint(0, extent // 2, (B, N, 3)).astype(np.int32)
        gc[0, 5] = gc[0, 6]  # duplicate coord: lowest index wins
        counts = np.array([N, N - 61, 0], np.int32)
        offs = stencil_offsets(kernel)
        native = neighbor_map_dense_native(gc, counts, offs, extent)
        host = build_neighbor_map_np(gc, counts, kernel, 8, extent=extent)
        np.testing.assert_array_equal(
            native, host.astype(np.int16),
            err_msg=f"k={kernel} extent={extent}")
    # out-of-extent coordinate -> native bails, numpy twin handles it
    gc_bad = gc.copy()
    gc_bad[1, 0] = extent + 3
    assert neighbor_map_dense_native(gc_bad, counts, offs, extent) is None
