"""Voxel-grid downsampling with trace + workspace filtering, open3d-free.

Reference uses o3d voxel_down_sample_and_trace (utils/point_cloud.py:8-17,
eval_simple_policy.py:169-176): output point = mean of member points per
occupied voxel; attributes (rgb/sem) taken from the first traced member.

Host numpy implementation (preprocessing runs on host); a jnp variant serves
fused on-device eval preprocessing.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def voxelize_pcd_np(xyz, voxel_size=0.01):
    """xyz: (N, 3). Returns (vox_xyz (M,3) means, first_idx (M,) int64).

    Output voxels are ordered by their (x,y,z) grid key (np.unique order);
    the reference's o3d ordering is unspecified, and downstream random
    sampling makes the order immaterial.

    float32 input dispatches to the C++ hash-map voxelizer
    (native/voxelize.cpp) when available — identical outputs, one pass
    instead of sort-based unique. Other dtypes always take the numpy path:
    casting float64 to float32 moves boundary points across voxel edges,
    so results would depend on whether a compiler was available.
    """
    xyz = np.asarray(xyz)
    if len(xyz) == 0:
        return xyz, np.zeros(0, np.int64)
    if xyz.dtype == np.float32:
        from ..native import voxelize_trace_native
        native = voxelize_trace_native(xyz, voxel_size)
        if native is not None:
            return native
    origin = xyz.min(0)
    grid = np.floor((xyz - origin) / voxel_size).astype(np.int64)
    _, inv, counts = np.unique(grid, axis=0, return_inverse=True,
                               return_counts=True)
    M = counts.shape[0]
    sums = np.zeros((M, 3), np.float64)
    np.add.at(sums, inv, xyz)
    means = (sums / counts[:, None]).astype(xyz.dtype)
    first = np.full(M, len(xyz), np.int64)
    np.minimum.at(first, inv, np.arange(len(xyz)))
    return means, first


def workspace_mask_np(xyz, workspace, rm_table=True):
    """Reference eval_simple_policy.py:156-160."""
    m = (
        (xyz[:, 0] > workspace["X_BBOX"][0])
        & (xyz[:, 0] < workspace["X_BBOX"][1])
        & (xyz[:, 1] > workspace["Y_BBOX"][0])
        & (xyz[:, 1] < workspace["Y_BBOX"][1])
        & (xyz[:, 2] > workspace["Z_BBOX"][0])
        & (xyz[:, 2] < workspace["Z_BBOX"][1])
    )
    if rm_table:
        m = m & (xyz[:, 2] > workspace["TABLE_HEIGHT"])
    return m


def voxelize_fixed_jnp(xyz, mask, voxel_size, capacity, depth=10):
    """Static-shape device voxelization: returns (vox_xyz (C,3), vox_mask (C,),
    first_idx (C,), overflow ()) for <= `capacity` occupied voxels (sorted
    by z-order of the grid key). `overflow` counts what was DROPPED: occupied
    voxels beyond capacity (the largest z-codes — a spatially contiguous
    corner of the workspace) plus points whose grid coordinate exceeds the
    2^depth-cell extent (they are masked out rather than silently merged
    into a clipped boundary voxel). Callers must surface a nonzero overflow
    like pool_overflow/conv_far_dropped rather than degrade silently.
    Suitable for fused on-device eval preprocessing."""
    from .serialization import z_order_encode

    big = jnp.float32(1e9)
    origin = jnp.min(jnp.where(mask[:, None], xyz, big), axis=0)
    gc_raw = jnp.floor((xyz - origin) / voxel_size).astype(jnp.int32)
    limit = (1 << depth) - 1
    # out-of-extent points (voxel_size too small for the cloud's span):
    # dropping them is loud (counted below); clipping would silently merge
    # them into a boundary voxel and corrupt its mean/first gather
    oob = mask & jnp.any((gc_raw < 0) | (gc_raw > limit), axis=1)
    mask = mask & ~oob
    gc = jnp.clip(gc_raw, 0, limit)
    sentinel = jnp.int32(jnp.iinfo(jnp.int32).max)
    codes = jnp.where(mask, z_order_encode(gc, depth), sentinel)
    order = jnp.argsort(codes)
    codes_sorted = codes[order]
    n = xyz.shape[0]
    prev = jnp.concatenate([jnp.full((1,), -1, codes.dtype),
                            codes_sorted[:-1]])
    valid_sorted = codes_sorted != sentinel
    head = (codes_sorted != prev) & valid_sorted
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1
    seg = jnp.where(valid_sorted & (seg < capacity), seg, capacity)

    xyz_sorted = xyz[order]
    sums = jnp.zeros((capacity + 1, 3), jnp.float32).at[seg].add(xyz_sorted)
    cnts = jnp.zeros((capacity + 1,), jnp.float32).at[seg].add(1.0)
    means = sums[:capacity] / jnp.maximum(cnts[:capacity, None], 1.0)

    first = jnp.full((capacity + 1,), n, jnp.int32).at[seg].min(
        order.astype(jnp.int32))
    nseg = jnp.sum(head.astype(jnp.int32))
    vmask = jnp.arange(capacity) < jnp.minimum(nseg, capacity)
    overflow = jnp.maximum(nseg - capacity, 0) + \
        jnp.sum(oob.astype(jnp.int32))
    return means, vmask, jnp.clip(first[:capacity], 0, n - 1), overflow
