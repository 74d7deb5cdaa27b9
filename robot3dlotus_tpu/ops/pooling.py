"""Serialized grid pooling / unpooling as masked segment reductions.

Reference semantics (model.py:713-790 SerializedPooling): cluster points by
their first-order SFC code shifted right 3*pooling_depth bits (i.e. the parent
voxel), reduce features per cluster (max) and coords (mean), carry the head
point's grid_coord >> depth and all orders' codes >> 3*depth, and remember the
point->cluster map for unpooling (model.py:817-828).

TPU-first formulation: points arrive already sorted by codes[0]; cluster
boundaries are where the shifted code changes, segment ids are a cumsum of
boundary flags, and the reductions are static-shape scatter-max / scatter-add
into a fixed child capacity. Every op is (B, N) vectorized — no host sync, no
dynamic shapes. Child clouds use capacity child_cap with a validity mask;
overflow segments (more unique parents than capacity — geometrically
implausible for stride-2 pooling of surface scans at <=1/2 capacity) are
dropped.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PoolMaps(NamedTuple):
    """Static-shape pooling plan for one stage transition (all per-batch)."""
    seg_sorted: jnp.ndarray    # (B, N) int32: segment id of each sorted slot (child_cap = drop)
    cluster: jnp.ndarray       # (B, N) int32: segment id of each ORIGINAL point (for unpool)
    head_sorted_pos: jnp.ndarray  # (B, C) int32: sorted position of each segment's head
    child_mask: jnp.ndarray    # (B, C) bool
    child_counts: jnp.ndarray  # (B,) int32 — number of valid segments


def build_pool_maps(codes0_sorted, order0, inverse0, valid_counts, child_cap,
                    pooling_depth=1):
    """codes0_sorted: (B, N) int32 — first-order codes gathered in sorted order
    (ascending; padding sentinel at the tail). order0/inverse0: (B, N), or
    None when the caller's point frame IS the sorted frame (the
    sorted-resident backbone): cluster then equals seg and the extra int
    gather is skipped. Returns PoolMaps with child capacity child_cap."""
    B, N = codes0_sorted.shape
    parent = codes0_sorted >> (3 * pooling_depth)
    p = jnp.arange(N, dtype=jnp.int32)[None, :]
    valid = p < valid_counts[:, None]
    prev = jnp.concatenate([jnp.full((B, 1), -1, parent.dtype),
                            parent[:, :-1]], axis=1)
    head = (parent != prev) & valid
    seg = jnp.cumsum(head.astype(jnp.int32), axis=1) - 1
    child_counts = jnp.sum(head.astype(jnp.int32), axis=1)
    # drop slot: invalid points or overflow segments index child_cap
    seg = jnp.where(valid & (seg < child_cap), seg, child_cap)

    # head position per segment: scatter-min of sorted position
    big = jnp.int32(N)
    head_pos = jnp.full((B, child_cap + 1), big, jnp.int32)
    head_pos = head_pos.at[jnp.arange(B)[:, None], seg].min(
        jnp.broadcast_to(p, (B, N)))
    head_pos = jnp.clip(head_pos[:, :child_cap], 0, N - 1)

    cidx = jnp.arange(child_cap, dtype=jnp.int32)[None, :]
    child_mask = cidx < jnp.minimum(child_counts, child_cap)[:, None]

    # segment id per original point (identity when frame == sorted frame)
    cluster = seg if inverse0 is None else \
        jnp.take_along_axis(seg, inverse0, axis=1)
    return PoolMaps(seg, cluster, head_pos, child_mask, child_counts)


def _batch_scatter(init, seg, values, mode):
    """init: (B, C+1, ...) ; seg: (B, N); values: (B, N, ...)."""
    B = seg.shape[0]
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    ref = init.at[bidx, seg]
    return getattr(ref, mode)(values)


def segment_reduce(values_sorted, maps: PoolMaps, child_cap, reduce="max"):
    """values_sorted: (B, N, C) in sorted order. Returns (B, child_cap, C)."""
    B, N, C = values_sorted.shape
    if reduce == "max":
        init = jnp.full((B, child_cap + 1, C), -jnp.inf, values_sorted.dtype)
        out = _batch_scatter(init, maps.seg_sorted, values_sorted, "max")
    elif reduce == "min":
        init = jnp.full((B, child_cap + 1, C), jnp.inf, values_sorted.dtype)
        out = _batch_scatter(init, maps.seg_sorted, values_sorted, "min")
    elif reduce in ("sum", "mean"):
        init = jnp.zeros((B, child_cap + 1, C), values_sorted.dtype)
        out = _batch_scatter(init, maps.seg_sorted, values_sorted, "add")
        if reduce == "mean":
            ones = jnp.ones((B, N, 1), values_sorted.dtype)
            cnt = _batch_scatter(
                jnp.zeros((B, child_cap + 1, 1), values_sorted.dtype),
                maps.seg_sorted, ones, "add")
            out = out / jnp.maximum(cnt, 1.0)
    else:
        raise ValueError(reduce)
    out = out[:, :child_cap]
    return jnp.where(maps.child_mask[..., None], out, 0.0)


def gather_heads(x, order0, maps: PoolMaps):
    """x: (B, N, ...) original order -> (B, child_cap, ...) head attr.
    order0 None = x is already in the sorted frame."""
    head_orig = maps.head_sorted_pos if order0 is None else \
        jnp.take_along_axis(order0, maps.head_sorted_pos, axis=1)
    out = x
    idx = head_orig
    while idx.ndim < x.ndim:
        idx = idx[..., None]
    idx = jnp.broadcast_to(idx, head_orig.shape + x.shape[2:])
    return jnp.take_along_axis(out, idx, axis=1)


def unpool_gather(child_feat, cluster, child_cap):
    """child_feat: (B, C, D); cluster: (B, N) segment id per original parent
    point (child_cap = dropped -> zeros). Returns (B, N, D)."""
    B, C, D = child_feat.shape
    padded = jnp.concatenate(
        [child_feat, jnp.zeros((B, 1, D), child_feat.dtype)], axis=1)
    from .pallas_gather import permute_rows
    return permute_rows(padded, cluster)
