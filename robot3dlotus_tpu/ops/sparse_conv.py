"""Submanifold sparse convolution for TPU: neighbor maps + gather-matmul.

Replaces spconv.SubMConv3d (reference model.py:615-622 CPE k=3, :844-852 stem
k=5). A submanifold conv keeps the active-site set fixed and, for each active
voxel v, computes  out[v] = sum_o W[o] @ feat[neighbor(v, o)]  over the k^3
stencil offsets o, skipping empty neighbors.

TPU-first formulation (static shapes, MXU-dominant):
  1. neighbor discovery = binary search: z-order-encode each voxel, sort once
     per stage, and for all k^3 offsets searchsorted the query codes
     (z-order encode of grid_coord + offset). One (B, N, K) int32 map per
     stage, shared by every conv in that stage — the analogue of spconv's
     indice_key caching (model.py:621, 1000).
  2. apply = one big matmul: gather neighbor features to (B, N, K*Cin) with
     zeros at missing neighbors, then einsum against W (K*Cin, Cout). XLA maps
     this straight onto the MXU; no scatter in the backward pass beyond the
     gather transpose.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .serialization import z_order_encode


class NeighborMap(NamedTuple):
    idx: jnp.ndarray    # (B, N, K) int32 — original-order point index of neighbor
    ok: jnp.ndarray     # (B, N, K) bool — neighbor exists


def stencil_offsets(kernel_size: int) -> np.ndarray:
    """k^3 offsets in spconv's iteration order (x-major, ascending), centered."""
    r = kernel_size // 2
    rng = np.arange(-r, kernel_size - r)
    grid = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), axis=-1)
    return grid.reshape(-1, 3).astype(np.int32)  # (K, 3)


def build_neighbor_map(grid_coord, mask, kernel_size: int, depth: int
                       ) -> NeighborMap:
    """grid_coord: (B, N, 3) int32 >= 0; mask: (B, N) bool."""
    B, N, _ = grid_coord.shape
    offs = jnp.asarray(stencil_offsets(kernel_size))  # (K, 3)
    K = offs.shape[0]

    sentinel = jnp.int32(jnp.iinfo(jnp.int32).max)
    codes = jnp.where(mask, z_order_encode(grid_coord, depth), sentinel)
    sort_idx = jnp.argsort(codes, axis=-1)
    codes_sorted = jnp.take_along_axis(codes, sort_idx, axis=-1)  # (B, N)

    q_coord = grid_coord[:, :, None, :] + offs[None, None, :, :]  # (B,N,K,3)
    in_range = jnp.all((q_coord >= 0) & (q_coord < (1 << depth)), axis=-1)
    q_codes = z_order_encode(jnp.clip(q_coord, 0, (1 << depth) - 1), depth)

    # vectorized binary search per batch row
    pos = _vmap_searchsorted(codes_sorted, q_codes.reshape(B, -1))
    pos = jnp.clip(pos, 0, N - 1).astype(jnp.int32)
    found = jnp.take_along_axis(codes_sorted, pos, axis=-1) == \
        q_codes.reshape(B, -1)
    nbr = jnp.take_along_axis(sort_idx, pos, axis=-1).astype(jnp.int32)

    ok = found.reshape(B, N, K) & in_range & mask[:, :, None]
    idx = jnp.where(ok, nbr.reshape(B, N, K), 0)
    return NeighborMap(idx=idx, ok=ok)


def _vmap_searchsorted(sorted_rows, queries):
    import jax
    return jax.vmap(jnp.searchsorted)(sorted_rows, queries)


def subm_conv_apply(feat, nmap: NeighborMap, weight, bias=None):
    """feat: (B, N, Cin); weight: (K, Cin, Cout); bias: (Cout,) or None.

    out[b, n] = sum_k ok * W[k]^T feat[b, idx[b,n,k]]  (+ bias on active sites)
    """
    gathered = _gather_neighbors(feat, nmap.idx)
    gathered = jnp.where(nmap.ok[..., None], gathered, 0.0)
    out = jnp.einsum(
        "bnkc,kcd->bnd", gathered, weight,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    # accumulation is fp32 (preferred_element_type); return in the stream
    # dtype so a bfloat16 residual stream stays bfloat16
    return out.astype(feat.dtype)


def _gather_neighbors(feat, idx):
    """feat: (B, N, C); idx: (B, N, K) -> (B, N, K, C)."""
    B, N, C = feat.shape
    K = idx.shape[-1]
    flat = idx.reshape(B, N * K)
    g = jnp.take_along_axis(
        feat, jnp.broadcast_to(flat[..., None], (B, N * K, C)), axis=1)
    return g.reshape(B, N, K, C)
