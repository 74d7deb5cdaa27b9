"""Dense patch construction for serialized attention.

Reference semantics (model.py:410-466 get_padding_and_inverse): each cloud's
serialized sequence is padded up to a multiple of patch_size P by *duplicating
points of the previous patch* (not masking), then flash varlen attention runs
over patches without masks; clouds with fewer than P points form one short
(unpadded) varlen segment.

TPU-first formulation: every cloud occupies a fixed capacity N (multiple of
P). For sorted position p in [0, N):
    src(p) = p                 if p <  m      (real point, sorted order)
    src(p) = p - P             if m <= p < npad   (duplicate of prev patch)
    src(p) = 0  (masked)       if p >= npad       (dead slot)
with npad = ceil(m/P)*P when m > P else m. Dead slots are the only masked
keys, so softmax denominators bit-match the reference's duplicate-pad scheme
for every live patch; the m < P case reduces to a masked tail exactly like a
varlen segment of length m.

All outputs are (B, N) maps usable with jnp.take_along_axis.
"""
from __future__ import annotations

import jax.numpy as jnp


def build_pad_maps(valid_counts: jnp.ndarray, capacity: int, patch_size: int):
    """Args:
      valid_counts: (B,) int32 — number of real points m per cloud.
      capacity: N (static), multiple of patch_size.
      patch_size: P (static).
    Returns:
      src_pos: (B, N) int32 — sorted-position to attend from (see module doc).
      key_valid: (B, N) bool — False only on dead slots.
    """
    assert capacity % patch_size == 0
    m = valid_counts[:, None].astype(jnp.int32)  # (B, 1)
    p = jnp.arange(capacity, dtype=jnp.int32)[None, :]  # (1, N)
    npad = jnp.where(
        m > patch_size,
        ((m + patch_size - 1) // patch_size) * patch_size,
        m,
    )
    src_pos = jnp.where(p < m, p, jnp.where(p < npad, p - patch_size, 0))
    key_valid = p < npad
    return src_pos, key_valid


def gather_sorted(x: jnp.ndarray, order: jnp.ndarray, src_pos: jnp.ndarray):
    """x: (B, N, ...) in original point order; order: (B, N) sorted index list;
    src_pos: (B, N) from build_pad_maps. Returns x arranged in padded
    serialized order: out[b, p] = x[b, order[b, src_pos[b, p]]].

    Row permutes ride the one-hot MXU kernel (ops/pallas_gather.py) on TPU;
    XLA take_along_axis elsewhere / for non-float or oversized operands."""
    idx = jnp.take_along_axis(order, src_pos, axis=-1)
    if x.ndim == 3:
        from .pallas_gather import permute_rows
        return permute_rows(x, idx)
    return jnp.take_along_axis(x, _expand_idx(idx, x), axis=1)


def _expand_idx(idx, x):
    out = idx
    while out.ndim < x.ndim:
        out = out[..., None]
    return jnp.broadcast_to(out, idx.shape + x.shape[2:])


def scatter_back(attn_out: jnp.ndarray, inverse: jnp.ndarray):
    """attn_out: (B, N, ...) in padded serialized order; inverse: (B, N) rank of
    each original point. Returns per-original-point features. Ranks of valid
    points are < m so they always index a real (non-duplicate) slot."""
    if attn_out.ndim == 3:
        from .pallas_gather import permute_rows
        return permute_rows(attn_out, inverse)
    return jnp.take_along_axis(attn_out, _expand_idx(inverse, attn_out), axis=1)


def dup_pad_identity(x_sorted: jnp.ndarray, counts: jnp.ndarray,
                     patch_size: int):
    """Duplicate-padding when x is ALREADY in serialized order (the
    sorted-resident backbone dataflow): src_pos degenerates to
    {p, p-P, dead}, so the gather is a static shift + select — zero
    permute work, pure VPU.

    x_sorted: (B, N, ...) serialized order; counts: (B,) valid prefix
    lengths. Matches gather_sorted(x, identity_order, src_pos) on all live
    rows (p < npad); dead rows get the shifted value instead of row 0 —
    they are key-masked and never scattered back, so the difference is
    unobservable (see build_pad_maps docstring).
    """
    B, N = x_sorted.shape[:2]
    p = jnp.arange(N, dtype=jnp.int32)[None, :]
    m = counts[:, None].astype(jnp.int32)
    pad_widths = ((0, 0), (patch_size, 0)) + ((0, 0),) * (x_sorted.ndim - 2)
    shifted = jnp.pad(x_sorted, pad_widths)[:, :N]
    sel = p < m
    while sel.ndim < x_sorted.ndim:
        sel = sel[..., None]
    return jnp.where(sel, x_sorted, shifted)
