"""Point sampling ops.

Farthest-point sampling — parity with the reference numpy fallback
(train/datasets/common.py:108-129; the CUDA pointnet2_ops FPS is installed
but never imported there). The JAX variant runs the greedy selection as a
lax.scan with static shapes (one masked argmax + one distance update per
step, both VPU-friendly), so it jits and batches with vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def farthest_point_sample_np(points: np.ndarray, npoint: int,
                             start: int | None = None,
                             rng: np.random.RandomState | None = None):
    """Greedy FPS on host numpy; returns the sampled rows of `points`.
    Matches the reference semantics (first pick random unless given)."""
    n = len(points)
    xyz = points[:, :3]
    if start is None:
        start = int((rng or np.random).randint(0, n))
    idxs = np.zeros(npoint, np.int32)
    distance = np.full(n, 1e10, points.dtype)
    farthest = start
    for i in range(npoint):
        idxs[i] = farthest
        d = np.sum((xyz - xyz[farthest]) ** 2, -1)
        np.minimum(distance, d, out=distance)
        farthest = int(np.argmax(distance))
    return points[idxs]


def farthest_point_sample(xyz: jnp.ndarray, npoint: int,
                          mask: jnp.ndarray | None = None,
                          start: int = 0) -> jnp.ndarray:
    """FPS indices on device. xyz: (N, 3); mask: (N,) bool validity
    (padded slots are never selected). Returns (npoint,) int32 indices.
    Deterministic: the first pick is `start` (callers wanting the
    reference's random start pass a drawn index)."""
    n = xyz.shape[0]
    big = jnp.asarray(1e10, xyz.dtype)
    dist0 = jnp.full((n,), big, xyz.dtype)
    if mask is not None:
        dist0 = jnp.where(mask, dist0, -big)

    def step(carry, _):
        distance, farthest = carry
        centroid = xyz[farthest]
        d = jnp.sum((xyz - centroid) ** 2, -1)
        distance = jnp.minimum(distance, d)
        if mask is not None:
            nxt = jnp.argmax(jnp.where(mask, distance, -big))
        else:
            nxt = jnp.argmax(distance)
        return (distance, nxt), farthest

    (_, _), idxs = jax.lax.scan(
        step, (dist0, jnp.asarray(start, jnp.int32)), None, length=npoint)
    return idxs.astype(jnp.int32)
