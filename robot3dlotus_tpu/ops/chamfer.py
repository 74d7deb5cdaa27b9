"""Chamfer / nearest-neighbor distances between small point clouds.

Replaces the reference's CUDA chamferdist fork (vlm_pipeline.py:82,483-520;
robot_pipeline.py:116-121). Cloud sizes in the grounding pipeline are a few
thousand points, so a brute-force pairwise reduction is a single matmul-style
op — the TPU-native formulation. A numpy twin serves host-only paths.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _pairwise_sqdist_np(a, b):
    # |a|^2 + |b|^2 - 2ab
    a2 = np.sum(a * a, -1)[:, None]
    b2 = np.sum(b * b, -1)[None, :]
    return np.maximum(a2 + b2 - 2.0 * (a @ b.T), 0.0)


def chamfer_distance_np(src, tgt, point_reduction="mean"):
    """One-directional chamfer: per-src-point nearest sq-distance to tgt,
    reduced by `point_reduction` (mean | sum | min — matching chamferdist)."""
    if len(src) == 0 or len(tgt) == 0:
        return np.inf
    d = _pairwise_sqdist_np(np.asarray(src, np.float64),
                            np.asarray(tgt, np.float64)).min(-1)
    if point_reduction == "mean":
        return float(d.mean())
    if point_reduction == "sum":
        return float(d.sum())
    if point_reduction == "min":
        return float(d.min())
    raise ValueError(point_reduction)


def min_pair_distance_np(a, b):
    """min over all pairs of Euclidean distance (the 'min'-reduced symmetric
    chamfer used by the merging heuristics)."""
    return float(np.sqrt(chamfer_distance_np(a, b, "min")))


@jax.jit
def _pairwise_sqdist_jnp(a, b):
    a2 = jnp.sum(a * a, -1)[:, None]
    b2 = jnp.sum(b * b, -1)[None, :]
    return jnp.maximum(
        a2 + b2 - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32),
        0.0)


def chamfer_distance_jnp(src, tgt, point_reduction="mean"):
    d = jnp.min(_pairwise_sqdist_jnp(src, tgt), axis=-1)
    if point_reduction == "mean":
        return jnp.mean(d)
    if point_reduction == "sum":
        return jnp.sum(d)
    return jnp.min(d)
