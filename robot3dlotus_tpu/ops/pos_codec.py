"""Discretized per-axis position codec.

The 3D-LOTUS position head predicts, for every point and each axis c in
{x,y,z}, logits over `2*pos_bins` candidate offsets around that point:
candidate position = point_xyz[c] + (k - pos_bins) * pos_bin_size.

Reference semantics:
  * GT prob construction: genrobo3d/utils/action_position_utils.py:7-46
    ('plain' = uniform over candidates within 1 cm of the target; 'dist' =
    inverse-distance weighted, zeroed beyond 1 cm; robot points zeroed; if an
    axis has no support, fall back to the single nearest candidate).
  * decode: action_position_utils.py:48-114 ('max' = argmax candidate;
    'ens1' = sum probs over 5 mm voxel bins and take the best bin center).

TPU-first difference: the reference decodes on the host with numpy dicts
(simple_policy_ptv3.py:254-277 syncs device->host in the eval hot loop); here
decode is a fully traced jnp op (dense 5 mm scatter-add instead of a Python
defaultdict), so eval actions never leave the device.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ----------------------------- host (dataset) --------------------------------

def disc_pos_gt_prob_np(
    xyz, gt_pos, pos_bin_size=0.01, pos_bins=50, heatmap_type="plain",
    robot_point_idxs=None, support_radius=0.01,
):
    """Numpy GT prob: returns (3, npoints * pos_bins * 2) float32, rows sum to 1.

    xyz: (npoints, 3); gt_pos: (3,)
    """
    npoints = xyz.shape[0]
    shift = np.arange(-pos_bins, pos_bins, dtype=np.float32) * pos_bin_size
    # cands[n, c, b] = xyz[n, c] + shift[b]
    cands = xyz[:, :, None].astype(np.float32) + shift[None, None, :]
    dists = np.abs(np.asarray(gt_pos, np.float32)[None, :, None] - cands)

    if heatmap_type == "plain":
        prob = (dists < support_radius).astype(np.float32)
    else:  # 'dist'
        prob = 1.0 / np.maximum(dists, 1e-4)
        prob[dists > support_radius] = 0.0

    if robot_point_idxs is not None and len(robot_point_idxs) > 0:
        prob[np.asarray(robot_point_idxs)] = 0.0

    # (n, c, b) -> (c, n*b)
    prob = np.transpose(prob, (1, 0, 2)).reshape(3, npoints * pos_bins * 2)
    flat_dists = np.transpose(dists, (1, 0, 2)).reshape(3, -1)
    for c in range(3):
        if prob[c].sum() == 0:
            prob[c, np.argmin(flat_dists[c])] = 1.0
    prob = prob / prob.sum(-1, keepdims=True)
    return prob.astype(np.float32)


# ----------------------------- device (train) --------------------------------

def disc_pos_gt_prob_jnp(
    xyz, valid_mask, gt_pos, robot_mask=None, pos_bin_size=0.01, pos_bins=50,
    heatmap_type="dist", support_radius=0.01,
):
    """Device twin of disc_pos_gt_prob_np for ONE padded cloud.

    Building the (3, N*2*pos_bins) GT prob tensor on the host costs ~1.5 MB
    of H2D payload and the dominant per-sample numpy time in the loader
    (round-1 verdict item 3); the loader now ships only gt_pos (3 floats,
    already inside gt_actions) + a robot-point mask, and this op
    reconstructs the probs inside the jitted train step. Matches
    disc_pos_gt_prob_np bit-for-bit on valid rows (golden-tested); padded
    rows contribute zero probability.

    xyz: (N, 3) float; valid_mask: (N,) bool; gt_pos: (3,);
    robot_mask: (N,) bool (True = zeroed, reference
    action_position_utils.py:30-31) or None.
    Returns (3, N * 2 * pos_bins) float32 rows summing to 1.
    """
    N = xyz.shape[0]
    nb = 2 * pos_bins
    shift = (jnp.arange(nb, dtype=jnp.float32) - pos_bins) * pos_bin_size
    # cands[n, c, b]
    cands = xyz[:, :, None].astype(jnp.float32) + shift[None, None, :]
    dists = jnp.abs(jnp.asarray(gt_pos, jnp.float32)[None, :, None] - cands)

    if heatmap_type == "plain":
        prob = (dists < support_radius).astype(jnp.float32)
    else:  # 'dist'
        prob = 1.0 / jnp.maximum(dists, 1e-4)
        prob = jnp.where(dists > support_radius, 0.0, prob)

    keep = valid_mask
    if robot_mask is not None:
        keep = keep & ~robot_mask
    prob = jnp.where(keep[:, None, None], prob, 0.0)

    # (n, c, b) -> (c, n*b)
    prob = jnp.transpose(prob, (1, 0, 2)).reshape(3, N * nb)
    flat_dists = jnp.transpose(dists, (1, 0, 2)).reshape(3, N * nb)
    # zero-support fallback: nearest VALID candidate gets prob 1 (reference
    # :40-43; robot-zeroed rows still count as candidates there — only
    # padding is excluded)
    cand_valid = jnp.repeat(valid_mask, nb)[None, :]
    flat_dists = jnp.where(cand_valid, flat_dists, jnp.inf)
    fallback = jax.nn.one_hot(jnp.argmin(flat_dists, axis=-1), N * nb,
                              dtype=jnp.float32)
    total = jnp.sum(prob, axis=-1, keepdims=True)
    prob = jnp.where(total > 0, prob, fallback)
    return prob / jnp.sum(prob, axis=-1, keepdims=True)


# ----------------------------- device (eval) ---------------------------------

def best_pos_from_disc_logits(
    logits, xyz, mask=None, pos_bin_size=0.01, pos_bins=50, best="max",
    vote_voxel_size=0.005, vote_range=512,
):
    """Decode continuous position from per-point per-axis bin logits, on device.

    Args:
      logits: (3, N, 2*pos_bins) float — raw logits (softmax applied inside
        over all N*2*pos_bins candidates per axis, matching reference
        simple_policy_ptv3.py:259-261).
      xyz: (N, 3) float point coordinates (normalized model space).
      mask: (N,) bool or None — invalid points excluded from the softmax.
      best: 'max' | 'ens1'.
    Returns: (3,) float32.
    """
    nbins = 2 * pos_bins
    shift = (jnp.arange(nbins, dtype=jnp.float32) - pos_bins) * pos_bin_size
    # cands[c, n, b]
    cands = xyz.T[:, :, None] + shift[None, None, :]

    flat_logits = logits.reshape(3, -1)
    if mask is not None:
        m = jnp.repeat(mask, nbins)[None, :]
        flat_logits = jnp.where(m, flat_logits, -1e9)
    prob = _softmax(flat_logits)

    flat_cands = cands.reshape(3, -1)
    if best == "max":
        idx = jnp.argmax(prob, axis=-1)
        return jnp.take_along_axis(flat_cands, idx[:, None], axis=-1)[:, 0]

    # 'ens1': accumulate probs over 5 mm voxel ids, pick best voxel center.
    vox = jnp.round(flat_cands / vote_voxel_size).astype(jnp.int32) + vote_range
    vox = jnp.clip(vox, 0, 2 * vote_range - 1)
    acc = jnp.zeros((3, 2 * vote_range), jnp.float32)
    acc = acc.at[jnp.arange(3)[:, None], vox].add(prob)
    best_vox = jnp.argmax(acc, axis=-1)
    return (best_vox.astype(jnp.float32) - vote_range) * vote_voxel_size


def _softmax(x):
    x = x - jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x)
    return e / jnp.sum(e, axis=-1, keepdims=True)
