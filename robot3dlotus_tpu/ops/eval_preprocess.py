"""Fused on-device eval preprocessing: raw multi-camera cloud -> action in
ONE jitted program (round-1 verdict item 2).

The reference runs the whole obs->model-input chain on the host per step
(evaluation/eval_simple_policy.py:151-251: workspace crop, 1 cm voxel
downsample with trace, robot-box removal, <=num_points sampling,
center/normalize) and only then calls the model. Here the same chain is
expressed as static-shape jnp ops so it fuses with the forward + decode:

  raw (R, 3) padded cloud
    -> workspace/table mask                      (compares)
    -> voxelize_fixed_jnp                        (sort + segment ops)
    -> robot OBB removal                         (one (V, 3K) gemm)
    -> random <=num_points subsample             (masked argsort of keys)
    -> center/normalize + feature assembly
    -> policy forward -> decode -> un-normalize + table clamp

Host work per step shrinks to stacking the camera buffers and the ~11
link-box parameters. Whether this wins depends on the host<->device link:
shipping the raw cloud costs R*24 bytes of H2D versus the host preprocess
CPU time (bench.py reports the decomposition for both modes).
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from .voxel import voxelize_fixed_jnp


def obb_params_disabled() -> Dict[str, np.ndarray]:
    """OBB parameters that remove nothing: NEGATIVE half extents make
    |local| <= half false on every axis. (All-zero parameters would do the
    opposite — |p@0 - 0| <= 0 holds everywhere, removing EVERY point.)"""
    return {
        "obb_rot": np.zeros((3, 3), np.float32),
        "obb_off": np.zeros(3, np.float32),
        "obb_half": np.full(3, -1.0, np.float32),
    }


def obb_params_np(box) -> Dict[str, np.ndarray]:
    """RobotBox -> stacked OBB test parameters for the device:
    point p is inside box k iff |p @ rot_cat[:, 3k:3k+3] - off[3k:3k+3]|
    <= half[3k:3k+3] on every axis (utils/robot_box.py:76-99). A box list
    that resolved to zero links (the host path's point_mask returns
    all-False for it) degrades to the remove-nothing parameters."""
    if not box.boxes:
        return obb_params_disabled()
    rot_cat, off, half = box._stack()[:3]
    return {
        "obb_rot": np.ascontiguousarray(rot_cat, np.float32),   # (3, 3K)
        "obb_off": np.ascontiguousarray(off, np.float32),       # (3K,)
        "obb_half": np.ascontiguousarray(half, np.float32),     # (3K,)
    }


def device_preprocess(
    xyz_raw, rgb_raw, raw_valid, obb_rot, obb_off, obb_half, ee_pose,
    sample_key, *, workspace, num_points, voxel_size=0.01, vox_capacity=8192,
    rm_table=True, rm_robot=True, xyz_shift="center", xyz_norm=False,
    use_height=True,
):
    """One observation -> (pc_fts (N, C), mask (N,), count, centroid, radius,
    ee_pose_normalized). All shapes static; traced under jit.

    xyz_raw/rgb_raw: (R, 3) float32 (rgb in 0..255); raw_valid: (R,) bool.
    obb_*: stacked robot link boxes (obb_params_np); pass NEGATIVE half
    extents (obb_params_disabled) or rm_robot=False to disable removal —
    zero half extents would remove everything (|p@0 - 0| <= 0 is true).
    """
    ws = workspace
    m = (
        (xyz_raw[:, 0] > ws["X_BBOX"][0]) & (xyz_raw[:, 0] < ws["X_BBOX"][1])
        & (xyz_raw[:, 1] > ws["Y_BBOX"][0]) & (xyz_raw[:, 1] < ws["Y_BBOX"][1])
        & (xyz_raw[:, 2] > ws["Z_BBOX"][0]) & (xyz_raw[:, 2] < ws["Z_BBOX"][1])
        & raw_valid
    )
    if rm_table:
        m = m & (xyz_raw[:, 2] > ws["TABLE_HEIGHT"])

    vox_xyz, vmask, first, vox_overflow = voxelize_fixed_jnp(
        xyz_raw, m, voxel_size, vox_capacity)
    vox_rgb = jnp.take(rgb_raw, first, axis=0)

    keep = vmask
    if rm_robot:
        local = vox_xyz @ obb_rot - obb_off            # (V, 3K)
        inside = (jnp.abs(local) <= obb_half).reshape(
            vox_xyz.shape[0], -1, 3).all(-1).any(-1)
        keep = keep & ~inside

    # random subsample to num_points without replacement: smallest random
    # keys among kept voxels win (== np.random.choice(replace=False)); when
    # fewer than num_points survive, all of them are taken (the reference
    # only subsamples when len > num_points, eval_simple_policy.py:210-225)
    r = jax.random.uniform(sample_key, (vox_xyz.shape[0],))
    r = jnp.where(keep, r, jnp.inf)
    order = jnp.argsort(r)[:num_points]
    xyz = jnp.take(vox_xyz, order, axis=0)             # (N, 3)
    rgb = jnp.take(vox_rgb, order, axis=0)
    mask = jnp.take(keep, order, axis=0)
    count = jnp.sum(mask.astype(jnp.int32))

    height = xyz[:, 2] - ws["TABLE_HEIGHT"]

    if xyz_shift == "none":
        centroid = jnp.zeros(3, jnp.float32)
    elif xyz_shift == "center":
        mf = mask[:, None].astype(jnp.float32)
        centroid = jnp.sum(xyz * mf, axis=0) / jnp.maximum(jnp.sum(mf), 1.0)
    else:  # gripper
        centroid = ee_pose[:3]
    if xyz_norm:
        d = jnp.linalg.norm(xyz - centroid, axis=1)
        radius = jnp.max(jnp.where(mask, d, 0.0))
        radius = jnp.maximum(radius, 1e-6)
    else:
        radius = jnp.float32(1.0)

    xyz_n = (xyz - centroid) / radius
    height = height / radius
    ee = ee_pose.at[:3].set((ee_pose[:3] - centroid) / radius)
    feats = [xyz_n, (rgb / 255.0) * 2.0 - 1.0]
    if use_height:
        feats.append(height[:, None])
    pc_ft = jnp.concatenate(feats, axis=1)
    pc_ft = jnp.where(mask[:, None], pc_ft, 0.0)
    return pc_ft, mask, count, centroid, radius, ee, vox_overflow


def make_obs_to_action(model, act_cfg, data_cfg,
                       workspace, num_points, vox_capacity=8192):
    """Build the fused obs->action jitted callable.

    Returns fn(variables, xyz_raw (R,3), rgb_raw (R,3), n_raw (),
    obb_vec (15K,), txt_embeds, txt_mask, step_ee_key (10,))
    -> one packed (10,) float32 vector [action (8) | count | vox_overflow]
    so the caller pays ONE device->host fetch per step, not three.

    Per-call inputs likewise ride FEW transfers (each one pays link
    latency — ~1 ms RPC on a tunneled device, ~20 us over PCIe): the raw
    validity mask is derived on device from the scalar n_raw, the K robot
    link boxes arrive as one packed vector (obb_rot.ravel() | obb_off |
    obb_half, K = len//15), and step_ee_key packs [step_id, ee_pose(8),
    key_seed]. Text embeddings should be device-staged by the caller
    (Actioner._staged_txt).

    The action is FINAL: position un-normalized + table-clamped,
    quaternion, raw open logit (the caller thresholds; reference
    eval_simple_policy.py:339-341). `count` lets the caller apply the host
    path's empty/tiny-cloud guard (actioner.py predict), and a nonzero
    `vox_overflow` means a spatially contiguous region was dropped by the
    fixed-capacity voxelizer — surface it, don't ignore it.
    """
    from ..models.simple_policy import decode_actions

    if vox_capacity < num_points:
        raise ValueError(
            f"vox_capacity ({vox_capacity}) < num_points ({num_points}): "
            "the subsample stage would silently emit fewer rows than the "
            "model was trained with — raise ROBOT3DLOTUS_VOX_CAPACITY")

    voxel_size = float(act_cfg.get("voxel_size", 0.01))
    rm_table = bool(data_cfg.get("rm_table", True))
    rm_robot = str(data_cfg.get("rm_robot", "none")).startswith("box")
    xyz_shift = data_cfg.get("xyz_shift", "center")
    xyz_norm = bool(data_cfg.get("xyz_norm", False))
    use_height = bool(data_cfg.get("use_height", True))
    table_h = float(workspace["TABLE_HEIGHT"])
    ws = {k: (tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else
              float(v)) for k, v in workspace.items()}

    @jax.jit
    def fn(variables, xyz_raw, rgb_raw, n_raw, obb_vec, txt_embeds,
           txt_mask, step_ee_key):
        raw_valid = jnp.arange(xyz_raw.shape[0]) < n_raw
        k3 = obb_vec.shape[0] // 15 * 3
        obb_rot = obb_vec[:3 * k3].reshape(3, k3)
        obb_off = obb_vec[3 * k3:4 * k3]
        obb_half = obb_vec[4 * k3:5 * k3]
        step_id = step_ee_key[0].astype(jnp.int32)
        ee_pose = step_ee_key[1:9]
        sample_key = jax.random.PRNGKey(step_ee_key[9].astype(jnp.uint32))
        pc_ft, mask, count, centroid, radius, ee, vox_overflow = \
            device_preprocess(
                xyz_raw, rgb_raw, raw_valid, obb_rot, obb_off, obb_half,
                ee_pose, sample_key,
                workspace=ws, num_points=num_points, voxel_size=voxel_size,
                vox_capacity=vox_capacity, rm_table=rm_table,
                rm_robot=rm_robot, xyz_shift=xyz_shift, xyz_norm=xyz_norm,
                use_height=use_height)
        batch = {
            "pc_fts": pc_ft[None], "pc_mask": mask[None],
            "pc_counts": count[None],
            "txt_embeds": txt_embeds[None], "txt_mask": txt_mask[None],
            "ee_poses": ee[None],
            "step_ids": step_id[None],
        }
        preds = model.apply(variables, batch, deterministic=True)
        action = decode_actions(preds, act_cfg)[0]         # (8,)
        pos = action[:3] * radius + centroid
        pos = pos.at[2].set(jnp.maximum(pos[2], table_h + 0.005))
        return jnp.concatenate([
            pos, action[3:],
            count.astype(jnp.float32)[None],
            vox_overflow.astype(jnp.float32)[None]])

    return fn
