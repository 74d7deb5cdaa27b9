"""Camera coordinate transforms (reference rlbench/coord_transforms.py:11-103).

Gripper/world -> image projections used by the microstep/keystep
preprocessing. Host-side numpy (the reference's batched torch variant is a
plain matmul; no accelerator needed at data-generation time).
"""
from __future__ import annotations

import json
from typing import Dict, List, Sequence, Tuple

import numpy as np
from scipy.spatial.transform import Rotation as R


def world_to_image(points, extrinsics_44, intrinsics_33, return_float=False):
    """points: (N, 3) world coords -> (N, 2) [v, u] image coords
    (image[v, u] is the point; reference :11-32 single-point variant)."""
    points = np.asarray(points, np.float32).reshape(-1, 3)
    w2c = np.linalg.inv(np.asarray(extrinsics_44, np.float32))
    intr = np.concatenate(
        [np.asarray(intrinsics_33, np.float32), np.zeros((3, 1), np.float32)],
        axis=1)
    hom = np.concatenate(
        [points, np.ones((len(points), 1), np.float32)], axis=1)
    proj = (intr @ (w2c @ hom.T))  # (3, N)
    u = proj[0] / proj[2]
    v = proj[1] / proj[2]
    if not return_float:
        u = np.round(u).astype(np.int64)
        v = np.round(v).astype(np.int64)
    return np.stack([v, u], axis=1)


def convert_gripper_pose_world_to_image(obs, camera: str) -> Tuple[int, int]:
    """RLBench Observation -> (u, v) pixel of the gripper in `camera`
    (reference :11-32; returns (u, v) like the reference)."""
    vu = world_to_image(
        obs.gripper_pose[:3][None],
        obs.misc[f"{camera}_camera_extrinsics"],
        obs.misc[f"{camera}_camera_intrinsics"])[0]
    return int(vu[1]), int(vu[0])


class PointWorld2Image:
    """Batched world->image projection from a dumped camera-parameter file
    (reference :34-83), numpy formulation."""

    def __init__(self, camera_param_file: str):
        params = json.load(open(camera_param_file))
        self.camera_params = {
            k: (np.asarray(v, np.float32) if isinstance(v, list) else v)
            for k, v in params.items()}
        self.cameras = sorted(
            "_".join(k.split("_")[:-2])
            for k in self.camera_params if k.endswith("_extrinsics"))
        self.camera_transform: Dict[str, np.ndarray] = {}
        for camera in self.cameras:
            w2c = np.linalg.inv(
                self.camera_params[f"{camera}_camera_extrinsics"])
            intr = np.concatenate([
                self.camera_params[f"{camera}_camera_intrinsics"],
                np.zeros((3, 1), np.float32)], axis=1)
            self.camera_transform[camera] = intr @ w2c

    def __call__(self, cameras: Sequence[str], points, return_float=False
                 ) -> List[np.ndarray]:
        """points: (B, 3, N) -> per camera (B, 2, N) [v, u]."""
        points = np.asarray(points, np.float32)
        B, _, N = points.shape
        flat = points.transpose(1, 0, 2).reshape(3, B * N)
        hom = np.concatenate([flat, np.ones((1, B * N), np.float32)], axis=0)
        outs = []
        for camera in cameras:
            proj = self.camera_transform[camera] @ hom
            u = proj[0] / proj[2]
            v = proj[1] / proj[2]
            if not return_float:
                u = np.round(u).astype(np.int64)
                v = np.round(v).astype(np.int64)
            outs.append(np.stack(
                [v.reshape(B, N), u.reshape(B, N)], axis=1))
        return outs


def quaternion_to_discrete_euler(quaternion, resolution: int):
    euler = R.from_quat(quaternion).as_euler("xyz", degrees=True) + 180
    assert np.min(euler) >= 0 and np.max(euler) <= 360
    disc = np.around(euler / resolution).astype(int)
    disc[disc == int(360 / resolution)] = 0
    return disc


def discrete_euler_to_quaternion(discrete_euler, resolution: int):
    euler = (np.asarray(discrete_euler) * resolution) - 180
    return R.from_euler("xyz", euler, degrees=True).as_quat()
