"""Stage 3: keystep images -> workspace-cropped 1 cm voxel point clouds
(reference preprocess/gen_simple_policy_data.py:45-117).

Per keystep: merge cameras, crop to the robot workspace, voxel-downsample,
carry semantic masks when present, keep bbox/pose/action metadata. Output
layout matches the reference keysteps_bbox_pcd LMDB that KeystepDataset
consumes.

  python -m robot3dlotus_tpu.preprocess.gen_simple_policy_data \
      --input_dir data/keysteps_bbox/seed0 \
      --output_dir data/keysteps_bbox_pcd/seed0/voxel1cm \
      [--taskvar_file assets/taskvars_train.json]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ..configs.rlbench.constants import get_robot_workspace
from ..ops.voxel import voxelize_pcd_np
from ..utils.assets import resolve_asset
from ..train.datasets.store import open_store, open_output_store
from ..vlm.pipeline import remove_statistical_outliers_np


def voxelize_keystep_record(record, workspace, voxel_size=0.01,
                            cam_ids=None, real_robot=False):
    """One keystep record -> {xyz, rgb, (sem), bbox_info, pose_info,
    key_frameids, action} with per-step variable-length point lists
    (reference :60-115)."""
    rgb = np.asarray(record["rgb"])
    pc = np.asarray(record["pc"])
    if cam_ids is not None:
        rgb, pc = rgb[:, cam_ids], pc[:, cam_ids]
    sem = None
    for k in ("mask", "gt_masks"):
        if k in record:
            sem = np.asarray(record[k])
            if cam_ids is not None:
                sem = sem[:, cam_ids]
            break

    outs = {"xyz": [], "rgb": []}
    if sem is not None:
        outs["sem"] = []
    for key in ("bbox_info", "pose_info", "key_frameids", "action"):
        if key in record:
            outs[key] = record[key]

    for t in range(rgb.shape[0]):
        t_pc = pc[t].reshape(-1, 3)
        in_mask = (
            (t_pc[:, 0] > workspace["X_BBOX"][0]) &
            (t_pc[:, 0] < workspace["X_BBOX"][1]) &
            (t_pc[:, 1] > workspace["Y_BBOX"][0]) &
            (t_pc[:, 1] < workspace["Y_BBOX"][1]) &
            (t_pc[:, 2] > workspace["Z_BBOX"][0]) &
            (t_pc[:, 2] < workspace["Z_BBOX"][1]))
        if real_robot:
            in_mask &= t_pc[:, 2] > workspace["TABLE_HEIGHT"]
        t_pc = t_pc[in_mask]
        t_rgb = rgb[t].reshape(-1, 3)[in_mask]
        t_sem = sem[t].reshape(-1)[in_mask] if sem is not None else None

        t_pc, keep = voxelize_pcd_np(t_pc, voxel_size)
        t_rgb = t_rgb[keep]
        if t_sem is not None:
            t_sem = t_sem[keep]

        if real_robot and len(t_pc) > 0:
            # noisy real clouds: statistical outlier removal (reference :97-106)
            inlier = remove_statistical_outliers_np(
                t_pc, nb_neighbors=50, std_ratio=0.2)
            t_pc, t_rgb = t_pc[inlier], t_rgb[inlier]
            if t_sem is not None:
                t_sem = t_sem[inlier]

        outs["xyz"].append(t_pc.astype(np.float32))
        outs["rgb"].append(t_rgb.astype(np.uint8))
        if t_sem is not None:
            outs["sem"].append(t_sem.astype(np.int32))
    return outs


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--taskvar_file", default=None)
    parser.add_argument("--task", default=None)
    parser.add_argument("--variation_id", default=None, type=int)
    parser.add_argument("--voxel_size", type=float, default=0.01)
    parser.add_argument("--real_robot", action="store_true")
    parser.add_argument("--cam_ids", default=None, type=int, nargs="+")
    parser.add_argument("--output_format", default="auto",
                        choices=["auto", "lmdb", "msgpack"])
    args = parser.parse_args(argv)

    store = open_store(args.input_dir)
    if args.task is not None and args.variation_id is not None:
        taskvars = [f"{args.task}+{args.variation_id}"]
    elif args.taskvar_file:
        taskvars = json.load(open(resolve_asset(args.taskvar_file)))
    else:
        taskvars = store.taskvars()

    workspace = get_robot_workspace(real_robot=args.real_robot)
    out = open_output_store(args.output_dir, kind=args.output_format)
    for taskvar in taskvars:
        if os.path.exists(os.path.join(args.output_dir, taskvar)):
            continue  # resumable (reference :50-51)
        try:
            episodes = store.episodes(taskvar)
        except FileNotFoundError:
            print(taskvar, "not exists")
            continue
        for episode in episodes:
            rec = voxelize_keystep_record(
                store.get(taskvar, episode), workspace,
                voxel_size=args.voxel_size, cam_ids=args.cam_ids,
                real_robot=args.real_robot)
            out.put(taskvar, episode, rec)
    if hasattr(out, "close"):
        out.close()


if __name__ == "__main__":
    main()
