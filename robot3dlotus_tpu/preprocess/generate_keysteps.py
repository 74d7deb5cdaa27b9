"""Stage 2 of the offline data chain: microsteps -> keystep LMDB
(reference preprocess/generate_dataset_keysteps.py:38-149).

Runs keypoint_discovery over each demo, stacks rgb/pc/depth/(mask) and arm
link bbox/pose info at the keyframes, records the gripper action per keystep
and the gripper's image-plane projection per camera, and writes one record
per episode into the keystep store (LMDB layout identical to the reference).

Two input modes:
  * RLBench microstep directories (reference path) when the simulator stack
    is importable — demos are re-parsed via RLBenchEnv.get_demo;
  * a recorded microstep episode store (array records with per-frame
    rgb/pc/gripper/joint_velocities/gripper_open + bbox/pose info), which
    needs no simulator at all.

  python -m robot3dlotus_tpu.preprocess.generate_keysteps \
      --microstep_data_dir ... --keystep_data_dir ... \
      --task push_button --variation_id 0
"""
from __future__ import annotations

import argparse
import collections
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from ..rlbench.keystep_detection import keypoint_discovery
from ..rlbench.coord_transforms import world_to_image
from ..train.datasets.store import open_output_store

CAMERAS = ("left_shoulder", "right_shoulder", "wrist", "front")


@dataclass
class _FrameObs:
    gripper_open: float
    joint_velocities: np.ndarray


def microstep_record_to_demo(record) -> List[_FrameObs]:
    """Array-form microstep record -> frame list for keypoint_discovery."""
    opens = np.asarray(record["gripper_open"]).reshape(-1)
    vels = np.asarray(record["joint_velocities"])
    return [_FrameObs(float(opens[t]), vels[t]) for t in range(len(opens))]


def select_keysteps(demo, task_str: str) -> List[int]:
    """keypoint_discovery + the reference's tower3 hack + frame 0
    (reference :41-50)."""
    key_frames = keypoint_discovery(demo)
    if task_str == "tower3":
        key_frames = [k for i, k in enumerate(key_frames)
                      if i % 6 in (1, 4)]
    key_frames.insert(0, 0)
    return key_frames


def keysteps_from_microstep_record(record, task_str: str,
                                   cameras=CAMERAS) -> Dict:
    """One microstep episode record -> one keystep record with the exact
    reference field layout (:129-147)."""
    demo = microstep_record_to_demo(record)
    key_frameids = select_keysteps(demo, task_str)

    def stack(key):
        arr = np.asarray(record[key])
        return arr[key_frameids]

    outs = {
        "key_frameids": np.asarray(key_frameids),
        "rgb": stack("rgb"),                       # (T, N_cam, H, W, 3)
        "pc": stack("pc"),
        "action": np.asarray(record["gripper"])[key_frameids],  # (T, 8)
        "bbox_info": {k: np.asarray(v)[key_frameids]
                      for k, v in record["bbox_info"].items()},
        "pose_info": {k: np.asarray(v)[key_frameids]
                      for k, v in record["pose_info"].items()},
    }
    if "depth" in record:
        outs["depth"] = stack("depth")
    if "mask" in record:
        outs["mask"] = stack("mask")

    # gripper image-plane projections per camera (reference :113-121)
    cam_info = record.get("camera_info")
    gripper_pose = []
    for t, f in enumerate(key_frameids):
        per_cam = {}
        if cam_info is not None:
            for ci, cam in enumerate(cameras):
                extr = np.asarray(cam_info[f"{cam}_extrinsics"])[f]
                intr = np.asarray(cam_info[f"{cam}_intrinsics"])[f]
                vu = world_to_image(
                    np.asarray(record["gripper"])[f, :3][None], extr, intr)[0]
                per_cam[cam] = (int(vu[1]), int(vu[0]))
        gripper_pose.append(per_cam)
    outs["gripper_pose"] = gripper_pose
    return outs


def keysteps_from_rlbench(env, task_str, variation, episode,
                          cameras=CAMERAS) -> Dict:
    """Reference path: parse a recorded RLBench demo via the live stack
    (reference get_observation, :38-74)."""
    demo = env.get_demo(task_str, variation, episode)
    key_frames = select_keysteps(demo, task_str)

    state_dict_ls = collections.defaultdict(list)
    for f in key_frames:
        state_dict = env.get_observation(demo._observations[f])
        for k, v in state_dict.items():
            if len(v) == 0:
                continue
            if k == "arm_links_info":
                for part in state_dict[k]:
                    for name, value in part.items():
                        state_dict_ls[name].append(value)
            else:
                state_dict_ls[k].append(v)
    state_dict_ls = {k: np.stack(v, 0) for k, v in state_dict_ls.items()}

    action_ls = state_dict_ls.pop("gripper")
    from ..rlbench.coord_transforms import convert_gripper_pose_world_to_image
    gripper_pose = [
        {cam: convert_gripper_pose_world_to_image(
            demo._observations[f], cam) for cam in cameras}
        for f in key_frames
    ]
    outs = {
        "key_frameids": np.asarray(key_frames),
        "rgb": state_dict_ls["rgb"],
        "pc": state_dict_ls["pc"],
        "action": action_ls,
        "gripper_pose": gripper_pose,
        "bbox_info": {k: v for k, v in state_dict_ls.items() if "bbox" in k},
        "pose_info": {k: v for k, v in state_dict_ls.items() if "pose" in k},
    }
    if "depth" in state_dict_ls:
        outs["depth"] = state_dict_ls["depth"]
    if "gt_mask" in state_dict_ls:
        outs["mask"] = state_dict_ls["gt_mask"]
    return outs


def generate_keystep_dataset(args):
    taskvar = f"{args.task}+{args.variation_id}"
    out = open_output_store(args.keystep_data_dir, kind=args.output_format)

    try:
        from ..rlbench.environments import RLBenchEnv
        env = RLBenchEnv(
            data_path=args.microstep_data_dir, apply_rgb=True,
            apply_depth=True, apply_pc=True, apply_mask=args.save_masks,
            apply_cameras=list(args.cameras),
            image_size=[args.image_size, args.image_size])
        sim_ok = True
    except Exception:
        env, sim_ok = None, False

    if sim_ok:
        import glob
        import os
        episodes_dir = os.path.join(
            args.microstep_data_dir, args.task,
            f"variation{args.variation_id}", "episodes")
        for ep in sorted(glob.glob(os.path.join(episodes_dir, "episode*"))):
            episode = int(os.path.basename(ep)[7:])
            try:
                rec = keysteps_from_rlbench(
                    env, args.task, args.variation_id, episode,
                    cameras=args.cameras)
            except (FileNotFoundError, RuntimeError, IndexError) as e:
                print(e)
                continue
            out.put(taskvar, f"episode{episode}", rec)
    else:
        # recorded microstep store (simulator-free)
        from ..train.datasets.store import open_store
        store = open_store(args.microstep_data_dir)
        for episode in store.episodes(taskvar):
            rec = keysteps_from_microstep_record(
                store.get(taskvar, episode), args.task,
                cameras=args.cameras)
            out.put(taskvar, episode, rec)
    if hasattr(out, "close"):
        out.close()


def build_parser(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--microstep_data_dir", required=True)
    parser.add_argument("--keystep_data_dir", required=True)
    parser.add_argument("--task", required=True)
    parser.add_argument("--variation_id", required=True, type=int)
    parser.add_argument("--cameras", nargs="+", choices=list(CAMERAS),
                        default=list(CAMERAS))
    parser.add_argument("--save_masks", action="store_true")
    parser.add_argument("--image_size", type=int, default=128)
    parser.add_argument("--output_format", default="auto",
                        choices=["auto", "lmdb", "msgpack"])
    return parser.parse_args(argv)


if __name__ == "__main__":
    generate_keystep_dataset(build_parser())
