"""Stage 4: keystep clouds -> motion-planner micro-trajectory dataset
(reference preprocess/gen_motion_planner_data.py:21-151).

Re-segments each episode's keysteps via the task_new_keystep_ids map, builds
the future-action trajectory for every microstep (with optional gripper-open
separation at designated keysteps) plus is_new_keystep flags, and strips
table points. Output layout matches motion_keysteps_bbox_pcd that
MotionPlannerDataset consumes.

  python -m robot3dlotus_tpu.preprocess.gen_motion_planner_data \
      --old_keystep_pcd_dir ... --new_keystep_pcd_dir ... \
      [--keystep_ids_file assets/task_new_keystep_ids.json]
"""
from __future__ import annotations

import argparse
import copy
import json
import os

import numpy as np

from ..configs.rlbench.constants import get_robot_workspace
from ..utils.assets import resolve_asset
from ..train.datasets.store import open_store, open_output_store


def generate_action_trajectories(actions, new_keystep_ids,
                                 sep_open_keystep_ids=None):
    """Segment actions into per-new-keystep trajectories
    (reference :21-50). Returns (traj_ids, trajs, end_open_actions)."""
    actions = np.asarray(actions)
    num_steps = len(actions)
    sep_ids = set()
    if sep_open_keystep_ids is not None:
        for t in sep_open_keystep_ids:
            sep_ids.add(num_steps + t if t < 0 else t)

    traj_ids, trajs, end_open_actions = [], [], []
    for step_sidx, step_eidx in zip(new_keystep_ids[:-1],
                                    new_keystep_ids[1:]):
        if step_eidx == -1:
            step_eidx = num_steps - 1
        traj_ids.append(np.arange(step_sidx + 1, step_eidx + 1))
        traj = copy.deepcopy(actions[step_sidx + 1: step_eidx + 1])
        if step_eidx in sep_ids:
            # the gripper-open toggle is executed as a separate 'release'
            # micro-action: the trajectory keeps the previous openness
            if traj[-1][-1] != 1:
                print("last action is not open", traj[-1][-1])
            if actions[step_eidx - 1][-1] != 0:
                print("previous action is already open",
                      actions[step_eidx - 1][-1])
            traj[-1][-1] = actions[step_eidx - 1][-1]
            end_open_actions.append(True)
        else:
            end_open_actions.append(False)
        trajs.append(traj)
    return traj_ids, trajs, end_open_actions


def expand_action_trajectories(traj_ids, trajs, end_open_actions):
    """Every microstep gets its remaining future trajectory
    (reference :52-66)."""
    new_trajs, new_end_open, is_new_keystep = [], [], []
    for ids, traj, end_open in zip(traj_ids, trajs, end_open_actions):
        for i in range(len(ids)):
            new_trajs.append(traj[i:])
            new_end_open.append(end_open)
            is_new_keystep.append(i == 0)
    new_trajs.append([])
    new_end_open.append(False)
    is_new_keystep.append(False)
    return new_trajs, new_end_open, is_new_keystep


def resegment_episode(record, task_new_keystep_ids, task_num_keysteps=None,
                      sep_open_keystep_ids=None, table_height=None):
    """One keystep-pcd record -> motion-planner record, or None when the
    episode's keystep count is invalid (reference :104-147)."""
    if task_num_keysteps is not None and \
            len(record["key_frameids"]) not in task_num_keysteps:
        return None
    if "sem" not in record:
        raise ValueError(
            "keystep record has no semantic masks ('sem'); the motion "
            "planner needs them for pc_labels — regenerate keysteps with "
            "--save_masks and rerun gen_simple_policy_data")
    table_height = (get_robot_workspace()["TABLE_HEIGHT"]
                    if table_height is None else table_height)
    new_value = {
        "xyz": [], "rgb": [], "sem": [],
        "ee_pose": record["action"],
        "bbox_info": record["bbox_info"],
        "pose_info": record["pose_info"],
    }
    for t in range(len(record["key_frameids"])):
        xyz = np.asarray(record["xyz"][t])
        rgb = np.asarray(record["rgb"][t])
        sem = np.asarray(record["sem"][t])
        mask = xyz[:, 2] > table_height  # remove table points
        new_value["xyz"].append(xyz[mask])
        new_value["rgb"].append(rgb[mask])
        new_value["sem"].append(sem[mask])

    traj_ids, trajs, end_open = generate_action_trajectories(
        record["action"], task_new_keystep_ids, sep_open_keystep_ids)
    (new_value["trajs"], new_value["end_open_actions"],
     new_value["is_new_keystep"]) = expand_action_trajectories(
        traj_ids, trajs, end_open)
    assert len(new_value["trajs"]) == len(record["action"])
    return new_value


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--old_keystep_pcd_dir", required=True)
    parser.add_argument("--new_keystep_pcd_dir", required=True)
    parser.add_argument("--keystep_ids_file",
                        default="assets/task_new_keystep_ids.json")
    parser.add_argument("--taskvar_file",
                        default="assets/taskvars_train.json")
    parser.add_argument("--output_format", default="auto",
                        choices=["auto", "lmdb", "msgpack"])
    args = parser.parse_args(argv)

    meta = json.load(open(resolve_asset(args.keystep_ids_file)))
    old_num_keysteps = meta["old_num_keysteps"]
    new_keystep_ids = meta["new_keystep_ids"]
    sep_open = meta["separate_gripper_open_at_old_keystep"]
    taskvars = json.load(open(resolve_asset(args.taskvar_file)))

    store = open_store(args.old_keystep_pcd_dir)
    out = open_output_store(args.new_keystep_pcd_dir,
                            kind=args.output_format)
    for taskvar in taskvars:
        task = taskvar.split("+")[0]
        if os.path.exists(os.path.join(args.new_keystep_pcd_dir, taskvar)):
            print(taskvar, "existed!")
            continue
        num_invalid = 0
        for episode in store.episodes(taskvar):
            rec = resegment_episode(
                store.get(taskvar, episode), new_keystep_ids[task],
                task_num_keysteps=old_num_keysteps[task],
                sep_open_keystep_ids=sep_open.get(task))
            if rec is None:
                num_invalid += 1
                continue
            out.put(taskvar, episode, rec)
        print(taskvar, "#invalid episodes", num_invalid)
    if hasattr(out, "close"):
        out.close()


if __name__ == "__main__":
    main()
