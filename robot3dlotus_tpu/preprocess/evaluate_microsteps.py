"""Microstep replay validator (reference
preprocess/evaluate_rlbench_microsteps.py:43-122): replay each demo's
recorded gripper poses through the simulator and record the achievable
success rate per taskvar — a data-quality fixture for the motion planner
("can the demos even be executed open-loop?").

The actioner itself is simulator-free (it only reads recorded actions), so it
also runs against the ReplayEnv for tests; the full validator needs RLBench.

  python -m robot3dlotus_tpu.preprocess.evaluate_microsteps \
      --microstep_data_dir data/microsteps/seed0
"""
from __future__ import annotations

import argparse
import glob
import os
import pickle

import numpy as np

from ..eval.common import write_to_file


class MicrostepReplayActioner:
    """Returns the recorded next gripper pose at every step
    (reference MicrostepActioner, :43-65)."""

    def __init__(self, microstep_data_dir=None, store=None):
        self.microstep_data_dir = microstep_data_dir
        self.store = store
        self.actions = None

    def _load_actions(self, task_str, variation, episode_id):
        if self.store is not None:
            rec = self.store.get(f"{task_str}+{variation}",
                                 episode_id if isinstance(episode_id, str)
                                 else f"episode{episode_id}")
            return [np.asarray(a) for a in np.asarray(rec["action"])[1:]]
        path = os.path.join(
            self.microstep_data_dir, task_str, f"variation{variation}",
            "episodes", str(episode_id), "low_dim_obs.pkl")
        low_dim_obs = pickle.load(open(path, "rb"))
        return [np.hstack([x.gripper_pose, x.gripper_open])
                for x in low_dim_obs[1:]]

    def predict(self, task_str=None, variation=None, step_id=0,
                obs_state_dict=None, episode_id=None, instructions=None):
        if step_id == 0:
            self.actions = self._load_actions(task_str, variation, episode_id)
        if step_id < len(self.actions):
            return {"action": self.actions[step_id]}
        # RLBench's motion planner sometimes needs extra tries; zero action
        # fails the episode gracefully (reference :61-64)
        return {"action": np.zeros(8, np.float32)}


def evaluate_microsteps(args):
    from ..rlbench.environments import RLBenchEnv

    env = RLBenchEnv(
        data_path=args.microstep_data_dir, apply_rgb=True, apply_pc=True,
        apply_cameras=args.cameras, headless=True)
    actioner = MicrostepReplayActioner(args.microstep_data_dir)
    result_file = os.path.join(args.microstep_data_dir, "taskvar_srs.jsonl")

    for taskvar_dir in glob.glob(f"{args.microstep_data_dir}/*/*"):
        task_str, variation = taskvar_dir.split("/")[-2:]
        variation = int(variation[len("variation"):])
        episode_dir = os.path.join(taskvar_dir, "episodes")
        episode_ids = sorted(os.listdir(episode_dir),
                             key=lambda ep: int(ep[7:]))
        demo_keys, demos = [], []
        for idx, ep in enumerate(episode_ids):
            try:
                demos.append(env.get_demo(task_str, variation, idx,
                                          load_images=False))
                demo_keys.append(f"episode{idx}")
            except Exception as e:
                print("\tProblem to load demo_id:", idx, ep, e)
        sr = env.evaluate(
            task_str, variation, max_episodes=args.max_steps,
            num_demos=len(demos), log_dir=None, actioner=actioner,
            demos=demos, demo_keys=demo_keys, max_tries=args.max_tries)
        print(f"{task_str}+{variation}", sr * 100)
        write_to_file(result_file,
                      {"taskvar": f"{task_str}+{variation}", "sr": sr})


def build_parser(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--microstep_data_dir", required=True)
    parser.add_argument("--cameras", nargs="+",
                        default=["left_shoulder", "right_shoulder", "wrist"])
    parser.add_argument("--max_tries", type=int, default=10)
    parser.add_argument("--max_steps", type=int, default=1000)
    return parser.parse_args(argv)


if __name__ == "__main__":
    evaluate_microsteps(build_parser())
