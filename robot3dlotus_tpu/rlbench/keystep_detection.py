"""RLBench keystep (waypoint) discovery heuristic
(reference utils/rlbench_keystep_detection.py:11-46): a frame is a keypoint
iff the gripper state changed, or the arm has stopped (near-zero joint
velocities sustained over a 4-frame buffer outside gripper-change frames), or
it is the final frame."""
from __future__ import annotations

import numpy as np


def _is_stopped(demo, i, obs, stopped_buffer, delta=0.1):
    next_is_not_final = i < (len(demo) - 2)
    gripper_state_no_change = i < (len(demo) - 2) and (
        obs.gripper_open == demo[i + 1].gripper_open
        and obs.gripper_open == demo[max(0, i - 1)].gripper_open
        and demo[max(0, i - 2)].gripper_open == demo[max(0, i - 1)].gripper_open
    )
    small_delta = np.allclose(obs.joint_velocities, 0, atol=delta)
    return (stopped_buffer <= 0 and small_delta
            and next_is_not_final and gripper_state_no_change)


def keypoint_discovery(demo, stopping_delta=0.1):
    episode_keypoints = []
    prev_gripper_open = demo[0].gripper_open
    stopped_buffer = 0
    for i, obs in enumerate(demo):
        stopped = _is_stopped(demo, i, obs, stopped_buffer, stopping_delta)
        stopped_buffer = 4 if stopped else stopped_buffer - 1
        # if change in gripper, or end of episode
        last = i == (len(demo) - 1)
        if i != 0 and (obs.gripper_open != prev_gripper_open or last or stopped):
            episode_keypoints.append(i)
        prev_gripper_open = obs.gripper_open
    if (len(episode_keypoints) > 1
            and episode_keypoints[-1] - 1 == episode_keypoints[-2]):
        episode_keypoints.pop(-2)
    return episode_keypoints
