"""Retrying action executor (reference rlbench/environments.py:38-109).

Simulator-agnostic: works with any task object exposing
`step(action) -> (obs, reward, terminate)` where obs has `gripper_pose`.
Accept a pose when the EE lands within 5 cm (2 cm when the gripper state is
about to toggle); the gripper toggle itself is deferred until the pose is
reached.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


class Mover:
    def __init__(self, task, disabled: bool = False, max_tries: int = 1):
        self._task = task
        self._last_action: Optional[np.ndarray] = None
        self._step_id = 0
        self._max_tries = max_tries
        self._disabled = disabled

    def reset(self, ee_pose):
        self._last_action = np.asarray(ee_pose, np.float64)
        self._step_id = 0

    def __call__(self, action: np.ndarray, verbose=False):
        action = np.asarray(action, np.float64).copy()
        change_gripper = (
            (self._last_action[-1] > 0.5) != (action[-1] > 0.5))

        if self._disabled:
            return self._task.step(action)

        target = action.copy()
        if self._last_action is not None:
            action[7] = self._last_action[7]

        obs = None
        reward = 0
        terminate = None
        criteria = (False,)
        dist_pos = np.inf
        for try_id in range(self._max_tries):
            obs, reward, terminate = self._task.step(action)
            pos = obs.gripper_pose[:3]
            dist_pos = float(np.linalg.norm(target[:3] - pos))
            tol = 2e-2 if change_gripper else 5e-2
            criteria = (dist_pos < tol,)
            if all(criteria) or reward == 1:
                break
            if verbose:
                print(f"Too far away (pos: {dist_pos:.3f}, "
                      f"step: {self._step_id})... Retrying...")

        # execute the deferred gripper toggle once the pose is reached
        action = target
        if (not reward) and change_gripper and all(criteria):
            obs, reward, terminate = self._task.step(action)

        if not all(criteria) and verbose:
            print(f"Step {self._step_id} failure after {self._max_tries} "
                  f"tries (pos: {dist_pos:.3f})")

        self._step_id += 1
        self._last_action = action.copy()
        return obs, reward, terminate, []
