"""RLBench environment adapter (reference rlbench/environments.py:112-518).

Host-side simulator glue: observation extraction into the framework's
obs-dict schema, demo fetching, camera randomization, and the closed-loop
`evaluate()` driver built on Mover. RLBench/PyRep/CoppeliaSim are imported
lazily so the rest of the framework (training, offline eval, serving) works
without a simulator install; constructing RLBenchEnv without them raises a
clear error.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from .mover import Mover

CAMERA_ATTR = {
    "front": "_cam_front",
    "wrist": "_cam_wrist",
    "left_shoulder": "_cam_over_shoulder_left",
    "right_shoulder": "_cam_over_shoulder_right",
}


def _require_rlbench():
    try:
        import rlbench  # noqa: F401
        import pyrep  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "RLBench/PyRep/CoppeliaSim are not installed in this environment; "
            "closed-loop simulation requires the reference's simulator stack "
            "(INSTALL.md). Offline training/eval and the HTTP policy server "
            "do not need it.") from e


class RLBenchEnv:
    def __init__(
        self, data_path="", apply_rgb=False, apply_depth=False,
        apply_pc=False, apply_mask=False, headless=False,
        apply_cameras=("left_shoulder", "right_shoulder", "wrist", "front"),
        image_size=(128, 128), cam_rand_factor=0.0,
    ):
        _require_rlbench()
        from rlbench.action_modes.action_mode import MoveArmThenGripper
        from rlbench.action_modes.arm_action_modes import (
            EndEffectorPoseViaPlanning,
        )
        from rlbench.action_modes.gripper_action_modes import Discrete
        from rlbench.environment import Environment

        self.data_path = data_path
        self.apply_rgb = apply_rgb
        self.apply_depth = apply_depth
        self.apply_pc = apply_pc
        self.apply_mask = apply_mask
        self.apply_cameras = apply_cameras
        self.image_size = list(image_size)
        self.cam_rand_factor = cam_rand_factor

        self.obs_config = self.create_obs_config(
            apply_rgb, apply_depth, apply_pc, apply_mask, apply_cameras,
            self.image_size)
        self.action_mode = MoveArmThenGripper(
            arm_action_mode=EndEffectorPoseViaPlanning(
                collision_checking=False),
            gripper_action_mode=Discrete(),
        )
        self.env = Environment(
            self.action_mode, str(data_path), self.obs_config,
            headless=headless)
        self.cam_info = None

    # -- observation extraction (reference :152-213) ----------------------- #
    def get_observation(self, obs):
        state_dict = {"rgb": [], "depth": [], "pc": [], "arm_links_info": None}
        if self.apply_mask:
            state_dict["gt_mask"] = []

        arm_bboxes, arm_poses = {}, {}
        for k, v in obs.misc.items():
            if k.startswith("Panda_"):
                if k.endswith("_bbox"):
                    arm_bboxes[k] = np.array(v)
                if k.endswith("_pose"):
                    arm_poses[k] = np.array(v)
        state_dict["arm_links_info"] = (arm_bboxes, arm_poses)

        for cam in self.apply_cameras:
            if self.apply_rgb:
                state_dict["rgb"].append(getattr(obs, f"{cam}_rgb"))
            if self.apply_depth:
                state_dict["depth"].append(getattr(obs, f"{cam}_depth"))
            if self.apply_pc:
                state_dict["pc"].append(getattr(obs, f"{cam}_point_cloud"))
            if self.apply_mask:
                mask = getattr(obs, f"{cam}_mask")
                if mask.ndim == 2:
                    state_dict["gt_mask"].append(mask)
                else:
                    from rlbench.backend.utils import rgb_handles_to_mask
                    state_dict["gt_mask"].append(
                        rgb_handles_to_mask(mask).astype(np.uint8))

        for key in ["rgb", "depth", "pc", "gt_mask"]:
            if key in state_dict and len(state_dict[key]) > 0:
                state_dict[key] = np.stack(state_dict[key], 0)
        if self.apply_pc:
            state_dict["pc"] = state_dict["pc"].astype(np.float32)
        state_dict["gripper"] = np.concatenate(
            [obs.gripper_pose, [obs.gripper_open]]).astype(np.float32)
        return state_dict

    def get_demo(self, task_name, variation, episode_index, load_images=True):
        return self.env.get_demos(
            task_name=task_name, variation_number=variation, amount=1,
            from_episode_number=episode_index, random_selection=False,
            load_images=load_images)[0]

    # -- closed-loop evaluation (reference :233-422) ------------------------ #
    def evaluate(
        self, task_str, variation, max_episodes, num_demos, log_dir, actioner,
        max_tries=1, demos=None, demo_keys=None, save_image=False,
        record_video=False, include_robot_cameras=True,
        video_rotate_cam=False, video_resolution=480,
        return_detail_results=False, skip_demos=0,
    ):
        from rlbench.backend.utils import task_file_to_task_class
        from rlbench.backend.exceptions import InvalidActionError
        from pyrep.errors import IKError, ConfigurationPathError

        self.env.launch()
        task = self.env.get_task(task_file_to_task_class(task_str))
        task.set_variation(variation)
        for _ in range(skip_demos):
            task.reset()

        recorder = None
        if record_video:
            from .recorder import build_default_recorder
            recorder, video_log_dir = build_default_recorder(
                task, log_dir, task_str, variation, video_resolution,
                include_robot_cameras, video_rotate_cam)

        fetch_list = list(range(num_demos)) if demos is None else demos
        demo_keys = demo_keys or [f"episode{i}" for i in range(num_demos)]
        detail_results = {}
        success_rate = 0.0
        move = Mover(task, max_tries=max_tries)

        cur_demo_id = 0
        for demo_id, demo in zip(demo_keys, fetch_list):
            if isinstance(demo, int):
                instructions, obs = task.reset()
            else:
                instructions, obs = task.reset_to_demo(demo)
            self._maybe_randomize_cameras(task)

            reward = None
            obs_state_dict = self.get_observation(obs)
            move.reset(obs_state_dict["gripper"])

            # per-step camera images under log_dir/<task>/<demo>/camera_<i>/
            # (reference environments.py:355-367)
            ep_dir = None
            if log_dir is not None and save_image:
                ep_dir = os.path.join(str(log_dir), task_str, str(demo_id))
                os.makedirs(ep_dir, exist_ok=True)

            step_id = -1
            for step_id in range(max_episodes):
                if ep_dir is not None:
                    from PIL import Image
                    for cam_id, img in enumerate(obs_state_dict["rgb"]):
                        cam_dir = os.path.join(ep_dir, f"camera_{cam_id}")
                        os.makedirs(cam_dir, exist_ok=True)
                        Image.fromarray(np.asarray(img, np.uint8)).save(
                            os.path.join(cam_dir, f"{step_id}.png"))
                output = actioner.predict(
                    task_str=task_str, variation=variation, step_id=step_id,
                    obs_state_dict=obs_state_dict, episode_id=demo_id,
                    instructions=instructions)
                action = output["action"]
                if action is None:
                    break
                try:
                    obs, reward, terminate, _ = move(action, verbose=False)
                    obs_state_dict = self.get_observation(obs)
                    if reward == 1:
                        success_rate += 1 / num_demos
                        break
                    if terminate:
                        print("The episode has terminated!")
                except (IKError, ConfigurationPathError,
                        InvalidActionError) as e:
                    print(task_str, demo_id, step_id, e)
                    reward = 0
                    break

            cur_demo_id += 1
            print(task_str, "Variation", variation, "Demo", demo_id,
                  "Step", step_id + 1, "Reward", reward,
                  "Accumulated SR: %.2f" % (success_rate * 100))
            detail_results[demo_id] = reward
            if recorder is not None:
                recorder.save(str(video_log_dir / f"{demo_id}_SR{reward}"))

        self.env.shutdown()
        if return_detail_results:
            return success_rate, detail_results
        return success_rate

    def _maybe_randomize_cameras(self, task):
        """Camera pose jitter (reference :320-351)."""
        if not self.cam_rand_factor:
            return
        from scipy.spatial.transform import Rotation as R
        cams = {name: getattr(task._scene, CAMERA_ATTR[name])
                for name in self.apply_cameras if name != "wrist"}
        if self.cam_info is None:
            self.cam_info = {n: c.get_pose() for n, c in cams.items()}
        for name, cam in cams.items():
            pos_range = self.cam_rand_factor * 0.01
            rot_range = self.cam_rand_factor * 0.05
            d_pos = np.random.uniform(-pos_range, pos_range, 3)
            d_rot = np.random.uniform(-rot_range, rot_range, 3)
            orig = self.cam_info[name]
            euler = R.from_quat(orig[3:]).as_euler("xyz") + d_rot
            quat = R.from_euler("xyz", euler).as_quat()
            cam.set_pose(np.concatenate([orig[:3] + d_pos, quat]))

    def create_obs_config(self, apply_rgb, apply_depth, apply_pc, apply_mask,
                          apply_cameras, image_size, **kwargs):
        from rlbench.observation_config import ObservationConfig, CameraConfig
        from pyrep.const import RenderMode

        unused_cams = CameraConfig()
        unused_cams.set_all(False)
        used_cams = CameraConfig(
            rgb=apply_rgb, point_cloud=apply_pc, depth=apply_depth,
            mask=apply_mask, render_mode=RenderMode.OPENGL,
            image_size=image_size, **kwargs)
        cam_kwargs = {n: used_cams for n in apply_cameras}
        obs_config = ObservationConfig(
            front_camera=cam_kwargs.get("front", unused_cams),
            left_shoulder_camera=cam_kwargs.get("left_shoulder", unused_cams),
            right_shoulder_camera=cam_kwargs.get("right_shoulder", unused_cams),
            wrist_camera=cam_kwargs.get("wrist", unused_cams),
            overhead_camera=cam_kwargs.get("overhead", unused_cams),
            joint_forces=False, joint_positions=False, joint_velocities=True,
            task_low_dim_state=False, gripper_touch_forces=False,
            gripper_pose=True, gripper_open=True, gripper_matrix=True,
            gripper_joint_positions=True)
        for cam in ("left_shoulder_camera", "right_shoulder_camera",
                    "overhead_camera", "wrist_camera", "front_camera"):
            getattr(obs_config, cam).masks_as_one_channel = False
        return obs_config

    def get_task_meta_info(self, task):
        """Mask-id metadata for GT grounding (reference :476-518)."""
        from pyrep.const import ObjectType

        meta = {}
        arm_ids = [o.get_handle() for o in
                   task._robot.arm.get_objects_in_tree(exclude_base=False)]
        grip_ids = [o.get_handle() for o in
                    task._robot.gripper.get_objects_in_tree(exclude_base=False)]
        meta["arm_mask_ids"] = arm_ids
        meta["gripper_mask_ids"] = grip_ids
        meta["obj_mask_ids"] = [
            o.get_handle() for o in
            task._task.get_base().get_objects_in_tree(exclude_base=False)]
        meta["scene_objs"] = []
        for obj in task._task.get_base().get_objects_in_tree(
                object_type=ObjectType.SHAPE, exclude_base=False,
                first_generation_only=False):
            meta["scene_objs"].append({
                "id": obj.get_handle(), "name": obj.get_name(),
                "children": [{"id": c.get_handle(), "name": c.get_name()}
                             for c in obj.get_objects_in_tree()],
            })
        return meta
