"""Per-sim-step video recording (reference rlbench/recorder.py:11-81):
static / circling / attached camera motions + cv2 avi writer, driven by the
scene step callback."""
from __future__ import annotations

import os
from abc import ABC, abstractmethod

import numpy as np


class CameraMotion(ABC):
    def __init__(self, cam):
        self.cam = cam

    @abstractmethod
    def step(self):
        ...

    def save_pose(self):
        self.pose = self.cam.get_pose()

    def restore_pose(self):
        self.cam.set_pose(self.pose)


class CircleCameraMotion(CameraMotion):
    def __init__(self, cam, origin, speed):
        super().__init__(cam)
        self.origin = origin
        self.speed = speed  # in radians

    def step(self):
        self.origin.rotate([0, 0, self.speed])


class StaticCameraMotion(CameraMotion):
    def step(self):
        pass


class AttachedCameraMotion(CameraMotion):
    def __init__(self, cam, parent_cam):
        super().__init__(cam)
        self.parent_cam = parent_cam

    def step(self):
        self.cam.set_pose(self.parent_cam.get_pose())


class TaskRecorder:
    def __init__(self, cams_motion, fps=30):
        self._cams_motion = cams_motion
        self._fps = fps
        self._snaps = {name: [] for name in cams_motion}

    def take_snap(self):
        for name, motion in self._cams_motion.items():
            motion.step()
            self._snaps[name].append(
                (motion.cam.capture_rgb() * 255.0).astype(np.uint8))

    def save(self, path):
        import cv2
        os.makedirs(path, exist_ok=True)
        for name, motion in self._cams_motion.items():
            frames = self._snaps[name]
            if not frames:
                continue
            h, w = frames[0].shape[:2]
            writer = cv2.VideoWriter(
                os.path.join(path, f"{name}.avi"),
                cv2.VideoWriter_fourcc(*"MJPG"), self._fps, (w, h))
            for frame in frames:
                writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
            writer.release()
        self._snaps = {name: [] for name in self._cams_motion}


def build_default_recorder(task, log_dir, task_str, variation, resolution,
                           include_robot_cameras, rotate_cam):
    """reference environments.py:261-293."""
    from pathlib import Path
    from pyrep.objects.dummy import Dummy
    from pyrep.objects.vision_sensor import VisionSensor

    cam_placeholder = Dummy("cam_cinematic_placeholder")
    cam = VisionSensor.create([resolution, resolution])
    cam.set_pose(cam_placeholder.get_pose())
    cam.set_parent(cam_placeholder)
    if rotate_cam:
        global_motion = CircleCameraMotion(
            cam, Dummy("cam_cinematic_base"), 0.005)
    else:
        global_motion = StaticCameraMotion(cam)
    cams_motion = {"global": global_motion}
    if include_robot_cameras:
        for name, attr in (("left", "_cam_over_shoulder_left"),
                           ("right", "_cam_over_shoulder_right"),
                           ("wrist", "_cam_wrist")):
            c = VisionSensor.create([resolution, resolution])
            cams_motion[name] = AttachedCameraMotion(
                c, getattr(task._scene, attr))
    recorder = TaskRecorder(cams_motion, fps=30)
    task._scene.register_step_callback(recorder.take_snap)
    video_log_dir = Path(log_dir) / "videos" / f"{task_str}+{variation}"
    os.makedirs(str(video_log_dir), exist_ok=True)
    return recorder, video_log_dir
