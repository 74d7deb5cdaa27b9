"""Stage 1 of the offline data chain: collect microstep demonstrations
(reference preprocess/generate_dataset_microsteps.py:49-296).

Requires the live CoppeliaSim/RLBench stack (imports are lazy so the module
is importable everywhere). Two modes, like the reference:
  * --live_demos: run the task's scripted demo policy;
  * replay: re-render demos from the saved low-dim states under
    --prev_state_dir (new cameras/resolutions without re-solving motions).
Demos are saved in RLBench's own dataset layout (per-camera PNG trees +
low_dim_obs.pkl) so every downstream consumer — including the original
reference code — can read them. Each episode retries up to 50 attempts
(reference :254-283).

  python -m robot3dlotus_tpu.preprocess.generate_microsteps \
      --save_path data/microsteps/seed0 --tasks push_button \
      --image_size 256 256 --renderer opengl [--live_demos]
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

EPISODE_FOLDER = "episode%d"
EPISODES_FOLDER = "episodes"
VARIATION_DESCRIPTIONS = "variation_descriptions.pkl"


def build_parser(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--save_path", required=True)
    parser.add_argument("--tasks", nargs="+", required=True)
    parser.add_argument("--image_size", type=int, nargs=2,
                        default=[256, 256])
    parser.add_argument("--renderer", default="opengl",
                        choices=["opengl", "opengl3"])
    parser.add_argument("--episodes_per_task", type=int, default=10)
    parser.add_argument("--variations", type=int, default=-1,
                        help="number of variations (-1 = all)")
    parser.add_argument("--offset", type=int, default=0)
    parser.add_argument("--max_len", type=int, default=500)
    parser.add_argument("--live_demos", action="store_true")
    parser.add_argument("--prev_state_dir", default="")
    return parser.parse_args(argv)


def _make_env(args):
    from rlbench import ObservationConfig
    from rlbench.action_modes.action_mode import MoveArmThenGripper
    from rlbench.action_modes.arm_action_modes import JointVelocity
    from rlbench.action_modes.gripper_action_modes import Discrete
    from rlbench.backend.utils import task_file_to_task_class
    from rlbench.environment import Environment

    obs_config = ObservationConfig()
    obs_config.set_all(True)
    for cam in (obs_config.left_shoulder_camera,
                obs_config.right_shoulder_camera,
                obs_config.overhead_camera, obs_config.wrist_camera,
                obs_config.front_camera):
        cam.image_size = tuple(args.image_size)
        cam.depth_in_meters = False
        cam.masks_as_one_channel = True
        cam.render_mode = _render_mode(args.renderer)

    env = Environment(
        action_mode=MoveArmThenGripper(JointVelocity(), Discrete()),
        dataset_root="" if args.live_demos else args.prev_state_dir,
        obs_config=obs_config, headless=True)
    env.launch()
    return env, task_file_to_task_class


def _render_mode(name):
    from pyrep.const import RenderMode
    return RenderMode.OPENGL if name == "opengl" else RenderMode.OPENGL3


def save_demo(demo, example_path):
    """RLBench dataset layout: per-camera rgb/depth/mask PNG trees +
    low_dim_obs.pkl with image fields nulled (reference :49-296)."""
    from PIL import Image
    from rlbench.backend import utils as rlbench_utils
    from rlbench.backend.const import DEPTH_SCALE

    cameras = ("left_shoulder", "right_shoulder", "overhead", "wrist",
               "front")
    for cam in cameras:
        for kind in ("rgb", "depth", "mask"):
            os.makedirs(os.path.join(example_path, f"{cam}_{kind}"),
                        exist_ok=True)

    for i, obs in enumerate(demo):
        for cam in cameras:
            rgb = getattr(obs, f"{cam}_rgb")
            depth = getattr(obs, f"{cam}_depth")
            mask = getattr(obs, f"{cam}_mask")
            Image.fromarray(rgb).save(
                os.path.join(example_path, f"{cam}_rgb", f"{i}.png"))
            rlbench_utils.float_array_to_rgb_image(
                depth, scale_factor=DEPTH_SCALE).save(
                os.path.join(example_path, f"{cam}_depth", f"{i}.png"))
            Image.fromarray((mask * 255).astype(np.uint8)).save(
                os.path.join(example_path, f"{cam}_mask", f"{i}.png"))
            for kind in ("rgb", "depth", "point_cloud", "mask"):
                setattr(obs, f"{cam}_{kind}", None)

    with open(os.path.join(example_path, "low_dim_obs.pkl"), "wb") as f:
        pickle.dump(demo, f)


def run(args):
    env, task_file_to_task_class = _make_env(args)
    for task_name in args.tasks:
        task_env = env.get_task(task_file_to_task_class(task_name))
        n_var = task_env.variation_count()
        if args.variations > 0:
            n_var = min(n_var, args.variations)
        for variation_id in range(args.offset, n_var):
            task_env.set_variation(variation_id)
            descriptions, _ = task_env.reset()
            variation_path = os.path.join(
                args.save_path, task_env.get_name(),
                f"variation{variation_id}")
            episodes_path = os.path.join(variation_path, EPISODES_FOLDER)
            os.makedirs(episodes_path, exist_ok=True)

            if args.live_demos:
                episode_ids = list(range(args.episodes_per_task))
            else:
                prev = os.path.join(args.prev_state_dir, task_env.get_name(),
                                    f"variation{variation_id}", "episodes")
                if not os.path.exists(prev):
                    print("taskvar", prev, "not exists")
                    continue
                episode_ids = sorted(
                    int(d[7:]) for d in os.listdir(prev)
                    if d.startswith("episode") and os.path.exists(
                        os.path.join(prev, d, "low_dim_obs.pkl")))

            for ex_idx in episode_ids:
                episode_path = os.path.join(
                    episodes_path, EPISODE_FOLDER % ex_idx)
                if os.path.exists(episode_path):
                    continue
                attempts = 50
                while attempts > 0:
                    try:
                        if args.live_demos:
                            (demo,) = task_env.get_demos(
                                amount=1, live_demos=True)
                        else:
                            (demo,) = task_env.get_demos(
                                amount=1, live_demos=False,
                                random_selection=False,
                                from_episode_number=ex_idx,
                                run_loaded_demo=True, load_images=False)
                    except Exception as e:
                        attempts -= 1
                        if attempts == 0:
                            print(f"Failed {task_env.get_name()} var "
                                  f"{variation_id} ep {ex_idx}: {e}")
                        continue
                    if len(demo) > args.max_len:
                        demo._observations = demo._observations[
                            :args.max_len]
                    save_demo(demo, episode_path)
                    with open(os.path.join(
                            episode_path, VARIATION_DESCRIPTIONS), "wb") as f:
                        pickle.dump(descriptions, f)
                    break
    env.shutdown()


if __name__ == "__main__":
    run(build_parser())
