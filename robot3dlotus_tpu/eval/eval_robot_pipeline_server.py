"""3D-LOTUS++ pipeline evaluation server CLI
(reference evaluation/eval_robot_pipeline_server.py:259-357).

  python -m robot3dlotus_tpu.eval.eval_robot_pipeline_server \
      --pipeline_config_file configs/rlbench/robot_pipeline.yaml \
      --mp_expr_dir experiments/gembench/3dlotusplus/v1 --mp_ckpt_step 140000 \
      --taskvar_file assets/taskvars_train.json [--env rlbench|replay]

The per-episode pipeline cache round-trips through the producer/consumer
queues (stateful=True). The prediction directory name encodes the oracle
modes, matching the reference layout (:283-289):
  preds[-llm_gt][-og_gt_<label_type>][-runstepN]/seed<S>/results.jsonl
"""
from __future__ import annotations

import argparse
import json
import os

import yaml

from ..utils.assets import resolve_asset
from .server import ReplayEnv, run_eval_server


def build_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pipeline_config_file", required=True)
    p.add_argument("--mp_expr_dir", default=None)
    p.add_argument("--mp_ckpt_step", type=int, default=None)
    p.add_argument("--taskvar_file", default="assets/taskvars_train.json")
    p.add_argument("--taskvar", default=None)
    p.add_argument("--seed", type=int, default=100)
    p.add_argument("--num_demos", type=int, default=20)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--max_steps", type=int, default=25)
    p.add_argument("--run_action_step", type=int, default=1)
    p.add_argument("--no_gt_llm", action="store_true")
    p.add_argument("--llm_cache_file", default=None)
    p.add_argument("--gt_og_label_file", default=None)
    p.add_argument("--pc_label_type", default=None)
    p.add_argument("--save_obs_outs", action="store_true")
    p.add_argument("--env", default="rlbench", choices=["rlbench", "replay"])
    p.add_argument("--replay_data_dir", default=None)
    p.add_argument("--image_size", type=int, nargs=2, default=[256, 256])
    return p.parse_args(argv)


def _pipeline_builder(pipeline_config):
    if pipeline_config["object_grounding"].get("use_groundtruth", False):
        from .robot_pipeline import GroundtruthRobotPipeline
        return GroundtruthRobotPipeline(pipeline_config)
    from .robot_pipeline import RobotPipeline
    return RobotPipeline(pipeline_config)


def _replay_env_builder(data_dir, taskvar_instr_file):
    from ..train.datasets.store import open_store
    instrs = {}
    f = resolve_asset(taskvar_instr_file)
    if f and os.path.exists(f):
        instrs = json.load(open(f))
    return ReplayEnv(open_store(data_dir), taskvar_instructions=instrs)


def _sim_env_builder(image_size):
    from ..rlbench.environments import RLBenchEnv
    return RLBenchEnv(
        data_path="", apply_rgb=True, apply_pc=True, apply_mask=True,
        apply_cameras=("left_shoulder", "right_shoulder", "wrist", "front"),
        image_size=image_size)


def main(argv=None):
    from functools import partial
    args = build_args(argv)

    with open(resolve_asset(args.pipeline_config_file)) as f:
        pipeline_config = yaml.safe_load(f)

    llm_cfg = pipeline_config.setdefault("llm_planner", {})
    og_cfg = pipeline_config.setdefault("object_grounding", {})
    mp_cfg = pipeline_config.setdefault("motion_planner", {})
    if args.no_gt_llm:
        llm_cfg["use_groundtruth"] = False
    if args.llm_cache_file is not None:
        llm_cfg["cache_file"] = args.llm_cache_file
    if args.gt_og_label_file is not None:
        og_cfg["gt_label_file"] = args.gt_og_label_file
    if args.pc_label_type is not None:
        mp_cfg["pc_label_type"] = args.pc_label_type
    mp_cfg["run_action_step"] = args.run_action_step

    mp_expr_dir = args.mp_expr_dir or mp_cfg.get("expr_dir")
    mp_ckpt_step = args.mp_ckpt_step if args.mp_ckpt_step is not None \
        else mp_cfg.get("ckpt_step")
    checkpoint = os.path.join(mp_expr_dir, "ckpts",
                              f"model_step_{mp_ckpt_step}.msgpack")
    if not os.path.exists(checkpoint):
        print(checkpoint, "not exists")
        return None
    mp_cfg["expr_dir"] = mp_expr_dir
    mp_cfg["ckpt_step"] = mp_ckpt_step
    mp_cfg["checkpoint"] = checkpoint
    mp_cfg["config_file"] = os.path.join(
        mp_expr_dir, "logs", "training_config.yaml")
    mp_cfg["save_obs_outs"] = args.save_obs_outs

    # pred-dir naming encodes the oracle modes (reference :283-289)
    pred_dirname = "preds"
    if llm_cfg.get("use_groundtruth", False):
        pred_dirname += "-llm_gt"
    if og_cfg.get("use_groundtruth", False):
        pred_dirname += f"-og_gt_{mp_cfg.get('pc_label_type', 'coarse')}"
    if args.run_action_step > 1:
        pred_dirname += f"-runstep{args.run_action_step}"
    pred_dir = os.path.join(mp_expr_dir, pred_dirname, f"seed{args.seed}")
    os.makedirs(pred_dir, exist_ok=True)
    mp_cfg["pred_dir"] = pred_dir
    result_file = os.path.join(pred_dir, "results.jsonl")

    if args.taskvar:
        taskvars = [args.taskvar]
    else:
        taskvars = json.load(open(resolve_asset(args.taskvar_file)))

    if args.env == "replay":
        from ..configs import get_config
        data_cfg = get_config(mp_cfg["config_file"]).TRAIN_DATASET
        env_builder = partial(
            _replay_env_builder,
            args.replay_data_dir or data_cfg.get("data_dir"),
            llm_cfg.get("taskvar_instr_file"))
    else:
        env_builder = partial(_sim_env_builder, tuple(args.image_size))

    run_eval_server(
        taskvars, partial(_pipeline_builder, pipeline_config), env_builder,
        result_file, num_workers=args.num_workers, num_demos=args.num_demos,
        max_steps=args.max_steps, seed=args.seed,
        checkpoint=mp_ckpt_step, stateful=True,
        sim_env=args.env == "rlbench")
    return result_file


if __name__ == "__main__":
    main()
