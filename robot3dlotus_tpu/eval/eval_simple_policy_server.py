"""3D-LOTUS policy evaluation server CLI
(reference evaluation/eval_simple_policy_server.py:230-291).

  python -m robot3dlotus_tpu.eval.eval_simple_policy_server \
      --expr_dir experiments/gembench/3dlotus/v1 --ckpt_step 150000 \
      --taskvar_file assets/taskvars_train.json --seed 100 \
      --num_demos 20 --num_workers 4 [--env rlbench|replay]

Reloads the dumped training config from <expr_dir>/logs/training_config.yaml
(the reference's mechanism for keeping eval preprocessing in lockstep with
training), loads <expr_dir>/ckpts/model_step_<N>.msgpack, skips taskvars
already recorded for this checkpoint, and appends per-taskvar success rates
to <expr_dir>/preds/seed<S>/results.jsonl.

`--env replay` drives the recorded-episode ReplayEnv (no simulator needed);
`--env rlbench` launches CoppeliaSim producers (requires the RLBench stack).
"""
from __future__ import annotations

import argparse
import json
import os

from ..utils.assets import resolve_asset
from .server import ReplayEnv, run_eval_server


def build_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--expr_dir", required=True)
    p.add_argument("--ckpt_step", type=int, required=True)
    p.add_argument("--taskvar_file", default="assets/taskvars_train.json")
    p.add_argument("--taskvar", default=None,
                   help="evaluate a single task+variation instead")
    p.add_argument("--seed", type=int, default=100)
    p.add_argument("--num_demos", type=int, default=20)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--max_steps", type=int, default=25)
    p.add_argument("--num_ensembles", type=int, default=1)
    p.add_argument("--best_disc_pos", default="max", choices=["max", "ens1"])
    p.add_argument("--env", default="rlbench", choices=["rlbench", "replay"])
    p.add_argument("--replay_data_dir", default=None,
                   help="episode store for --env replay")
    p.add_argument("--save_obs_outs_dir", default=None)
    p.add_argument("--image_size", type=int, nargs=2, default=[256, 256])
    p.add_argument("--cam_rand_factor", type=float, default=0.0)
    p.add_argument("remained_args", nargs=argparse.REMAINDER,
                   help="KEY VALUE overrides merged into the train config")
    return p.parse_args(argv)


def _actioner_builder(exp_config, checkpoint, cli_opts, best_disc_pos,
                      num_ensembles, save_obs_outs_dir):
    from .actioner import Actioner
    return Actioner(
        exp_config, checkpoint=checkpoint, cli_opts=cli_opts,
        best_disc_pos=best_disc_pos, num_ensembles=num_ensembles,
        save_obs_outs_dir=save_obs_outs_dir)


def _replay_env_builder(data_dir, taskvar_instr_file):
    from ..train.datasets.store import open_store
    instrs = {}
    f = resolve_asset(taskvar_instr_file)
    if f and os.path.exists(f):
        instrs = json.load(open(f))
    return ReplayEnv(open_store(data_dir), taskvar_instructions=instrs)


def _sim_env_builder(image_size, cam_rand_factor):
    from ..rlbench.environments import RLBenchEnv
    return RLBenchEnv(
        data_path="", apply_rgb=True, apply_pc=True,
        apply_cameras=("left_shoulder", "right_shoulder", "wrist", "front"),
        image_size=image_size, cam_rand_factor=cam_rand_factor)


def main(argv=None):
    from functools import partial
    args = build_args(argv)

    exp_config = os.path.join(args.expr_dir, "logs", "training_config.yaml")
    checkpoint = os.path.join(args.expr_dir, "ckpts",
                              f"model_step_{args.ckpt_step}.msgpack")
    if not os.path.exists(checkpoint):
        print(checkpoint, "not exists")
        return None

    if args.taskvar:
        taskvars = [args.taskvar]
    else:
        taskvars = json.load(open(resolve_asset(args.taskvar_file)))

    pred_dir = os.path.join(args.expr_dir, "preds", f"seed{args.seed}")
    os.makedirs(pred_dir, exist_ok=True)
    result_file = os.path.join(pred_dir, "results.jsonl")

    actioner_builder = partial(
        _actioner_builder, exp_config, checkpoint,
        args.remained_args or None, args.best_disc_pos, args.num_ensembles,
        args.save_obs_outs_dir)
    if args.env == "replay":
        from ..configs import get_config
        data_cfg = get_config(exp_config).TRAIN_DATASET
        env_builder = partial(
            _replay_env_builder,
            args.replay_data_dir or data_cfg.get("data_dir"),
            data_cfg.get("taskvar_instr_file"))
    else:
        env_builder = partial(_sim_env_builder, tuple(args.image_size),
                              args.cam_rand_factor)

    run_eval_server(
        taskvars, actioner_builder, env_builder, result_file,
        num_workers=args.num_workers, num_demos=args.num_demos,
        max_steps=args.max_steps, seed=args.seed,
        checkpoint=f"model_step_{args.ckpt_step}",
        sim_env=args.env == "rlbench")
    return result_file


if __name__ == "__main__":
    main()
