"""Sim-free end-to-end learning proof (round-4 verdict item 4): one run
linking training -> checkpoint -> producer/consumer serving -> closed-loop
improvement through the real topology.

  1. TRAIN the policy on the LEARNABLE synthetic store ('synthetic_reach':
     every next-keystep action is a function of the current observation —
     reach the object-blob centroid; train/datasets/store.py) for a few
     hundred steps; the loss curve comes from the driver's metrics.jsonl.
  2. SAVE the untrained init as model_step_0 alongside the trained
     checkpoint.
  3. EVALUATE both checkpoints plus a random-action baseline through the
     REAL eval topology — eval/eval_simple_policy_server.py's spawn-based
     producer/consumer server against ReplayEnv — on 16 episodes/task, 8
     of which the training set never contained (held-out generalization,
     not memorization: episode generation is id-deterministic).
  4. Emit ONE JSON artifact {train curve, sr_trained, sr_untrained,
     sr_random} (committed as E2E_LEARNING_r05.json).

Usage:
  python scripts/e2e_learning_proof.py --out E2E_LEARNING_r05.json \
      [--steps 400] [--scale release|tiny] [--workdir DIR]

'release' uses the release model config (run on the TPU rig; ~5 min);
'tiny' is the CI-sized variant the slow test runs on CPU.

Reference counterpart: the reference validates exclusively through
closed-loop SR (evaluation/eval_simple_policy_server.py:230-291); this
script is that loop with ReplayEnv standing in for CoppeliaSim.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _config(workdir, steps, scale):
    from robot3dlotus_tpu.configs.node import ConfigNode
    if scale == "release":
        from __graft_entry__ import RELEASE_PTV3, RELEASE_ACT
        ptv3 = dict(RELEASE_PTV3, compute_dtype="bfloat16")
        act = dict(RELEASE_ACT)
        num_points, bsz = 4096, 16
        lr = 3e-4
    else:
        ptv3 = {
            "in_channels": 7, "orders": ["z", "z-trans"], "stride": [2],
            "enc_depths": [1, 1], "enc_channels": [32, 64],
            "enc_num_head": [2, 2], "enc_patch_size": [16, 16],
            "dec_depths": [1], "dec_channels": [32], "dec_num_head": [2],
            "dec_patch_size": [16], "qkv_bias": True, "qk_norm": True,
            "attn_drop": 0.1, "proj_drop": 0.1, "drop_path": 0.0,
            "shuffle_orders": True, "serial_depth": 5, "stem_kernel": 3,
        }
        act = {
            "voxel_size": 0.01, "context_channels": 32, "txt_ft_size": 512,
            "use_ee_pose": False, "use_step_id": False, "max_steps": 30,
            "reduce": "max", "dim_actions": 7,
            "pos_pred_type": "heatmap_disc", "pos_heatmap_temp": 0.1,
            "rot_pred_type": "euler_disc", "dropout": 0.1,
            "pos_bins": 15, "pos_bin_size": 0.01, "best_disc_pos": "max",
            "euler_resolution": 5,
        }
        num_points, bsz = 512, 8
        lr = 1e-3
    return ConfigNode({
        "SEED": 2024,
        "output_dir": os.path.join(workdir, "run"),
        "TRAIN": {
            "resume_training": False,
            "train_batch_size": bsz,
            "num_train_steps": steps,
            "warmup_steps": max(steps // 10, 1),
            "log_steps": max(steps // 40, 1),
            "save_steps": steps,
            "val_steps": 0,
            "optim": "adamw", "learning_rate": lr, "lr_sched": "cosine",
            "betas": [0.9, 0.98], "weight_decay": 0.05, "grad_norm": 10,
        },
        "TRAIN_DATASET": {
            "data_dir": "synthetic_reach",          # 8 episodes/taskvar
            "num_points": num_points, "pos_bins": act["pos_bins"],
            "pos_type": "disc", "augment_pc": False,
        },
        "MODEL": {
            "model_class": "SimplePolicyPTV3CA",
            "ptv3_config": ptv3,
            "action_config": act,
            "loss_config": {"pos_weight": 1.0, "rot_weight": 1.0},
        },
    })


def _save_step0(cfg):
    """Untrained baseline: the fresh init saved as model_step_0."""
    import jax
    from robot3dlotus_tpu.models.factory import build_model
    from robot3dlotus_tpu.train.trainer import init_variables
    from robot3dlotus_tpu.train.checkpoint import ModelSaver
    from robot3dlotus_tpu.train.datasets.store import open_store
    from robot3dlotus_tpu.train.datasets.keystep_dataset import (
        KeystepDataset)
    from robot3dlotus_tpu.train.datasets.collate import (
        collate_keystep_samples)
    ds = KeystepDataset(open_store(cfg.TRAIN_DATASET.data_dir),
                        **{k: v for k, v in dict(cfg.TRAIN_DATASET).items()
                           if k != "data_dir"})
    batch = collate_keystep_samples(
        ds[0][:2], num_points=int(cfg.TRAIN_DATASET.num_points))
    model = build_model(cfg.MODEL)
    variables = init_variables(model, batch, jax.random.PRNGKey(1))

    class _S:
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
    ModelSaver(cfg.output_dir).save(_S, 0, save_latest_optim=False)


def _eval_sr(cfg, ckpt_step, num_demos, result_dir, actioner="policy"):
    """One producer/consumer server run against ReplayEnv on the 16-episode
    store; returns mean SR over taskvars."""
    from robot3dlotus_tpu.eval import eval_simple_policy_server as srv
    from robot3dlotus_tpu.train.datasets.store import open_store
    tv_file = os.path.join(result_dir, "taskvars_synthetic.json")
    with open(tv_file, "w") as f:
        json.dump(open_store("synthetic_reach16").taskvars(), f)
    args = [
        "--expr_dir", cfg.output_dir, "--ckpt_step", str(ckpt_step),
        "--env", "replay", "--replay_data_dir", "synthetic_reach16",
        "--taskvar_file", tv_file,
        "--num_demos", str(num_demos), "--num_workers", "2",
        "--max_steps", "4", "--seed", "100",
    ]
    result = srv.main(args)
    recs = [json.loads(line) for line in open(result)
            if json.loads(line).get("checkpoint") ==
            f"model_step_{ckpt_step}"]
    sr = float(np.mean([r["sr"] for r in recs])) if recs else None
    # the server resumes (skips done taskvars) off the results file — park
    # this checkpoint's rows under their own name so the next checkpoint
    # starts fresh
    parked = result.replace("results.jsonl", f"results_{ckpt_step}.jsonl")
    os.replace(result, parked)
    return sr, parked


def _eval_random_sr(num_demos, seed=100):
    """RandomActioner closed-loop baseline through the same ReplayEnv
    scoring (eval/serving.py RandomActioner's action space)."""
    from robot3dlotus_tpu.eval.server import ReplayEnv
    from robot3dlotus_tpu.train.datasets.store import open_store
    rng = np.random.RandomState(seed)
    env = ReplayEnv(open_store("synthetic_reach16"))
    succ = total = 0
    for tv in open_store("synthetic_reach16").taskvars():
        task, var = tv.split("+")
        for demo in range(num_demos):
            env.reset(task, int(var), demo, seed=seed)
            done, reward = False, 0.0
            while not done:
                quat = rng.randn(4)
                quat /= np.linalg.norm(quat)
                action = np.concatenate([
                    rng.uniform([-0.1, -0.3, 0.75], [0.5, 0.3, 1.15]),
                    quat, [rng.randint(0, 2)]]).astype(np.float32)
                _, reward, done = env.step(action)
            succ += reward
            total += 1
    return succ / max(total, 1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="E2E_LEARNING_r05.json")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--scale", choices=("release", "tiny"),
                    default="release")
    ap.add_argument("--num-demos", type=int, default=16)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse an existing trained workdir (eval only)")
    args = ap.parse_args(argv)

    workdir = args.workdir or tempfile.mkdtemp(prefix="e2e_proof_")
    cfg = _config(workdir, args.steps, args.scale)
    cfg.freeze()

    if not args.skip_train:
        _save_step0(cfg)
        from robot3dlotus_tpu.train import train_simple_policy
        train_simple_policy.main(cfg)

    metrics = [json.loads(line) for line in
               open(os.path.join(cfg.output_dir, "logs", "metrics.jsonl"))]
    curve = [{"step": m["step"], "total": round(m["total"], 4)}
             for m in metrics if "total" in m]

    sr_trained, result_file = _eval_sr(cfg, args.steps, args.num_demos,
                                       workdir)
    sr_untrained, _ = _eval_sr(cfg, 0, args.num_demos, workdir)
    sr_random = _eval_random_sr(args.num_demos)

    out = {
        "what": "sim-free learning proof: train on synthetic_reach "
                "(8 eps/task) -> producer/consumer ReplayEnv eval on 16 "
                "eps/task (8 held out); SR = within 5 cm + gripper match "
                "at every keystep",
        "scale": args.scale,
        "steps": args.steps,
        "loss_first": curve[0]["total"] if curve else None,
        "loss_last": curve[-1]["total"] if curve else None,
        "loss_curve": curve,
        "sr_trained": sr_trained,
        "sr_untrained": sr_untrained,
        "sr_random": sr_random,
        "result_file": result_file,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k != "loss_curve"}))
    return out


if __name__ == "__main__":
    main()
