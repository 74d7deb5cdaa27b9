"""3D-LOTUS++ motion-planner training driver.

Parity with the reference entry point (train/train_motion_planner.py:42-318):
  python -m robot3dlotus_tpu.train.train_motion_planner \
      --exp-config <yaml> [KEY VALUE]...

Same loop as the keystep-policy driver (driver.run_training); this module
contributes the motion dataset/collate/trajectory loss/decode and the
validation metrics (open + stop accuracy over valid trajectory steps,
reference :290-318).
"""
from __future__ import annotations

import argparse

import numpy as np

from ..configs import get_config
from ..models.motion_planner import compute_mp_loss, decode_mp_actions
from .driver import TaskSpec, run_training
from .datasets.store import open_store
from .datasets.motion_dataset import (
    MotionPlannerDataset, collate_motion_samples,
)


def build_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp-config", required=True)
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="KEY VALUE overrides")
    args = parser.parse_args(argv)
    return get_config(args.exp_config, args.opts)


def _build_dataset(ds_cfg, rng):
    cfg = dict(ds_cfg)
    store = open_store(cfg.pop("data_dir"))
    return MotionPlannerDataset(store, rng=rng, **cfg)


def _make_collate(ds_cfg, num_clouds):
    num_points = int(ds_cfg.get("num_points", 4096))
    max_traj_len = int(ds_cfg.get("max_traj_len", 5))
    return lambda samples: collate_motion_samples(
        samples, num_points, max_traj_len, num_clouds=num_clouds)


def _val_accuracy(actions, batch):
    """Decoded (B, L, 9) trajectories -> open/stop accuracy over valid
    trajectory steps (reference train_motion_planner.py:296-302)."""
    tmask = batch["traj_masks"].astype(bool) & \
        batch["batch_valid"].astype(bool)[:, None]
    gt_open = batch["gt_trajs"][..., -1] > 0.5
    gt_stop = batch["gt_trajs_stop"] > 0.5
    open_pred = (1.0 / (1.0 + np.exp(-actions[..., -2]))) > 0.5
    stop_pred = (1.0 / (1.0 + np.exp(-actions[..., -1]))) > 0.5
    n = float(tmask.sum())
    return {
        "open_acc": (float(np.sum((open_pred == gt_open) & tmask)), n),
        "stop_acc": (float(np.sum((stop_pred == gt_stop) & tmask)), n),
    }


SPEC = TaskSpec(
    name="motion_planner",
    build_dataset=_build_dataset,
    make_collate=_make_collate,
    loss_fn=compute_mp_loss,
    decode_fn=decode_mp_actions,
    val_accuracy=_val_accuracy,
    best_metric="pos_loss",
)


def main(config):
    return run_training(config, SPEC)


if __name__ == "__main__":
    main(build_args())
