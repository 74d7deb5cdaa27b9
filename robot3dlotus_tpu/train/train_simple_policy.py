"""3D-LOTUS policy training driver.

Parity with the reference entry point (train/train_simple_policy.py:53-288):
  python -m robot3dlotus_tpu.train.train_simple_policy \
      --exp-config <yaml> [KEY VALUE]...

The loop itself (per-step LR decay, grad clip, EMA meters, periodic
save + validate, auto-resume) lives in driver.run_training; this module
contributes the keystep dataset/collate/loss/decode and the validation
metrics (pos L1, open accuracy — reference :290-319).
"""
from __future__ import annotations

import argparse

import numpy as np

from ..configs import get_config
from ..models.simple_policy import compute_loss, decode_actions
from .driver import TaskSpec, run_training
from .datasets.store import open_store
from .datasets.keystep_dataset import KeystepDataset
from .datasets.collate import collate_keystep_samples


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
    return KeystepDataset(store, rng=rng, **cfg)


def _make_collate(ds_cfg, num_clouds):
    num_points = int(ds_cfg.get("num_points", 4096))
    return lambda samples: collate_keystep_samples(
        samples, num_points, num_clouds=num_clouds)


def _val_accuracy(actions, batch):
    """Decoded (B, 8) actions -> pos L1 + open accuracy over valid clouds
    (reference train_simple_policy.py:296-300)."""
    bv = batch["batch_valid"].astype(bool)
    gt = batch["gt_actions"]
    open_pred = (1.0 / (1.0 + np.exp(-actions[:, -1]))) > 0.5
    open_hits = float(np.sum((open_pred == (gt[:, -1] > 0.5)) & bv))
    pos_l1 = float(np.sum(
        np.abs(actions[:, :3] - gt[:, :3]).mean(-1) * bv))
    n = float(bv.sum())
    return {"open_acc": (open_hits, n), "pos_l1_loss": (pos_l1, n)}


SPEC = TaskSpec(
    name="simple_policy",
    build_dataset=_build_dataset,
    make_collate=_make_collate,
    loss_fn=compute_loss,
    decode_fn=decode_actions,
    val_accuracy=_val_accuracy,
    best_metric="pos_loss",
)


def main(config):
    return run_training(config, SPEC)


if __name__ == "__main__":
    main(build_args())
