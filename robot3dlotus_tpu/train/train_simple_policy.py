"""3D-LOTUS policy training driver.

Parity with the reference entry point (train/train_simple_policy.py:53-288):
  python -m robot3dlotus_tpu.train.train_simple_policy \
      --exp-config <yaml> [KEY VALUE]...

config -> store/dataset -> model -> optimizer -> step loop with per-step LR
decay, grad clip, EMA meters, periodic save + validate, auto-resume. The step
is one jitted XLA program; DP is mesh sharding.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import jax

from ..configs import get_config
from ..models.factory import build_model
from ..models.simple_policy import compute_loss
from ..parallel.mesh import make_mesh
from ..parallel import dist
from .trainer import (
    TrainState, create_train_state, make_train_step, make_eval_step,
    RunningMeter,
)
from .checkpoint import ModelSaver, save_training_meta, resume_or_init
from .datasets.store import open_store
from .datasets.keystep_dataset import KeystepDataset
from .datasets.loader import KeystepBatchLoader, PrefetchToDevice
from .logging import build_logger, MetricWriter


def build_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp-config", required=True)
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="KEY VALUE overrides")
    args = parser.parse_args(argv)
    return get_config(args.exp_config, args.opts)


def main(config):
    output_dir = config.output_dir or "experiments/default"
    os.makedirs(output_dir, exist_ok=True)
    logger = build_logger(output_dir) if dist.is_default_process() \
        else dist.NoOp()
    metric_writer = MetricWriter(output_dir) if dist.is_default_process() \
        else dist.NoOp()

    devices = jax.devices()
    mesh = make_mesh(devices) if len(devices) > 1 else None
    logger.info(f"devices={len(devices)} mesh={'dp' if mesh else 'single'}")

    seed = int(config.get("SEED", 2024)) + jax.process_index()
    np.random.seed(seed)
    rng = jax.random.PRNGKey(seed)

    tds_cfg = dict(config.TRAIN_DATASET)
    store = open_store(tds_cfg.pop("data_dir"))
    dataset = KeystepDataset(store, rng=np.random.RandomState(seed), **tds_cfg)
    logger.info(f"#train episodes: {len(dataset)}")

    num_clouds = int(config.TRAIN.train_batch_size)
    loader = KeystepBatchLoader(
        dataset, num_clouds=num_clouds,
        num_points=int(tds_cfg.get("num_points", 4096)),
        pos_bins=tds_cfg.get("pos_bins")
        if tds_cfg.get("pos_type", "disc") == "disc" else None,
        seed=seed)
    batches = PrefetchToDevice(loader, mesh=mesh)

    model = build_model(config.MODEL)
    act_cfg = dict(config.MODEL.action_config)
    loss_cfg = dict(config.MODEL.loss_config)

    first = next(iter(batches))
    host_first = jax.tree_util.tree_map(np.asarray, first)
    state, schedule = create_train_state(
        model, host_first, dict(config.TRAIN), rng, mesh=mesh)
    nparams = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logger.info(f"#parameters: {nparams/1e6:.2f}M")

    if config.TRAIN.get("resume_training", True):
        state, start_step = resume_or_init(state, output_dir)
        if start_step:
            logger.info(f"resumed at step {start_step}")
    else:
        start_step = 0

    if dist.is_default_process():
        save_training_meta(output_dir, config)
    saver = ModelSaver(output_dir)

    step_fn = make_train_step(
        model, lambda preds, b: compute_loss(preds, b, act_cfg, loss_cfg),
        mesh=mesh)

    num_train_steps = int(config.TRAIN.num_train_steps)
    log_steps = int(config.TRAIN.get("log_steps", 1000))
    save_steps = int(config.TRAIN.get("save_steps", 10000))
    meters = {}
    t_start = time.time()
    samples_seen = 0

    step = start_step
    losses = None
    batch_iter = iter(batches)
    if start_step == 0:
        state, losses = step_fn(state, first, rng)
        step += 1
    for batch in batch_iter:
        if step >= num_train_steps:
            break
        state, losses = step_fn(state, batch, rng)
        step += 1
        samples_seen += num_clouds
        if step % log_steps == 0:
            host_losses = {k: float(v) for k, v in losses.items()}
            for k, v in host_losses.items():
                meters.setdefault(k, RunningMeter(k))(v)
            lr = float(schedule(step))
            sps = samples_seen / max(time.time() - t_start, 1e-9)
            logger.info(
                f"step {step}: " +
                ", ".join(f"{k}={m.val:.4f}" for k, m in meters.items()) +
                f", lr={lr:.2e}, samples/s={sps:.1f}")
            metric_writer.write(step, dict(host_losses, lr=lr, samples_per_sec=sps))
        if step % save_steps == 0 and dist.is_default_process():
            saver.save(state, step)
    if dist.is_default_process():
        saver.save(state, step)
    logger.info(f"done at step {step}")
    return state


if __name__ == "__main__":
    main(build_args())
