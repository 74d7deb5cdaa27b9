"""Optimizer + LR schedule construction (optax).

Parity targets:
  * schedules: reference train/optim/sched.py (noam/linear/inverse_sqrt/
    cosine/cosine_cycle/stepwise with linear warmup; decay-rate floor 1e-5,
    sched.py:95-113).
  * param groups: no weight decay for biases and norm parameters
    (optim/misc.py:13-55). In this flax tree that means every leaf named
    'bias' and the 'scale'/'bias' leaves of norm modules.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import optax


def lr_decay_rate(step, lr_sched, warmup_steps, num_train_steps,
                  num_cosine_cycles=None, lr_decay_step_size=None,
                  lr_decay_gamma=None):
    """Traceable decay-rate schedule with the reference's 1e-5 floor."""
    step = jnp.asarray(step, jnp.float32)
    w = float(max(warmup_steps, 1))
    t = float(max(num_train_steps, 1))
    warm = step / w

    if lr_sched == "linear":
        post = jnp.maximum(0.0, (t - step) / max(t - w, 1.0))
    elif lr_sched == "inverse_sqrt":
        post = (w ** 0.5) * jnp.maximum(step, 1.0) ** -0.5
    elif lr_sched == "noam":
        post = (w ** 0.5) * jnp.maximum(step, 1.0) ** -0.5
    elif lr_sched == "cosine":
        progress = (step - w) / max(t - w, 1.0)
        post = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
    elif lr_sched == "cosine_cycle":
        c = float(num_cosine_cycles or 1)
        progress = (step - w) / max(t - w, 1.0)
        post = jnp.where(
            progress >= 1.0, 0.0,
            0.5 * (1.0 + jnp.cos(jnp.pi * ((c * progress) % 1.0))))
    elif lr_sched == "stepwise":
        post = lr_decay_gamma ** jnp.floor(step / lr_decay_step_size)
    else:
        raise NotImplementedError(lr_sched)

    rate = jnp.where(step < w, warm, post)
    return jnp.maximum(rate, 1e-5)


def _is_no_decay(path):
    # reference no_decay = ['bias', 'LayerNorm.bias', 'LayerNorm.weight']
    # (optim/misc.py:15): biases everywhere + norm affine params. In this
    # flax tree 'scale' leaves exist only on norm modules.
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    leaf = str(names[-1]) if names else ""
    return leaf in ("bias", "scale")


def decay_mask(params):
    """True where weight decay applies."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _is_no_decay(path), params)


def build_optimizer(params, train_cfg):
    """Returns (optax tx, schedule_fn(step)->decay_rate)."""
    lr = float(train_cfg.get("learning_rate", 1e-4))
    betas = train_cfg.get("betas", [0.9, 0.98])
    wd = float(train_cfg.get("weight_decay", 0.05))
    grad_norm = train_cfg.get("grad_norm", None)

    def schedule(step):
        return lr * lr_decay_rate(
            step,
            train_cfg.get("lr_sched", "cosine"),
            train_cfg.get("warmup_steps", 2000),
            train_cfg.get("num_train_steps", 100000),
            num_cosine_cycles=train_cfg.get("num_cosine_cycles"),
            lr_decay_step_size=train_cfg.get("lr_decay_step_size"),
            lr_decay_gamma=train_cfg.get("lr_decay_gamma"),
        )

    opt_name = train_cfg.get("optim", "adamw")
    if opt_name == "adamw":
        core = optax.adamw(schedule, b1=betas[0], b2=betas[1],
                           weight_decay=wd, mask=decay_mask(params))
    elif opt_name == "adam":
        core = optax.adam(schedule, b1=betas[0], b2=betas[1])
    else:
        raise ValueError(opt_name)

    chain = []
    if grad_norm:
        chain.append(optax.clip_by_global_norm(float(grad_norm)))
    chain.append(core)
    tx = optax.chain(*chain)

    accum = int(train_cfg.get("gradient_accumulation_steps", 1) or 1)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedule
