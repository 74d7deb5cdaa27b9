"""Training runtime: jitted DP train/val steps over a device mesh.

Parity with the reference driver (train/train_simple_policy.py:53-288):
config -> dataset -> model -> optimizer -> step loop with LR decay per step,
grad clipping, periodic save/validate — but the step itself is one compiled
XLA program with donated buffers, and data parallelism is sharding, not DDP.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax
from flax.training import train_state

from ..parallel.mesh import (
    make_mesh, batch_sharding, replicated_sharding, shard_batch,
    state_shardings,
)
from .optim import build_optimizer


class TrainState(train_state.TrainState):
    batch_stats: Any = None


_INIT_SHRINK_N = 256   # point axis
_INIT_SHRINK_T = 8     # text-token axis


def shrink_for_init(batch, n=_INIT_SHRINK_N, t=_INIT_SHRINK_T):
    """Shrink a batch to minimal shapes for flax init. Parameter shapes
    depend only on channel dims, never on batch/point/text-token counts,
    so init on a (1, 256)-point batch yields the identical param tree as
    the full release shapes while compiling orders of magnitude faster
    (the full-size init program alone took ~8 min to compile on TPU)."""
    point_keys = ("pc_fts", "pc_mask", "pc_labels")
    txt_keys = ("txt_embeds", "txt_mask")
    out = {}
    full_n = batch["pc_fts"].shape[1]
    for k, v in batch.items():
        if k in ("order_perm", "stem_nmap") or k.startswith(
                ("cpe_nmap", "cpe_far", "stem_far")):
            # host-structure keys (datasets/structure.py) are index maps
            # whose shapes follow the FULL point count / stage capacities;
            # init just drops them — the no-structure trace yields the
            # identical param tree (structure changes dataflow, not params)
            continue
        v1 = v[:1]
        if k in point_keys and v1.ndim >= 2:
            v1 = v1[:, :n]
        elif k in txt_keys and v1.ndim >= 2:
            v1 = v1[:, :t]
        elif k == "pc_counts":
            v1 = jnp.minimum(v1, n)
        elif k == "disc_pos_probs" and v1.ndim >= 2 and full_n and \
                v1.shape[-1] % full_n == 0:
            # (1, [L,] 3, N*nb) -> keep the first n points' candidates
            nb = v1.shape[-1] // full_n
            v1 = v1.reshape(v1.shape[:-1] + (full_n, nb))[..., :n, :]
            v1 = v1.reshape(v1.shape[:-2] + (n * nb,))
        out[k] = v1
    return out


def init_variables(model, sample_batch, rng, shrink=True):
    """Jitted flax init: one compiled (and persistently cached) XLA program
    instead of thousands of eager per-op dispatches — the eager path costs
    minutes on both the TPU and a forced-multi-device CPU client. By
    default the sample batch is shrunk to minimal shapes first (see
    shrink_for_init)."""
    if shrink:
        sample_batch = shrink_for_init(sample_batch)
    init_fn = jax.jit(lambda rngs, batch: model.init(
        rngs, batch, deterministic=True))
    return init_fn({"params": rng, "dropout": rng, "shuffle": rng},
                   sample_batch)


def create_train_state(model, sample_batch, train_cfg, rng, mesh=None,
                       zero1=True, zero1_manual=False):
    variables = init_variables(model, sample_batch, rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", flax.core.freeze({}))
    if zero1_manual:
        # the manual reduce-scatter step (parallel/zero.py
        # make_manual_zero1_train_step) moves the global-norm clip inside
        # its shard_map, so the state's tx is the clip-free elementwise
        # chain and its opt_state matches that chain's structure (per-leaf:
        # the fused flat buffer can't run on shard shapes)
        train_cfg = dict(train_cfg, grad_norm=None, fused_optim=False)
    if mesh is not None and mesh.shape.get("tp", 1) > 1:
        # under tensor parallelism the per-leaf moments shard WITH their
        # parameter (state_shardings path-suffix rules); a flat moment
        # buffer would force an all-gather of every tp-sharded gradient,
        # so keep the per-leaf chain on tp meshes
        train_cfg = dict(train_cfg, fused_optim=False)
    tx, schedule = build_optimizer(params, train_cfg)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, batch_stats=batch_stats)
    if mesh is not None:
        # DP-replicated params; when the mesh has a tp axis > 1 the
        # Megatron column/row rules (parallel/mesh.py) shard the MLP and
        # CPE weight pairs (and their adam moments) over it; with zero1
        # (default) the optimizer moments additionally shard over 'dp'
        # (ZeRO-1 — 1/dp the optimizer memory and update compute).
        state = jax.device_put(state, state_shardings(state, mesh,
                                                      zero1=zero1))
    return state, schedule


def make_train_step(model, loss_fn: Callable, mesh=None, donate=True,
                    state=None):
    """loss_fn(preds, batch) -> dict with 'total'.

    state: pass the committed TrainState to PIN the step's output state to
    the input layout (out_shardings from each leaf's sharding). Required
    for ZeRO-1: without the pin, sharding propagation from the dp-sharded
    optimizer moments can leak a dp-sharded layout onto the UPDATED params
    (XLA picks output shardings freely), silently breaking the
    replicated-params contract and the donation match. With it, every step
    consumes and produces the exact same layout.
    """

    def step(state: TrainState, batch, rng):
        drng, srng = jax.random.split(jax.random.fold_in(rng, state.step))

        def compute(params):
            preds, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, deterministic=False,
                rngs={"dropout": drng, "shuffle": srng},
                mutable=["batch_stats"])
            losses = loss_fn(preds, batch)
            return losses["total"], (losses, mutated)

        (_, (losses, mutated)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        new_state = state.apply_gradients(
            grads=grads, batch_stats=mutated["batch_stats"])
        return new_state, {k: v for k, v in losses.items()}

    if mesh is not None:
        # State sharding is inherited from the arrays create_train_state
        # placed (replicated for pure DP; Megatron col/row-sharded leaves
        # when the mesh has a tp axis; dp-sharded moments under ZeRO-1) —
        # and pinned on the output when `state` is provided (see above).
        # The batch's sharding is inherited too: shard_batch commits each
        # leaf to its dp(×sp) layout, and an unspecified in_sharding lets
        # jit honor that committed placement instead of forcing a dp-only
        # reshard (which would undo the point-axis sp sharding of the
        # cloud tensors).
        out_state = None
        if state is not None:
            out_state = jax.tree_util.tree_map(lambda l: l.sharding, state)
        return jax.jit(step, out_shardings=(out_state, None),
                       donate_argnums=(0,) if donate else ())
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_val_step(model, loss_fn: Callable, decode_fn: Callable):
    """One jitted program: eval forward -> (losses, decoded actions).

    Mirrors reference validate() (train_simple_policy.py:290-319) which needs
    both the loss dict and the decoded action per batch. Batch placement
    comes from the caller's shard_batch/_to_device; jit honors the
    committed layout (no mesh parameter — see make_train_step).
    """

    def step(state: TrainState, batch):
        preds = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, deterministic=True)
        return loss_fn(preds, batch), decode_fn(preds)

    return jax.jit(step)


def make_eval_step(model, loss_fn: Callable):
    def step(state: TrainState, batch):
        preds = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, deterministic=True)
        return loss_fn(preds, batch)

    return jax.jit(step)


class RunningMeter:
    """EMA meter, smooth=0.99 (reference train/utils/logger.py:68-94)."""

    def __init__(self, name, smooth=0.99):
        self.name = name
        self.smooth = smooth
        self.val = None

    def __call__(self, value):
        value = float(value)
        self.val = value if self.val is None else (
            self.val * self.smooth + value * (1 - self.smooth))
        return self.val
