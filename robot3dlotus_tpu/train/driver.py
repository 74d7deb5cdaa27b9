"""Shared training-driver core for both policy families.

The reference ships two near-identical 352-line drivers
(train/train_simple_policy.py:53-288 and train/train_motion_planner.py:42-318);
here the loop lives once and each entry point provides a TaskSpec (dataset,
collate, loss, decode, validation metrics).

Loop parity with the reference:
  config -> dataset -> model -> optimizer -> step loop with per-step LR decay,
  grad clip, EMA meters fed EVERY step, periodic save, periodic validation
  (loss dict + decoded-action accuracies, reference :256-265 and :290-319),
  best-val tracking, auto-resume, final save + final validation.

TPU-first details: the train step is one jitted XLA program with donated
buffers; loss scalars are buffered as device arrays and only pulled to host at
log time, so the meters see every step without a per-step device sync.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, Optional

import numpy as np
import jax

from ..models.factory import build_model
from ..parallel.mesh import make_mesh, shard_batch, state_shardings
from ..parallel import dist
from .trainer import (
    create_train_state, make_train_step, make_val_step, RunningMeter,
)
from .checkpoint import (
    ModelSaver, save_training_meta, resume_or_init, warm_start_variables,
)
from .datasets.loader import KeystepBatchLoader, PrefetchToDevice
from .logging import build_logger, MetricWriter
from .preempt import install_preemption_handler, requeue_self


@dataclasses.dataclass
class TaskSpec:
    name: str
    # (ds_cfg_dict, rng) -> dataset object (indexable, returns sample lists)
    build_dataset: Callable[[dict, np.random.RandomState], Any]
    # (ds_cfg_dict, num_clouds) -> collate_fn(samples) -> host batch dict
    make_collate: Callable[[dict, int], Callable]
    # (preds, batch, act_cfg, loss_cfg) -> loss dict with 'total'
    loss_fn: Callable
    # (preds, act_cfg) -> decoded actions (device array)
    decode_fn: Callable
    # (decoded_actions_np, host_batch) -> {metric: (sum, count)}
    val_accuracy: Callable
    # validation metric tracked for "best" (reference keys on pos_loss)
    best_metric: str = "pos_loss"


def _to_device(batch, mesh):
    if mesh is not None:
        return shard_batch(batch, mesh)
    return jax.tree_util.tree_map(jax.device_put, batch)


def _run_validation(val_fn, state, make_val_loader, spec, mesh):
    loss_sums: Dict[str, float] = {}
    acc_sums: Dict[str, list] = {}
    num_batches = 0
    for host_batch in make_val_loader():
        batch = _to_device(host_batch, mesh)
        losses, actions = val_fn(state, batch)
        for k, v in losses.items():
            loss_sums[k] = loss_sums.get(k, 0.0) + float(v)
        for k, (s, c) in spec.val_accuracy(
                np.asarray(actions), host_batch).items():
            a = acc_sums.setdefault(k, [0.0, 0.0])
            a[0] += float(s)
            a[1] += float(c)

        num_batches += 1
    if num_batches == 0:
        return {}
    out = {}
    for k, v in loss_sums.items():
        name = k if k.endswith("loss") else (
            "total_loss" if k == "total" else f"{k}_loss")
        out[name] = v / num_batches
    for k, (s, c) in acc_sums.items():
        out[k] = s / max(c, 1.0)
    return out


def run_training(config, spec: TaskSpec):
    # multi-host init first (before any other jax call): discovers
    # SLURM / WORLD_SIZE+RANK launch envs and joins the process group
    # (reference train_simple_policy.py:58 -> distributed.py:25-81)
    multihost = dist.init_distributed()

    output_dir = config.output_dir or f"experiments/{spec.name}"
    os.makedirs(output_dir, exist_ok=True)
    logger = build_logger(output_dir) if dist.is_default_process() \
        else dist.NoOp()
    metric_writer = MetricWriter(output_dir) if dist.is_default_process() \
        else dist.NoOp()

    devices = jax.devices()
    mesh = make_mesh(devices) if len(devices) > 1 else None
    logger.info(f"devices={len(devices)} mesh={'dp' if mesh else 'single'}"
                + (f" processes={jax.process_count()}" if multihost else ""))

    base_seed = int(config.get("SEED", 2024))
    seed = base_seed + jax.process_index()  # per-process: augmentation etc.
    np.random.seed(seed)
    # default rbg: dropout draws lower to one RngBitGenerator HLO each
    # instead of threefry counter chains — profiling showed hundreds of
    # tiny (~fixed-launch-cost) threefry fusions per train step on TPU.
    # TRAIN.rng_impl=threefry restores the counter-based stream.
    rng_impl = str(config.TRAIN.get("rng_impl", "rbg"))
    rng = jax.random.PRNGKey(seed) if rng_impl == "threefry" \
        else jax.random.key(seed, impl=rng_impl)

    tds_cfg = dict(config.TRAIN_DATASET)
    dataset = spec.build_dataset(tds_cfg, np.random.RandomState(seed))
    logger.info(f"#train episodes: {len(dataset)}")

    num_clouds = int(config.TRAIN.train_batch_size)
    collate_fn = spec.make_collate(tds_cfg, num_clouds)
    # host-precomputed structure (datasets/structure.py): the order shuffle,
    # SFC presort, and stem neighbor map are weight-independent integer work
    # — build them on the loader thread (overlapped with device compute by
    # PrefetchToDevice) instead of the device's scalar unit. Disabled under
    # sequence parallelism: stem_nmap indexes the full local point axis,
    # which an sp-sharded layout splits.
    #
    # Stochasticity trade-off vs the reference recipe: with host structure,
    # ONE order permutation is drawn per batch and reused by every stage
    # (the precomputed CPE maps are only valid in the unshuffled pooling
    # cascade), whereas the reference's SerializedPooling redraws the
    # permutation after each pooling (model.py:220-224). The per-batch draw
    # still randomizes which curve every stage's blocks see across steps —
    # only the within-step, across-stage decorrelation is lost. Set
    # TRAIN.host_structure=False to recover the reference's per-stage
    # redraw at the cost of on-device sorts (~2x step time at the release
    # shape, BENCH_NOTES round 3).
    if bool(config.TRAIN.get("host_structure", True)) and \
            (mesh is None or mesh.shape.get("sp", 1) == 1):
        from .datasets.structure import (
            attach_host_structure, structure_cfg_from_model)
        scfg = structure_cfg_from_model(config.MODEL)
        struct_rng = np.random.RandomState(seed + 131071)
        base_collate = collate_fn
        collate_fn = lambda chunk: attach_host_structure(
            base_collate(chunk), scfg, struct_rng)
        logger.info("host structure: presort + stem map on the loader "
                    f"thread (orders={scfg['orders']})")
    loader = KeystepBatchLoader(
        dataset, num_clouds=num_clouds,
        num_points=int(tds_cfg.get("num_points", 4096)),
        collate_fn=collate_fn, seed=seed,
        # process-invariant: every host must shuffle identically or the
        # ids[rank::world] shards overlap (loader.py _epoch_ids)
        shuffle_seed=base_seed,
        num_workers=int(config.TRAIN.get("n_workers", 0) or 0))
    batches = PrefetchToDevice(loader, mesh=mesh)

    model = build_model(config.MODEL)
    act_cfg = dict(config.MODEL.action_config)
    # disc-position GT probs are built on device inside the train step; the
    # heatmap shaping knob lives in the dataset config in the reference
    # (TRAIN_DATASET.pos_heatmap_type) so mirror it into the loss config
    act_cfg.setdefault("pos_heatmap_type",
                       tds_cfg.get("pos_heatmap_type", "dist"))
    loss_cfg = dict(config.MODEL.loss_config)
    loss_fn = lambda preds, b: spec.loss_fn(preds, b, act_cfg, loss_cfg)

    # TRAIN.zero1_manual: train with the manual reduce-scatter ZeRO-1 step
    # (parallel/zero.py make_manual_zero1_train_step) — LITERAL
    # reduce-scatter/all-gather collectives on the trainer's own path,
    # pure-dp meshes only. Default (False) is the GSPMD formulation.
    zero1_manual = bool(config.TRAIN.get("zero1_manual", False))
    if zero1_manual:
        assert mesh is not None and mesh.shape.get("tp", 1) == 1 \
            and mesh.shape.get("sp", 1) == 1, (
                "TRAIN.zero1_manual needs a pure-dp multi-device mesh")

    first = next(iter(batches))
    host_first = jax.tree_util.tree_map(np.asarray, first)
    state, schedule = create_train_state(
        model, host_first, dict(config.TRAIN), rng, mesh=mesh,
        zero1_manual=zero1_manual)
    nparams = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logger.info(f"#parameters: {nparams/1e6:.2f}M")

    if config.TRAIN.get("resume_training", True):
        state, start_step = resume_or_init(state, output_dir)
        if start_step:
            logger.info(f"resumed at step {start_step}")
    else:
        start_step = 0

    # warm start from a pretrained model (reference `config.checkpoint`,
    # train_simple_policy.py:154-173): shape-filtered partial load into the
    # fresh init — auto-resume above takes precedence, like the reference
    warm = config.get("checkpoint", None)
    if start_step == 0 and warm:
        merged, n_loaded, n_skipped = warm_start_variables(
            {"params": jax.device_get(state.params),
             "batch_stats": jax.device_get(state.batch_stats)},
            warm, config.MODEL,
            encoder_only=config.TRAIN.get("resume_encoder_only", False),
            strict=config.get("checkpoint_strict_load", False))
        state = state.replace(params=merged["params"],
                              batch_stats=merged["batch_stats"])
        logger.info(f"warm start from {warm}: {n_loaded} tensors loaded, "
                    f"{n_skipped} skipped (shape-filtered)")

    if mesh is not None:
        # resume_or_init / warm_start_variables splice host numpy leaves
        # (and a python-int step) into the state; re-commit every leaf to
        # its mesh layout so the step builder's out-sharding pin (which
        # reads leaf.sharding) and buffer donation see committed device
        # arrays again (advisor r4, high).
        state = jax.device_put(state, state_shardings(state, mesh))

    if dist.is_default_process():
        save_training_meta(output_dir, config)
    saver = ModelSaver(output_dir)

    # state= pins the step's output layout to the committed one — required
    # under ZeRO-1 so the dp-sharded moments can't leak their layout onto
    # the updated (replicated) params (see make_train_step docstring)
    if zero1_manual:
        from ..parallel.zero import make_manual_zero1_train_step
        step_fn = make_manual_zero1_train_step(
            model, loss_fn, dict(config.TRAIN), state, mesh)
    else:
        step_fn = make_train_step(model, loss_fn, mesh=mesh, state=state)

    # ---- validation setup (reference train_simple_policy.py:256-265) ----
    val_cfg = dict(config.get("VAL_DATASET", {}) or {})
    val_steps = int(config.TRAIN.get("val_steps", 0) or 0)
    use_val = bool(val_cfg.pop("use_val", False)) and val_steps > 0
    val_fn = None
    make_val_loader = None
    if use_val:
        val_dataset = spec.build_dataset(
            dict(val_cfg), np.random.RandomState(seed + 1))
        logger.info(f"#val episodes: {len(val_dataset)}")
        val_clouds = int(config.TRAIN.get("val_batch_size", num_clouds))
        val_collate = spec.make_collate(dict(val_cfg), val_clouds)

        def make_val_loader():
            if jax.process_count() == 1:
                return KeystepBatchLoader(
                    val_dataset, num_clouds=val_clouds,
                    num_points=int(val_cfg.get("num_points", 4096)),
                    collate_fn=val_collate, shuffle=False, seed=seed,
                    infinite=False)
            # multihost: uneven per-host shards + variable keysteps per
            # episode would give hosts different batch counts, deadlocking
            # the collective val step on the host with fewer — every host
            # runs exactly TRAIN.val_num_batches instead (its shard cycles).
            # More hosts than val episodes: fold onto overlapping shards
            # (metric duplication, like DistributedSampler padding) rather
            # than leaving hosts with an empty infinite shard.
            import itertools
            n = int(config.TRAIN.get("val_num_batches", 16) or 16)
            eff_pc = min(jax.process_count(), max(len(val_dataset), 1))
            inf = KeystepBatchLoader(
                val_dataset, num_clouds=val_clouds,
                num_points=int(val_cfg.get("num_points", 4096)),
                collate_fn=val_collate, shuffle=False, seed=seed,
                process_index=jax.process_index() % eff_pc,
                process_count=eff_pc, infinite=True)
            return itertools.islice(iter(inf), n)

        val_fn = make_val_step(
            model, loss_fn, lambda preds: spec.decode_fn(preds, act_cfg))
    best_val_metric, best_val_step = float("inf"), -1

    def validate(at_step):
        nonlocal best_val_metric, best_val_step
        metrics = _run_validation(val_fn, state, make_val_loader, spec, mesh)
        logger.info("================= Validation =================")
        logger.info(", ".join(f"{k}: {v:.4f}" for k, v in metrics.items()))
        metric_writer.write(
            at_step, {f"val_{k}": v for k, v in metrics.items()})
        if metrics.get(spec.best_metric, float("inf")) < best_val_metric:
            best_val_metric = metrics[spec.best_metric]
            best_val_step = at_step

    num_train_steps = int(config.TRAIN.num_train_steps)
    log_steps = int(config.TRAIN.get("log_steps", 1000))
    save_steps = int(config.TRAIN.get("save_steps", 10000))
    meters: Dict[str, RunningMeter] = {}
    t_start = time.time()
    samples_seen = 0

    # buffered device scalars: every step feeds the meters (reference
    # :218-221) but the host only syncs at log boundaries
    loss_buf = []

    def flush_meters():
        for step_losses in loss_buf:
            for k, v in step_losses.items():
                meters.setdefault(k, RunningMeter(k))(float(v))
        loss_buf.clear()

    # preemption: checkpoint + requeue at the next step boundary
    # (reference train/utils/slurm_requeue.py:11-28)
    preempted = install_preemption_handler()

    # profiling: capture a jax.profiler trace over a step window
    # (SURVEY §5 — the reference has no tracer; samples/s + MFU are
    # first-class here). TRAIN.profile_start_step/profile_num_steps.
    profile_start = int(config.TRAIN.get("profile_start_step", 0) or 0)
    profile_steps = int(config.TRAIN.get("profile_num_steps", 0) or 0)
    profile_active = False

    def maybe_profile(at_step):
        nonlocal profile_active
        if profile_steps <= 0 or not dist.is_default_process():
            return
        if not profile_active and at_step == profile_start:
            jax.profiler.start_trace(os.path.join(output_dir, "profile"))
            profile_active = True
        elif profile_active and at_step >= profile_start + profile_steps:
            jax.profiler.stop_trace()
            profile_active = False
            logger.info(f"profiler trace written to {output_dir}/profile")

    step = start_step
    batch_iter = iter(batches)
    try:
        if start_step == 0:
            state, losses = step_fn(state, first, rng)
            loss_buf.append(losses)
            step += 1
            samples_seen += num_clouds
        for batch in batch_iter:
            if step >= num_train_steps:
                break
            if preempted:
                logger.info(f"preemption signal {preempted.signum}: "
                            f"saving at step {step} and requeueing")
                if dist.is_default_process():
                    saver.save(state, step)
                    requeue_self()
                return state
            maybe_profile(step)
            state, losses = step_fn(state, batch, rng)
            loss_buf.append(losses)
            step += 1
            samples_seen += num_clouds
            if step % log_steps == 0:
                flush_meters()
                lr = float(schedule(step))
                sps = samples_seen / max(time.time() - t_start, 1e-9)
                logger.info(
                    f"step {step}: " +
                    ", ".join(f"{k}={m.val:.4f}"
                              for k, m in meters.items()) +
                    f", lr={lr:.2e}, samples/s={sps:.1f}")
                metric_writer.write(step, dict(
                    {k: m.val for k, m in meters.items()},
                    lr=lr, samples_per_sec=sps))
            if step % save_steps == 0 and dist.is_default_process():
                saver.save(state, step)
            if use_val and step % val_steps == 0:
                validate(step)
    finally:
        # release the prefetch thread + its queued device batches (the
        # infinite loader would otherwise stay alive past training)
        batches.close()
    if profile_active:
        jax.profiler.stop_trace()
    flush_meters()
    if dist.is_default_process():
        saver.save(state, step)
    if use_val:
        validate(step)
        logger.info(f"Validation: best {spec.best_metric}: "
                    f"{best_val_metric:.4f} at step {best_val_step}")
    logger.info(f"done at step {step}")
    return state
