"""ZeRO-1 optimizer-state sharding: the manual reduce-scatter formulation.

Two ZeRO-1 implementations live in this framework:

1. **GSPMD (production, default)** — parallel/mesh.py state_shardings
   shards every optimizer moment over 'dp' (zero1_leaf_spec) and the train
   step pins its output layout (train/trainer.py make_train_step). The
   partitioner then materializes each moment at 1/dp per device and the
   gradient reduction feeding it as an all-reduce + dynamic-slice pair,
   which the TPU backend's collective-optimization pass rewrites into a
   reduce-scatter (XLA:CPU — the dryrun backend — lacks that rewrite, so
   CPU HLO shows the unfused ar+ds pair; same wire bytes either way).

2. **Manual (this module)** — the update itself written with shard_map
   over 'dp': jax.lax.psum_scatter reduces per-device partial gradients
   straight into each device's moment shard, the core optimizer runs on
   shards only, and one all-gather rebuilds the full update. This emits
   LITERAL reduce-scatter/all-gather collectives on every backend and is
   the artifact-grade proof that the sharded-optimizer dataflow (RS ->
   shard-local adam -> AG) compiles and runs at release scale; it is also
   the formulation a future manual-pipeline trainer would use.

The manual step consumes per-device PARTIAL gradients (stacked on a
leading dp axis) — the quantity a data-parallel backward produces before
any cross-device reduction. Reference equivalent: DDP's bucketed NCCL
all-reduce + replicated AdamW step (train/distributed.py:196-212,
train_simple_policy.py:238-244), which keeps dp full copies of mu/nu.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import zero1_leaf_spec

_IS_P = lambda s: isinstance(s, P)  # noqa: E731


def zero1_param_specs(params, mesh: Mesh):
    """Per-leaf ZeRO PartitionSpec tree for a param/grad/moment pytree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: zero1_leaf_spec(path, leaf, mesh), params)


def _dp_dim(spec) -> int:
    """Index of the dp-sharded dim of a spec, or -1 when replicated."""
    for d, ax in enumerate(spec):
        if ax == "dp" or (isinstance(ax, tuple) and "dp" in ax):
            return d
    return -1


def make_manual_zero1_step(train_cfg: dict, params, mesh: Mesh):
    """Build (step_fn, opt_state0) for the manual reduce-scatter ZeRO-1
    update on a pure-dp mesh.

    step_fn(grads_stacked, opt_state, params) -> (new_params, new_opt_state)
      grads_stacked: pytree of (dp, *param_shape) per-device PARTIAL
        gradients (their sum over the leading axis == the full-batch
        gradient), each leaf laid out P('dp', ...).
      opt_state: moments committed to zero1_param_specs layouts
        (opt_state0 already is).

    Inside one shard_map over 'dp': psum_scatter each partial gradient into
    this device's shard, clip by the GLOBAL norm (shard-local sums of
    squares + one scalar psum), run the core optimizer transformation on
    shards only, then all-gather the updates and apply them to the
    replicated params. Gradient-clip semantics match
    optax.clip_by_global_norm; the core tx is train/optim.build_optimizer's
    with grad_norm stripped (the clip moved inside, pre-update, exactly
    where the chain had it).
    """
    from ..train.optim import build_optimizer

    assert mesh.shape.get("tp", 1) == 1 and mesh.shape.get("sp", 1) == 1, (
        "manual ZeRO-1 step shards over dp only — build it on a pure-dp "
        f"mesh (got {dict(mesh.shape)})")
    cfg = dict(train_cfg)
    opt_name = str(cfg.get("optim", "adamw"))
    # shard-local optimizer math is exact only for ELEMENTWISE transforms;
    # ralamb/rangerlars compute per-tensor trust ratios from ||p|| and
    # ||update|| (train/optim.py scale_by_ralamb_ref), which on shards
    # become shard-local norms — a silent numeric change, so refuse.
    assert opt_name in ("adamw", "adam", "adamax", "radam"), (
        f"manual ZeRO-1 supports elementwise optimizers only "
        f"(adamw/adam/adamax/radam); {opt_name!r} needs full-tensor norms")
    max_norm = cfg.pop("grad_norm", None)
    cfg["grad_norm"] = None
    # per-leaf chain only: the fused flat-buffer adamw bakes its layout
    # from FULL param shapes at build time, but this tx runs on per-device
    # SHARDS inside the shard_map
    cfg["fused_optim"] = False
    tx_core, _ = build_optimizer(params, cfg)

    specs = zero1_param_specs(params, mesh)
    dp = mesh.shape["dp"]
    dims = jax.tree_util.tree_map(_dp_dim, specs, is_leaf=_IS_P)

    opt_state_shapes = jax.eval_shape(tx_core.init, params)
    opt_specs = jax.tree_util.tree_map_with_path(
        lambda path, leaf: zero1_leaf_spec(path, leaf, mesh)
        if getattr(leaf, "ndim", 0) >= 1 else P(),
        opt_state_shapes)

    grad_in_specs = jax.tree_util.tree_map(lambda d: P("dp"), dims)
    out_update_specs = jax.tree_util.tree_map(lambda d: P(), dims)

    def body(g_stacked, opt_state, param_shards):
        # 1) reduce-scatter each partial grad into this device's shard
        def rs(g, d):
            g = g[0]  # local (1, *shape) -> (*shape,) partial term
            if d < 0:
                return jax.lax.psum(g, "dp")
            return jax.lax.psum_scatter(g, "dp", scatter_dimension=d,
                                        tiled=True)

        g_shards = jax.tree_util.tree_map(rs, g_stacked, dims)

        # 2) global-norm clip from shard-local sums of squares: sharded
        # leaves partition their tensor exactly once across dp; replicated
        # leaves appear on every device, so their square scales down by dp
        def local_sq(g, d):
            s = jnp.sum(jnp.square(g.astype(jnp.float32)))
            return s if d >= 0 else s / dp

        sq = sum(jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(local_sq, g_shards, dims)))
        gnorm = jnp.sqrt(jax.lax.psum(sq, "dp"))
        if max_norm:
            scale = jnp.float32(max_norm) / jnp.maximum(gnorm, max_norm)
            g_shards = jax.tree_util.tree_map(
                lambda g: (g * scale).astype(g.dtype), g_shards)

        # 3) core optimizer on shards only (elementwise per shard; weight
        # decay sees the matching param shard)
        updates, new_opt = tx_core.update(g_shards, opt_state, param_shards)

        # 4) all-gather the applied update back to the replicated layout
        def ag(u, d):
            if d < 0:
                return u
            return jax.lax.all_gather(u, "dp", axis=d, tiled=True)

        return jax.tree_util.tree_map(ag, updates, dims), new_opt

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(grad_in_specs, opt_specs, specs),
        out_specs=(out_update_specs, opt_specs),
        check_vma=False)

    def step_fn(grads_stacked, opt_state, params_full):
        param_shards = jax.lax.with_sharding_constraint(
            params_full,
            jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                                   is_leaf=_IS_P))
        import optax
        updates, new_opt = mapped(grads_stacked, opt_state, param_shards)
        return optax.apply_updates(params_full, updates), new_opt

    opt_state0 = jax.device_put(
        tx_core.init(params),
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), opt_specs,
                               is_leaf=_IS_P))
    return step_fn, opt_state0


_ELEMENTWISE_OPTIMS = ("adamw", "adam", "adamax", "radam")


def _shard_slice(p, d, didx, dp):
    """This device's shard of a replicated leaf along its dp dim."""
    if d < 0:
        return p
    size = p.shape[d] // dp
    return jax.lax.dynamic_slice_in_dim(p, didx * size, size, d)


def make_manual_zero1_train_step(model, loss_fn, train_cfg: dict, state,
                                 mesh: Mesh):
    """PRODUCTION trainer step with the manual ZeRO-1 reduce-scatter
    formulation inline (TRAIN.zero1_manual=True in train/driver.py
    run_training): ONE shard_map over 'dp' computes per-device partial
    gradients, jax.lax.psum_scatter reduces them straight into this
    device's optimizer shard, the core optimizer runs on shards only, and
    one all-gather rebuilds the applied update — LITERAL reduce-scatter /
    all-gather collectives in the compiled HLO on every backend, on the
    exact step object run_training executes.

    The TrainState must come from create_train_state(zero1_manual=True):
    its tx is the clip-free elementwise chain (the global-norm clip moves
    inside, computed from shard-local sums of squares + one scalar psum —
    optax.clip_by_global_norm semantics), and its opt_state leaves are
    committed to the zero1_param_specs layouts.

    Semantics vs the GSPMD path (make_train_step): per-device loss terms
    are averaged with equal weight (exactly torch DDP's mean-of-rank-means
    — the reference's training semantics, distributed.py:196-212) and
    batch-norm statistics are shard-local per step, exactly DDP's
    per-rank BatchNorm; the running stats are cross-device averaged
    before being stored (better than DDP, which saves rank 0's). Dropout
    masks decorrelate across devices by folding the axis index into the
    step rng.

    Returns step(state, batch, rng) -> (new_state, losses), jitted with
    the donated state pinned to its committed layout.
    """
    import optax
    from jax.sharding import PartitionSpec

    assert mesh.shape.get("tp", 1) == 1 and mesh.shape.get("sp", 1) == 1, (
        "manual ZeRO-1 trains over dp only — use a pure-dp mesh "
        f"(got {dict(mesh.shape)})")
    opt_name = str(train_cfg.get("optim", "adamw"))
    assert opt_name in _ELEMENTWISE_OPTIMS, (
        f"manual ZeRO-1 supports elementwise optimizers only; got "
        f"{opt_name!r}")
    dp = mesh.shape["dp"]
    max_norm = train_cfg.get("grad_norm", None)
    tx_core = state.tx

    specs = zero1_param_specs(state.params, mesh)
    dims = jax.tree_util.tree_map(_dp_dim, specs, is_leaf=_IS_P)
    opt_specs = jax.tree_util.tree_map(
        lambda l: l.sharding.spec if hasattr(l, "sharding") else P(),
        state.opt_state)

    def body(params, bstats, opt_state, batch, drng, srng):
        didx = jax.lax.axis_index("dp")

        def compute(p):
            preds, mutated = model.apply(
                {"params": p, "batch_stats": bstats}, batch,
                deterministic=False,
                rngs={"dropout": jax.random.fold_in(drng, didx),
                      "shuffle": jax.random.fold_in(srng, didx)},
                mutable=["batch_stats"])
            losses = loss_fn(preds, batch)
            return losses["total"], (losses, mutated)

        (_, (losses, mutated)), grads = jax.value_and_grad(
            compute, has_aux=True)(params)

        # partial local grads -> this device's shard of the MEAN gradient
        def rs(g, d):
            g = g / dp
            if d < 0:
                return jax.lax.psum(g, "dp")
            return jax.lax.psum_scatter(g, "dp", scatter_dimension=d,
                                        tiled=True)

        g_shards = jax.tree_util.tree_map(rs, grads, dims)

        def local_sq(g, d):
            s = jnp.sum(jnp.square(g.astype(jnp.float32)))
            return s if d >= 0 else s / dp

        sq = sum(jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(local_sq, g_shards, dims)))
        gnorm = jnp.sqrt(jax.lax.psum(sq, "dp"))
        if max_norm:
            scale = jnp.float32(max_norm) / jnp.maximum(gnorm, max_norm)
            g_shards = jax.tree_util.tree_map(
                lambda g: (g * scale).astype(g.dtype), g_shards)

        p_shards = jax.tree_util.tree_map(
            lambda p, d: _shard_slice(p, d, didx, dp), params, dims)
        updates, new_opt = tx_core.update(g_shards, opt_state, p_shards)

        def ag(u, d):
            if d < 0:
                return u
            return jax.lax.all_gather(u, "dp", axis=d, tiled=True)

        updates = jax.tree_util.tree_map(ag, updates, dims)
        new_params = optax.apply_updates(params, updates)
        new_bstats = jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, "dp"), mutated["batch_stats"])
        losses = {k: jax.lax.pmean(v, "dp") for k, v in losses.items()}
        return new_params, new_bstats, new_opt, losses

    rep = PartitionSpec()

    def step(state, batch, rng):
        drng, srng = jax.random.split(jax.random.fold_in(rng, state.step))
        batch_specs = {
            k: P("dp") if (getattr(v, "ndim", 0) >= 1
                           and v.shape[0] % dp == 0) else rep
            for k, v in batch.items()}
        # rep entries are pytree PREFIXES: the whole params/batch_stats/
        # losses subtrees are replicated
        new_params, new_bstats, new_opt, losses = shard_map(
            body, mesh=mesh,
            in_specs=(rep, rep, opt_specs, batch_specs, rep, rep),
            out_specs=(rep, rep, opt_specs, rep),
            check_vma=False,
        )(state.params, state.batch_stats, state.opt_state, batch,
          drng, srng)
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            opt_state=new_opt, batch_stats=new_bstats)
        return new_state, losses

    return jax.jit(step, donate_argnums=(0,))
