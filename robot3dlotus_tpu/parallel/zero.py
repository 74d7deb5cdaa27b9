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
