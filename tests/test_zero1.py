"""ZeRO-1 optimizer-state sharding over the mesh 'dp' axis.

The reference keeps dp full replicas of AdamW moments (DDP all-reduce +
replicated step, train/distributed.py:196-212, train_simple_policy.py:238-244).
The TPU build shards the moments 1/dp two ways (parallel/zero.py docstring):
the GSPMD layout path (state_shardings zero1=True + pinned-output train step)
and the manual shard_map reduce-scatter formulation. These tests verify on
the virtual 8-device CPU mesh that (a) the layouts land where intended and
survive a pinned step, (b) both paths compute exactly what the replicated
optax chain computes, and (c) the manual path emits LITERAL reduce-scatter /
all-gather collectives in its compiled HLO.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from jax.sharding import PartitionSpec as P

from robot3dlotus_tpu.parallel.mesh import (
    make_mesh, shard_batch, state_shardings, zero1_leaf_spec,
)
from robot3dlotus_tpu.parallel.zero import (
    make_manual_zero1_step, zero1_param_specs,
)
from robot3dlotus_tpu.train.optim import build_optimizer

TRAIN_CFG = dict(learning_rate=1e-3, lr_sched="cosine", warmup_steps=2,
                 num_train_steps=100, weight_decay=0.05, grad_norm=5.0,
                 optim="adamw", betas=[0.9, 0.98])


def _toy_params(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "dense": {"kernel": jnp.asarray(rng.randn(16, 8), jnp.float32),
                  "bias": jnp.asarray(rng.randn(8), jnp.float32)},
        # 3 divides no dp size we test -> must stay replicated
        "odd": jnp.asarray(rng.randn(3), jnp.float32),
    }


# ---------------------------------------------------------------- spec rules

def test_zero1_leaf_spec_shards_largest_dp_divisible_dim():
    class Leaf:
        def __init__(self, shape):
            self.shape = shape
            self.ndim = len(shape)

    class Key:
        def __init__(self, k):
            self.key = k

    mesh = make_mesh(jax.devices(), tp=2, sp=1)  # dp=4, tp=2

    def spec(path, shape):
        return zero1_leaf_spec([Key(p) for p in path.split("/")],
                               Leaf(shape), mesh)

    # plain weight: largest dim divisible by dp=4 takes 'dp'
    assert spec("opt_state/0/mu/blk/attn/qkv/kernel", (16, 48)) == \
        P(None, "dp")
    # TP rule wins its dim first; dp takes the largest remaining
    assert spec("opt_state/0/mu/blk/mlp/fc1/kernel", (16, 64)) == \
        P("dp", "tp")
    # no dp-divisible dim -> replicated over dp (correct, just unsharded)
    assert spec("opt_state/0/mu/head/bias", (3,)) == P()
    # scalar-ish 1-dim divisible case
    assert spec("opt_state/0/nu/head/bias", (8,)) == P("dp")


# ------------------------------------------------------------- manual path

def test_manual_zero1_matches_replicated_optax_chain():
    mesh = make_mesh(jax.devices(), tp=1, sp=1)  # dp=8
    params = _toy_params()
    step_fn, opt0 = make_manual_zero1_step(TRAIN_CFG, params, mesh)

    rng = np.random.RandomState(1)
    # per-device PARTIAL gradients: their sum is the full-batch gradient
    gs = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(8, *p.shape), jnp.float32), params)
    new_params, new_opt = jax.jit(step_fn)(gs, opt0, params)

    # reference: the full replicated optax chain (clip_by_global_norm
    # included) on the summed gradient
    tx, _ = build_optimizer(params, TRAIN_CFG)
    full_g = jax.tree_util.tree_map(lambda g: jnp.sum(g, 0), gs)
    upd, _ = tx.update(full_g, tx.init(params), params)
    ref_params = optax.apply_updates(params, upd)

    for got, ref in zip(jax.tree_util.tree_leaves(new_params),
                        jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-6)

    # moments live sharded: every dp-divisible moment leaf carries 'dp'
    dp_leaves = [l for l in jax.tree_util.tree_leaves(new_opt)
                 if hasattr(l, "sharding")
                 and any("dp" in (ax if isinstance(ax, tuple) else (ax,))
                         for ax in tuple(l.sharding.spec))]
    assert len(dp_leaves) >= 4  # mu+nu for kernel and bias


def test_manual_zero1_clip_inactive_below_norm():
    """With the gradient norm under max_norm the clip is a no-op in both
    stacks — guards the shard-local sum-of-squares accounting for
    replicated leaves."""
    mesh = make_mesh(jax.devices(), tp=1, sp=1)
    params = _toy_params()
    cfg = dict(TRAIN_CFG, grad_norm=1e6)
    step_fn, opt0 = make_manual_zero1_step(cfg, params, mesh)
    rng = np.random.RandomState(2)
    gs = jax.tree_util.tree_map(
        lambda p: jnp.asarray(
            rng.randn(8, *p.shape), jnp.float32) * 1e-3, params)
    new_params, _ = jax.jit(step_fn)(gs, opt0, params)
    tx, _ = build_optimizer(params, cfg)
    full_g = jax.tree_util.tree_map(lambda g: jnp.sum(g, 0), gs)
    upd, _ = tx.update(full_g, tx.init(params), params)
    ref_params = optax.apply_updates(params, upd)
    for got, ref in zip(jax.tree_util.tree_leaves(new_params),
                        jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-6)


def test_manual_zero1_emits_literal_reduce_scatter():
    mesh = make_mesh(jax.devices(), tp=1, sp=1)
    params = _toy_params()
    step_fn, opt0 = make_manual_zero1_step(TRAIN_CFG, params, mesh)
    gs = jax.tree_util.tree_map(
        lambda p: jnp.zeros((8,) + p.shape, jnp.float32), params)
    txt = jax.jit(step_fn).lower(gs, opt0, params).compile().as_text()
    assert txt.count("reduce-scatter") > 0, "RS missing from manual ZeRO-1"
    assert txt.count("all-gather") > 0, "update AG missing"


# -------------------------------------------------------------- GSPMD path

def _tiny_model_setup():
    import __graft_entry__ as g
    from robot3dlotus_tpu.models.simple_policy import (
        SimplePolicyTPU, compute_loss,
    )
    ptv3 = dict(
        in_channels=7, orders=("z", "z-trans"),
        enc_depths=(1, 1), enc_channels=(16, 32), enc_num_head=(2, 2),
        enc_patch_size=(16, 16), stride=(2,),
        dec_depths=(1,), dec_channels=(16,), dec_num_head=(2,),
        dec_patch_size=(16,),
        qkv_bias=True, qk_norm=True, attn_drop=0.0, proj_drop=0.0,
        shuffle_orders=False, serial_depth=5, stem_kernel=3,
    )
    act = dict(g.RELEASE_ACT, pos_bins=3, dropout=0.0)
    model = SimplePolicyTPU(ptv3_cfg=ptv3, act_cfg=act, variant="ca")
    batch = g._fake_batch(B=8, N=64, T=4, pos_bins=3, seed=3)
    loss_fn = lambda preds, b: compute_loss(  # noqa: E731
        preds, b, act, dict(pos_weight=1.0, rot_weight=1.0))
    return model, batch, loss_fn


@pytest.mark.slow
def test_gspmd_zero1_layout_and_step_parity():
    """create_train_state(zero1=True) shards the moments over dp; the
    pinned train step preserves that layout AND computes the same losses
    and params as the dp-replicated (zero1=False) run."""
    from robot3dlotus_tpu.train.trainer import (
        create_train_state, make_train_step,
    )
    model, batch, loss_fn = _tiny_model_setup()
    mesh = make_mesh(jax.devices(), tp=1, sp=1)  # dp=8
    rng = jax.random.PRNGKey(0)

    def dp_specs(tree):
        return [
            tuple(l.sharding.spec) for l in jax.tree_util.tree_leaves(tree)
            if hasattr(l, "sharding")]

    results = {}
    for zero1 in (True, False):
        state, _ = create_train_state(model, batch, TRAIN_CFG, rng,
                                      mesh=mesh, zero1=zero1)
        n_dp_opt = sum("dp" in s for s in dp_specs(state.opt_state))
        n_dp_params = sum("dp" in s for s in dp_specs(state.params))
        assert n_dp_params == 0  # params always dp-replicated
        if zero1:
            # fused adamw (the default): the WHOLE moment mass lives in
            # two flat (Tpad,) buffers, both dp-sharded (their pad granule
            # divides any dp <= 4096); the per-leaf chain would instead
            # show one sharded leaf per dp-divisible parameter
            assert n_dp_opt >= 2, f"only {n_dp_opt} dp-sharded moments"
            sharded_bytes = sum(
                l.size * l.dtype.itemsize
                for l in jax.tree_util.tree_leaves(state.opt_state)
                if hasattr(l, "sharding") and "dp" in tuple(l.sharding.spec))
            total_bytes = sum(
                l.size * l.dtype.itemsize
                for l in jax.tree_util.tree_leaves(state.opt_state))
            assert sharded_bytes / total_bytes > 0.95, (
                sharded_bytes, total_bytes)
            pinned = jax.tree_util.tree_map(lambda l: l.sharding, state)
        else:
            assert n_dp_opt == 0
        step = make_train_step(model, loss_fn, mesh=mesh, state=state,
                               donate=False)
        sharded = shard_batch(batch, mesh)
        for _ in range(2):
            state, losses = step(state, sharded, rng)
        if zero1:
            # the pinned output layout survived both steps
            got = jax.tree_util.tree_map(lambda l: l.sharding, state)
            assert jax.tree_util.tree_all(jax.tree_util.tree_map(
                lambda a, b: a == b, got, pinned))
        results[zero1] = (jax.device_get(state.params),
                          float(losses["total"]))

    (p_z, l_z), (p_r, l_r) = results[True], results[False]
    assert abs(l_z - l_r) < 1e-5, (l_z, l_r)
    for a, b in zip(jax.tree_util.tree_leaves(p_z),
                    jax.tree_util.tree_leaves(p_r)):
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)
