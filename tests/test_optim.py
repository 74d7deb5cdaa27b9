"""Golden tests for the extra optimizers (RAdam / Ralamb / RangerLars)
against the reference torch implementations (genrobo3d/train/optim/
{radam,ralamb,rangerlars}.py), plus the lr-multiplier param groups
(optim/misc.py:26-32).

12 steps with b2=0.999 crosses the RAdam rectification boundary
(n_sma >= 5 from step 6) and two Lookahead syncs (k=6), so both branches
of every optimizer are exercised.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tests.conftest import add_reference_to_path, reference_available
from robot3dlotus_tpu.train.optim import (
    scale_by_radam_ref, scale_by_ralamb_ref, lookahead_ref,
    _lr_multi_scaler, build_optimizer,
)

LR, WD, B1, B2 = 0.05, 0.01, 0.9, 0.999
STEPS = 12


def _problem(seed=0):
    rng = np.random.RandomState(seed)
    params = {"w": rng.randn(4, 3).astype(np.float32),
              "bias": rng.randn(3).astype(np.float32)}
    grads = [
        {"w": rng.randn(4, 3).astype(np.float32),
         "bias": rng.randn(3).astype(np.float32)}
        for _ in range(STEPS)]
    return params, grads


def _torch_trajectory(opt_name):
    import torch
    import sys
    add_reference_to_path()
    from genrobo3d.train.optim.radam import RAdam
    from genrobo3d.train.optim.ralamb import Ralamb
    from genrobo3d.train.optim.rangerlars import RangerLars

    params0, grads = _problem()
    w = torch.nn.Parameter(torch.tensor(params0["w"]))
    b = torch.nn.Parameter(torch.tensor(params0["bias"]))
    groups = [{"params": [w], "weight_decay": WD, "lr": LR},
              {"params": [b], "weight_decay": 0.0, "lr": LR}]
    cls = {"radam": RAdam, "ralamb": Ralamb, "rangerlars": RangerLars}
    opt = cls[opt_name](groups, lr=LR, betas=(B1, B2))
    for g in grads:
        w.grad = torch.tensor(g["w"])
        b.grad = torch.tensor(g["bias"])
        opt.step()
    return {"w": w.detach().numpy(), "bias": b.detach().numpy()}


def _jax_trajectory(opt_name):
    params0, grads = _problem()
    params = jax.tree_util.tree_map(jnp.asarray, params0)
    mask = {"w": True, "bias": False}
    if opt_name == "radam":
        tx = optax.chain(
            scale_by_radam_ref(b1=B1, b2=B2, weight_decay=WD,
                               decay_mask_tree=mask),
            optax.scale_by_learning_rate(LR))
    else:
        tx = scale_by_ralamb_ref(b1=B1, b2=B2, weight_decay=WD,
                                 lr_fn=lambda s: LR, decay_mask_tree=mask)
        if opt_name == "rangerlars":
            tx = lookahead_ref(tx, alpha=0.5, k=6)
    state = tx.init(params)

    @jax.jit
    def step(params, state, g):
        u, state = tx.update(g, state, params)
        return optax.apply_updates(params, u), state

    for g in grads:
        params, state = step(params, state,
                             jax.tree_util.tree_map(jnp.asarray, g))
    return jax.tree_util.tree_map(np.asarray, params)


@pytest.mark.skipif(not reference_available(), reason="no reference")
@pytest.mark.parametrize("opt_name", ["radam", "ralamb", "rangerlars"])
def test_optimizer_matches_reference(opt_name):
    ref = _torch_trajectory(opt_name)
    ours = _jax_trajectory(opt_name)
    for k in ref:
        # fp32 trajectory over 12 steps; the LARS trust ratio amplifies
        # accumulation noise, hence the looser tolerance
        np.testing.assert_allclose(ours[k], ref[k], atol=5e-4, rtol=1e-4)


def test_lr_multi_scaler():
    params = {"rgb_encoder": {"kernel": jnp.ones((2, 2))},
              "head": {"kernel": jnp.ones((2, 2))}}
    tx = _lr_multi_scaler(params, {"rgb_encoder": 10.0})
    u = jax.tree_util.tree_map(jnp.ones_like, params)
    out, _ = tx.update(u, tx.init(params), params)
    assert float(out["rgb_encoder"]["kernel"][0, 0]) == 10.0
    assert float(out["head"]["kernel"][0, 0]) == 1.0


@pytest.mark.parametrize("opt_name",
                         ["adamax", "radam", "ralamb", "rangerlars"])
def test_build_optimizer_dispatch(opt_name):
    params = {"dense": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros(3)}}
    cfg = dict(learning_rate=1e-3, optim=opt_name, weight_decay=0.01,
               grad_norm=5.0, lr_sched="cosine", warmup_steps=2,
               num_train_steps=10, lr_multi={"dense": 2.0})
    tx, sched = build_optimizer(params, cfg)
    state = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    new = params
    for _ in range(4):  # past warmup so the lr is non-negligible
        u, state = tx.update(g, state, new)
        new = optax.apply_updates(new, u)
    k = np.asarray(new["dense"]["kernel"])
    assert np.all(np.isfinite(k))
    assert not np.allclose(k, 1.0)


def test_freeze_params_masks_updates():
    """TRAIN.freeze_params zeroes the frozen backbone subtree's updates
    (reference train_simple_policy.py:120-123 intent, expressed on this
    tree's names): encoder frozen -> enc/stem params unchanged, decoder
    and heads still train; decoder flag freezes dec stages instead."""
    import jax
    import jax.numpy as jnp
    from robot3dlotus_tpu.train.optim import build_optimizer

    params = {
        "ptv3_model": {
            "enc0_block0": {"kernel": jnp.ones((4, 4))},
            "embedding_stem_conv": {"weight": jnp.ones((3, 4))},
            "dec0_up": {"kernel": jnp.ones((4, 4))},
        },
        "act_proj_head": {"kernel": jnp.ones((4, 2))},
    }
    grads = jax.tree.map(jnp.ones_like, params)
    cfg = dict(optim="adamw", learning_rate=1e-2, lr_sched="cosine",
               warmup_steps=0, num_train_steps=100, weight_decay=0.0,
               freeze_params={"encoder": True})
    tx, _ = build_optimizer(params, cfg)
    upd, _ = tx.update(grads, tx.init(params), params)
    assert float(jnp.abs(upd["ptv3_model"]["enc0_block0"]["kernel"]).max()) == 0
    assert float(jnp.abs(
        upd["ptv3_model"]["embedding_stem_conv"]["weight"]).max()) == 0
    assert float(jnp.abs(upd["ptv3_model"]["dec0_up"]["kernel"]).max()) > 0
    assert float(jnp.abs(upd["act_proj_head"]["kernel"]).max()) > 0

    cfg["freeze_params"] = {"decoder": True}
    tx, _ = build_optimizer(params, cfg)
    upd, _ = tx.update(grads, tx.init(params), params)
    assert float(jnp.abs(upd["ptv3_model"]["dec0_up"]["kernel"]).max()) == 0
    assert float(jnp.abs(upd["ptv3_model"]["enc0_block0"]["kernel"]).max()) > 0


def test_fused_adamw_matches_per_leaf_chain():
    """flat_adamw (TRAIN.fused_optim default) must be elementwise-identical
    to the per-leaf optax chain across multiple steps, including the
    global-norm clip, no-decay groups, lr multipliers, and freeze masks
    (association of the clip's norm reduction is the only tolerated
    difference)."""
    rng = np.random.RandomState(0)

    def leaf(*s):
        return jnp.asarray(rng.randn(*s), jnp.float32)

    params = {
        "ptv3_model": {
            "enc0_block0": {"kernel": leaf(8, 16), "bias": leaf(16)},
            "embedding_norm": {"scale": leaf(8), "bias": leaf(8)},
            "dec0_up": {"kernel": leaf(16, 8)},
        },
        "act_proj_head": {"kernel": leaf(16, 4), "bias": leaf(4)},
    }
    cfg = dict(optim="adamw", learning_rate=3e-3, lr_sched="cosine",
               warmup_steps=2, num_train_steps=50, weight_decay=0.05,
               grad_norm=1.0, betas=[0.9, 0.98],
               lr_multi={"act_proj_head": 0.5},
               freeze_params={"decoder": True})
    tx_f, _ = build_optimizer(params, dict(cfg, fused_optim=True))
    tx_c, _ = build_optimizer(params, dict(cfg, fused_optim=False))
    pf = pc = params
    sf, sc = tx_f.init(params), tx_c.init(params)
    import optax
    for step in range(5):
        grads = jax.tree.map(
            lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32) *
            (1.0 + step), params)
        uf, sf = tx_f.update(grads, sf, pf)
        uc, sc = tx_c.update(grads, sc, pc)
        pf = optax.apply_updates(pf, uf)
        pc = optax.apply_updates(pc, uc)
    flat_f = jax.tree_util.tree_leaves(pf)
    flat_c = jax.tree_util.tree_leaves(pc)
    for a, b in zip(flat_f, flat_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)
