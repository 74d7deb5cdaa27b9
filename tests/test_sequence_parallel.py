"""Sequence parallelism: the 'sp' mesh axis shards the cloud point axis of
the pc_* batch tensors (parallel/mesh.py batch_leaf_sharding). Per-point
matmuls and patch-local attention partition cleanly along the serialized
order; the global pieces (argsort, pooling segment reduce, masked BN/pool
statistics) lower to GSPMD collectives, so results are layout-independent —
the slow test proves a dp×sp step matches pure dp bit-for-bit (fp32 CPU).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robot3dlotus_tpu.parallel.mesh import (
    make_mesh, shard_batch, batch_leaf_sharding,
)
from robot3dlotus_tpu.models.simple_policy import (
    SimplePolicyTPU, compute_loss,
)
from robot3dlotus_tpu.train.trainer import create_train_state, make_train_step

from test_tensor_parallel import (
    TINY_PTV3, TINY_ACT, TRAIN_CFG, LOSS_CFG, _batch,
)


def test_batch_leaf_shardings():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(devices[:8], tp=2, sp=2)
    assert dict(mesh.shape) == {"dp": 2, "sp": 2, "tp": 2}
    batch = _batch(B=4)

    sharded = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    for key, v in sharded.items():
        spec = tuple(v.sharding.spec)
        if key.startswith("pc_") and v.ndim >= 2:
            assert spec[:2] == ("dp", "sp"), (key, spec)
        else:
            assert "sp" not in spec, (key, spec)

    # indivisible point axis falls back to dp-only instead of crashing
    odd = np.zeros((4, 31, 3), np.float32)
    sh = batch_leaf_sharding(mesh, "pc_fts", odd)
    assert tuple(sh.spec) == ("dp",)


@pytest.mark.slow
def test_dp_sp_step_matches_pure_dp():
    """One train step on a dp=2,sp=2 mesh must match dp=4 exactly: sp is a
    layout, not an algorithm change."""
    devices = jax.devices()
    if len(devices) < 4:
        pytest.skip("needs >= 4 virtual devices")
    devices = devices[:4]
    batch = _batch(B=4)
    model = SimplePolicyTPU(ptv3_cfg=TINY_PTV3, act_cfg=TINY_ACT,
                            variant="adanorm")
    rng = jax.random.PRNGKey(0)

    losses = {}
    states = {}
    for name, sp in [("dp", 1), ("dpsp", 2)]:
        mesh = make_mesh(devices, sp=sp)
        state, _ = create_train_state(model, batch, TRAIN_CFG, rng, mesh=mesh)
        step = make_train_step(
            model, lambda p, b: compute_loss(p, b, TINY_ACT, LOSS_CFG),
            mesh=mesh, donate=False)
        sharded = shard_batch(batch, mesh)
        if sp > 1:
            n_sp = sum(1 for v in sharded.values()
                       if "sp" in tuple(v.sharding.spec))
            assert n_sp >= 2, "expected pc_* leaves sharded over sp"
        state2, ls = step(state, sharded, rng)
        losses[name] = {k: float(v) for k, v in ls.items()}
        states[name] = state2

    for k in losses["dp"]:
        np.testing.assert_allclose(
            losses["dp"][k], losses["dpsp"][k], rtol=2e-4,
            err_msg=f"loss '{k}' diverges between DP and DPxSP")

    p_dp = jax.tree_util.tree_leaves(states["dp"].params)
    p_sp = jax.tree_util.tree_leaves(states["dpsp"].params)
    worst = max(float(jnp.max(jnp.abs(
        jax.device_get(a).astype(np.float32) -
        jax.device_get(b).astype(np.float32))))
        for a, b in zip(p_dp, p_sp))
    assert worst < 5e-5, f"param divergence {worst}"
