"""Tensor-parallel sharding: Megatron column/row rules over the mesh 'tp' axis.

The reference has no TP (SURVEY.md §2c — its model is single-GPU sized); the
TPU build adds it as a first-class option. These tests verify on the virtual
8-device CPU mesh that (a) the path rules shard exactly the intended weight
pairs, and (b) a dp x tp train step computes the same losses as pure DP.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robot3dlotus_tpu.parallel.mesh import (
    make_mesh, shard_batch, state_shardings, tp_leaf_spec,
)
from robot3dlotus_tpu.models.simple_policy import SimplePolicyTPU, compute_loss
from robot3dlotus_tpu.train.trainer import create_train_state, make_train_step

TINY_PTV3 = dict(
    in_channels=7, orders=("z", "z-trans"),
    enc_depths=(1, 1), enc_channels=(16, 32), enc_num_head=(2, 2),
    enc_patch_size=(16, 16), stride=(2,),
    dec_depths=(1,), dec_channels=(16,), dec_num_head=(2,),
    dec_patch_size=(16,),
    qkv_bias=True, qk_norm=True, attn_drop=0.0, proj_drop=0.0,
    shuffle_orders=False, serial_depth=5, stem_kernel=3,
)
TINY_ACT = dict(
    voxel_size=0.01, context_channels=32, txt_ft_size=512,
    use_ee_pose=False, use_step_id=False, max_steps=30,
    reduce="max", dim_actions=7,
    pos_pred_type="heatmap_disc", pos_heatmap_temp=0.1,
    rot_pred_type="euler_disc", dropout=0.0,
    pos_bins=3, pos_bin_size=0.01, best_disc_pos="max",
    euler_resolution=5,
)
LOSS_CFG = dict(pos_weight=1.0, rot_weight=1.0)
TRAIN_CFG = dict(learning_rate=1e-4, lr_sched="cosine", warmup_steps=10,
                 num_train_steps=100, weight_decay=0.05, grad_norm=10,
                 optim="adamw", betas=[0.9, 0.98])


def _batch(B=4, N=64, T=4, seed=0):
    import __graft_entry__ as g
    return g._fake_batch(B=B, N=N, T=T, pos_bins=3, seed=seed)


def test_tp_rules_target_the_weight_pairs():
    class FakeLeaf:
        def __init__(self, shape):
            self.shape = shape
            self.ndim = len(shape)

    class Key:
        def __init__(self, k):
            self.key = k

    def spec(path, shape):
        return tp_leaf_spec([Key(p) for p in path.split("/")],
                            FakeLeaf(shape), tp_size=2)

    # column-parallel: output axis sharded
    assert spec("enc0/block0/mlp/fc1/kernel", (16, 64)) == \
        jax.sharding.PartitionSpec(None, "tp")
    assert spec("enc0/block0/mlp/fc1/bias", (64,)) == \
        jax.sharding.PartitionSpec("tp")
    assert spec("enc0/block0/cpe_conv/weight", (27, 16, 16)) == \
        jax.sharding.PartitionSpec(None, None, "tp")
    # row-parallel: input axis sharded
    assert spec("enc0/block0/mlp/fc2/kernel", (64, 16)) == \
        jax.sharding.PartitionSpec("tp", None)

    # replicated: attention, norms, odd shapes
    assert spec("enc0/block0/attn/qkv/kernel", (16, 48)) == \
        jax.sharding.PartitionSpec()
    assert spec("enc0/block0/norm1/scale", (16,)) == \
        jax.sharding.PartitionSpec()
    # indivisible dims stay replicated
    assert spec("enc0/block0/mlp/fc1/kernel", (16, 63)) == \
        jax.sharding.PartitionSpec()


def test_cpe_fc_row_spec():
    class FakeLeaf:
        shape = (16, 32)
        ndim = 2

    class Key:
        def __init__(self, k):
            self.key = k

    path = [Key(p) for p in "enc0/block0/cpe_fc/kernel".split("/")]
    assert tp_leaf_spec(path, FakeLeaf(), 2) == \
        jax.sharding.PartitionSpec("tp", None)


@pytest.mark.slow
def test_dp_tp_step_matches_pure_dp():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    devices = jax.devices()[:4]
    batch = _batch(B=4)
    model = SimplePolicyTPU(ptv3_cfg=TINY_PTV3, act_cfg=TINY_ACT,
                            variant="adanorm")
    rng = jax.random.PRNGKey(0)

    losses = {}
    states = {}
    for name, tp in [("dp", 1), ("dptp", 2)]:
        mesh = make_mesh(devices, tp=tp)
        state, _ = create_train_state(model, batch, TRAIN_CFG, rng, mesh=mesh)
        if tp > 1:
            n_tp = sum(1 for leaf in jax.tree_util.tree_leaves(state.params)
                       if "tp" in tuple(leaf.sharding.spec))
            assert n_tp >= 8, "expected MLP+CPE pairs sharded over tp"
        step = make_train_step(
            model, lambda p, b: compute_loss(p, b, TINY_ACT, LOSS_CFG),
            mesh=mesh, donate=False)
        state2, ls = step(state, shard_batch(batch, mesh), rng)
        losses[name] = {k: float(v) for k, v in ls.items()}
        states[name] = state2

    for k in losses["dp"]:
        np.testing.assert_allclose(
            losses["dp"][k], losses["dptp"][k], rtol=2e-4,
            err_msg=f"loss '{k}' diverges between DP and DPxTP")

    # updated params agree too (gather the tp-sharded ones)
    p_dp = jax.tree_util.tree_leaves(states["dp"].params)
    p_tp = jax.tree_util.tree_leaves(states["dptp"].params)
    worst = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                      jax.device_get(b).astype(np.float32))))
                for a, b in zip(p_dp, p_tp))
    assert worst < 5e-5, f"param divergence {worst}"
