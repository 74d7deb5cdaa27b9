"""Smoke + contract tests for the SimplePolicy model: init, forward, loss,
grads finite, decode shapes — the TPU analogue of the reference fake-batch
__main__ contract (simple_policy_ptv3.py:466-485)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robot3dlotus_tpu.models.simple_policy import (
    SimplePolicyTPU, compute_loss, decode_actions,
)

pytestmark = pytest.mark.slow  # compile-heavy: builds/applies policy-scale models

# 3 stages / k=3 stem: enough to exercise pooling, the U-net decoder, and
# both conditioning variants while compiling in seconds on this 1-core host
# (the release-scale structure is covered by test_forward_parity and the
# driver's entry() compile check)
PTV3_CFG = dict(
    in_channels=6,
    enc_depths=(1, 1, 1),
    enc_channels=(16, 32, 32),
    enc_num_head=(2, 4, 4),
    enc_patch_size=(32, 32, 32),
    dec_depths=(1, 1),
    dec_channels=(16, 16),
    dec_num_head=(2, 2),
    dec_patch_size=(32, 32),
    qk_norm=True,
    attn_drop=0.1, proj_drop=0.1, drop_path=0.0,
    shuffle_orders=True,
    serial_depth=6, stem_kernel=3,
)
ACT_CFG = dict(
    voxel_size=0.01, context_channels=64, txt_ft_size=128,
    use_ee_pose=False, use_step_id=False, max_steps=30,
    reduce="max", dim_actions=7,
    pos_pred_type="heatmap_disc", pos_heatmap_temp=0.1,
    rot_pred_type="euler_disc", dropout=0.1,
    pos_bins=10, pos_bin_size=0.01, best_disc_pos="max",
    euler_resolution=5,
)
LOSS_CFG = dict(pos_weight=1.0, rot_weight=1.0)


def fake_batch(B=2, N=256, T=5, cin=6, pos_bins=10, seed=0):
    rng = np.random.RandomState(seed)
    counts = np.array([N - 56, N][:B] + [N] * max(0, B - 2))
    mask = np.arange(N)[None] < counts[:, None]
    pc = rng.uniform(-0.3, 0.3, (B, N, cin)).astype(np.float32)
    pc[~mask] = 0
    txt = rng.randn(B, T, 128).astype(np.float32)
    txt_mask = np.ones((B, T), bool)
    txt_mask[0, 3:] = False
    gt = np.zeros((B, 7), np.float32)
    gt[:, :3] = rng.uniform(-0.2, 0.2, (B, 3))
    gt[:, 3:6] = rng.randint(0, 72, (B, 3))
    gt[:, 6] = rng.randint(0, 2, B)
    probs = rng.rand(B, 3, N * 2 * pos_bins).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    q = rng.randn(B, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    ee = np.concatenate([rng.randn(B, 3).astype(np.float32), q,
                         rng.randint(0, 2, (B, 1)).astype(np.float32)], -1)
    return {
        "pc_fts": jnp.asarray(pc), "pc_mask": jnp.asarray(mask),
        "pc_counts": jnp.asarray(counts.astype(np.int32)),
        "txt_embeds": jnp.asarray(txt), "txt_mask": jnp.asarray(txt_mask),
        "ee_poses": jnp.asarray(ee),
        "step_ids": jnp.zeros((B,), jnp.int32),
        "gt_actions": jnp.asarray(gt),
        "disc_pos_probs": jnp.asarray(probs),
    }


@pytest.mark.parametrize("variant", ["ca", "adanorm"])
def test_forward_loss_grads(variant):
    act = dict(ACT_CFG)
    if variant == "adanorm":
        act["use_ee_pose"] = True
    model = SimplePolicyTPU(ptv3_cfg=PTV3_CFG, act_cfg=act, variant=variant)
    batch = fake_batch()
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "dropout": key, "shuffle": key},
        batch, deterministic=True)

    def loss_fn(params):
        preds, mutated = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, deterministic=False,
            rngs={"dropout": key, "shuffle": key},
            mutable=["batch_stats"])
        return compute_loss(preds, batch, act, LOSS_CFG)["total"]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss)), loss
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_eval_decode_shapes_and_padding_invariance():
    model = SimplePolicyTPU(ptv3_cfg=PTV3_CFG, act_cfg=ACT_CFG, variant="ca")
    batch = fake_batch()
    key = jax.random.PRNGKey(1)
    variables = model.init(
        {"params": key, "dropout": key, "shuffle": key},
        batch, deterministic=True)

    preds = model.apply(variables, batch, deterministic=True)
    actions = decode_actions(preds, ACT_CFG)
    assert actions.shape == (2, 8)
    a = np.asarray(actions)
    assert np.isfinite(a).all()
    # quaternion is unit
    np.testing.assert_allclose(
        np.linalg.norm(a[:, 3:7], axis=-1), 1.0, atol=1e-5)

    # padding invariance: garbage in padded slots must not change outputs
    batch2 = dict(batch)
    pc = np.asarray(batch["pc_fts"]).copy()
    mask = np.asarray(batch["pc_mask"])
    pc[~mask] = 777.0
    batch2["pc_fts"] = jnp.asarray(pc)
    preds2 = model.apply(variables, batch2, deterministic=True)
    a2 = np.asarray(decode_actions(preds2, ACT_CFG))
    np.testing.assert_allclose(a, a2, atol=2e-4)


def test_bfloat16_compute_path_close_to_fp32():
    """compute_dtype='bfloat16' must keep the identical param tree and
    produce outputs close to the fp32 path (same weights)."""
    tiny = dict(
        in_channels=6, orders=("z", "z-trans"), enc_depths=(1, 1),
        enc_channels=(16, 32), enc_num_head=(2, 2), enc_patch_size=(16, 16),
        stride=(2,), dec_depths=(1,), dec_channels=(16,), dec_num_head=(2,),
        dec_patch_size=(16,), qk_norm=True, attn_drop=0.0, proj_drop=0.0,
        shuffle_orders=False, serial_depth=5, stem_kernel=3)
    act = dict(ACT_CFG, dropout=0.0)
    batch = fake_batch(B=2, N=64, T=4)
    key = jax.random.PRNGKey(0)
    m32 = SimplePolicyTPU(ptv3_cfg=tiny, act_cfg=act, variant="ca")
    mbf = SimplePolicyTPU(ptv3_cfg=dict(tiny, compute_dtype="bfloat16"),
                          act_cfg=act, variant="ca")
    v = jax.jit(lambda b: m32.init(
        {"params": key, "dropout": key, "shuffle": key},
        b, deterministic=True))(batch)
    vb = jax.eval_shape(lambda b: mbf.init(
        {"params": key, "dropout": key, "shuffle": key},
        b, deterministic=True), batch)
    assert (jax.tree_util.tree_map(lambda x: x.shape, v)
            == jax.tree_util.tree_map(lambda x: x.shape, vb))

    p32 = jax.jit(lambda v, b: m32.apply(v, b, deterministic=True))(v, batch)
    pbf = jax.jit(lambda v, b: mbf.apply(v, b, deterministic=True))(v, batch)
    for k in ("pos", "rot", "open"):
        a = np.asarray(p32[k], np.float32)
        b = np.asarray(pbf[k], np.float32)
        assert np.asarray(pbf[k]).dtype == np.float32  # heads stay fp32
        scale = np.abs(a).max() + 1e-6
        assert np.abs(a - b).max() / scale < 0.08, k

    l32 = compute_loss(p32, batch, act, LOSS_CFG)["total"]
    lbf = compute_loss(pbf, batch, act, LOSS_CFG)["total"]
    assert abs(float(l32) - float(lbf)) / max(abs(float(l32)), 1e-6) < 0.05


def test_rpe_bias_matches_reference_torch():
    """rpe_bias vs a direct torch port of the reference RPE.forward
    (model.py:307-326): clamp rel coords, axis-strided table lookup, sum."""
    import torch
    from robot3dlotus_tpu.models.layers import rpe_bias

    P, H = 16, 4
    pos_bnd = int((4 * P) ** (1 / 3) * 2)
    rpe_num = 2 * pos_bnd + 1
    rng = np.random.RandomState(0)
    table = rng.randn(3 * rpe_num, H).astype(np.float32)
    rel = rng.randint(-pos_bnd - 3, pos_bnd + 4, (5, P, P, 3)).astype(np.int32)

    ours = np.asarray(rpe_bias(jnp.asarray(table), jnp.asarray(rel), pos_bnd))

    coord = torch.from_numpy(rel)
    idx = (coord.clamp(-pos_bnd, pos_bnd) + pos_bnd
           + torch.arange(3) * rpe_num)
    out = torch.from_numpy(table).index_select(0, idx.reshape(-1))
    ref = out.view(idx.shape + (-1,)).sum(3).numpy()  # (N, P, P, H)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_forward_with_rpe_enabled():
    """enable_rpe=True runs, adds rpe_table params per block, and changes the
    logits relative to the rpe-off model with identical other params."""
    cfg = dict(PTV3_CFG, enable_rpe=True, attn_drop=0.0, shuffle_orders=False)
    model = SimplePolicyTPU(ptv3_cfg=cfg, act_cfg=ACT_CFG, variant="ca")
    batch = fake_batch()
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, batch,
                           deterministic=True)
    tables = [p for p in jax.tree_util.tree_leaves_with_path(
        variables["params"]) if "rpe_table" in jax.tree_util.keystr(p[0])]
    assert len(tables) > 0
    preds = model.apply(variables, batch, deterministic=True)
    assert np.isfinite(np.asarray(preds["pos"])).all()

    # zero tables == rpe-off numerics (the bias enters additively)
    zeroed = jax.tree_util.tree_map_with_path(
        lambda p, x: jnp.zeros_like(x)
        if "rpe_table" in jax.tree_util.keystr(p) else x,
        variables["params"])
    off = SimplePolicyTPU(ptv3_cfg=dict(cfg, enable_rpe=False),
                          act_cfg=ACT_CFG, variant="ca")
    p_zero = model.apply({"params": zeroed,
                          "batch_stats": variables["batch_stats"]},
                         batch, deterministic=True)
    p_off = off.apply({"params": _strip_rpe(variables["params"]),
                       "batch_stats": variables["batch_stats"]},
                      batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(p_zero["pos"]),
                               np.asarray(p_off["pos"]), atol=1e-5)


def _strip_rpe(params):
    import flax
    flat = flax.traverse_util.flatten_dict(params)
    return flax.traverse_util.unflatten_dict(
        {k: v for k, v in flat.items() if "rpe_table" not in k})


@pytest.mark.parametrize("mode", ["qkv", "qk"])
def test_add_coords_in_attn(mode):
    """Coord projection into attention inputs (reference model.py:484-495):
    config accepted, adds coords_proj params, changes outputs, grads flow."""
    cfg = dict(PTV3_CFG, add_coords_in_attn=mode, attn_drop=0.0,
               shuffle_orders=False)
    model = SimplePolicyTPU(ptv3_cfg=cfg, act_cfg=ACT_CFG, variant="ca")
    batch = fake_batch()
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, batch,
                           deterministic=True)
    names = [jax.tree_util.keystr(p) for p, _ in
             jax.tree_util.tree_leaves_with_path(variables["params"])]
    assert any("coords_proj" in n for n in names)
    preds = model.apply(variables, batch, deterministic=True)
    assert np.isfinite(np.asarray(preds["pos"])).all()

    # zeroed projection == 'none' numerics (the projection enters additively)
    zeroed = jax.tree_util.tree_map_with_path(
        lambda p, x: jnp.zeros_like(x)
        if "coords_proj" in jax.tree_util.keystr(p) else x,
        variables["params"])
    import flax
    flat = flax.traverse_util.flatten_dict(zeroed)
    stripped = flax.traverse_util.unflatten_dict(
        {k: v for k, v in flat.items() if "coords_proj" not in k})
    off = SimplePolicyTPU(ptv3_cfg=dict(cfg, add_coords_in_attn="none"),
                          act_cfg=ACT_CFG, variant="ca")
    p_zero = model.apply({"params": zeroed,
                          "batch_stats": variables["batch_stats"]},
                         batch, deterministic=True)
    p_off = off.apply({"params": stripped,
                       "batch_stats": variables["batch_stats"]},
                      batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(p_zero["pos"]),
                               np.asarray(p_off["pos"]), atol=1e-5)


def test_ptv3_config_strictness():
    """Unknown truthy ptv3_config keys must raise (a reference-dumped
    training_config.yaml enabling an unimplemented option must never load
    silently); unknown falsy keys and known-ignored keys are tolerated."""
    import pytest
    from robot3dlotus_tpu.models.simple_policy import ptv3_kwargs

    base = {"enc_depths": [1, 1], "enable_flash": True, "cls_mode": False,
            "pdnorm_bn": True, "some_future_flag": False,
            "order": ["z", "hilbert"]}
    kw = ptv3_kwargs(base)
    assert kw["orders"] == ("z", "hilbert")
    assert kw["enc_depths"] == (1, 1)
    assert "enable_flash" not in kw and "pdnorm_bn" not in kw

    with pytest.raises(ValueError, match="unknown ptv3_config option"):
        ptv3_kwargs(dict(base, totally_unknown_option=True))
