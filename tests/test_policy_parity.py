"""END-TO-END action parity vs the ACTUAL reference policy.

Builds the reference SimplePolicyPTV3AdaNorm (simple_policy_ptv3.py:160-306)
on CPU via the torch shims, converts its randomly-initialized weights with
torch_convert, runs both policies on the same clouds + instruction embedding,
and compares the FINAL (B, 8) actions — including the reference's host-side
disc-position argmax decode and discrete-euler-to-quaternion conversion
against our fully on-device decode.

This extends tests/test_forward_parity.py (backbone features) to the
complete north-star claim: same checkpoint -> same actions. It also
exercises the PDNorm adaptive-norm path (pdnorm_adaptive=True,
pdnorm_decouple=False — the released AdaNorm configuration,
simple_policy_ptv3.yaml:122-128) against our AdaptiveNorm.
"""
import sys

from conftest import add_reference_to_path, reference_available

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tests")
import torch_ref_shims as shims
from test_forward_parity import surface_cloud

from robot3dlotus_tpu.models.simple_policy import (
    SimplePolicyTPU, decode_actions,
)
from robot3dlotus_tpu.train.torch_convert import torch_to_flax

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not reference_available(), reason="golden-parity vs the upstream checkout; no reference present")]  # compile-heavy golden-parity tier

CTX = 20
TXT_FT = 32

TPU_PTV3 = dict(
    in_channels=6,
    orders=("z", "z-trans", "hilbert", "hilbert-trans"),
    stride=(2, 2, 2, 2),
    # 5 stages: the reference action head hard-indexes 5 decoder outputs
    # (simple_policy_ptv3.py:243)
    enc_depths=(1, 1, 1, 1, 1), enc_channels=(8, 8, 16, 16, 16),
    enc_num_head=(2, 2, 2, 2, 2), enc_patch_size=(16, 16, 16, 16, 16),
    dec_depths=(1, 1, 1, 1), dec_channels=(8, 8, 16, 16),
    dec_num_head=(2, 2, 2, 2), dec_patch_size=(16, 16, 16, 16),
    mlp_ratio=4.0, qkv_bias=True, qk_norm=True,
    attn_drop=0.0, proj_drop=0.0, drop_path=0.0,
    shuffle_orders=False, serial_depth=6, stem_kernel=5,
    pdnorm_adaptive=True,
)
TPU_ACT = dict(
    voxel_size=1.0,  # test clouds are integer voxel coords
    context_channels=CTX, txt_ft_size=TXT_FT,
    txt_reduce="mean", use_ee_pose=False, use_step_id=False, max_steps=30,
    reduce="max", dim_actions=7,
    pos_pred_type="heatmap_disc", pos_heatmap_temp=0.1,
    rot_pred_type="euler_disc", dropout=0.0,
    pos_bins=4, pos_bin_size=0.01, best_disc_pos="max",
    euler_resolution=5,
)


def _ref_config():
    A = shims.AttrDict
    return A(
        ptv3_config=A(
            in_channels=6,
            order=list(TPU_PTV3["orders"]),
            stride=list(TPU_PTV3["stride"]),
            enc_depths=list(TPU_PTV3["enc_depths"]),
            enc_channels=list(TPU_PTV3["enc_channels"]),
            enc_num_head=list(TPU_PTV3["enc_num_head"]),
            enc_patch_size=list(TPU_PTV3["enc_patch_size"]),
            dec_depths=list(TPU_PTV3["dec_depths"]),
            dec_channels=list(TPU_PTV3["dec_channels"]),
            dec_num_head=list(TPU_PTV3["dec_num_head"]),
            dec_patch_size=list(TPU_PTV3["dec_patch_size"]),
            mlp_ratio=4.0, qkv_bias=True, qk_scale=None, qk_norm=True,
            attn_drop=0.0, proj_drop=0.0, drop_path=0.0,
            pre_norm=True, shuffle_orders=False,
            enable_rpe=False, enable_flash=False,
            upcast_attention=True, upcast_softmax=True,
            cls_mode=False,
            # released AdaNorm configuration (simple_policy_ptv3.yaml:122-128)
            pdnorm_bn=True, pdnorm_ln=True, pdnorm_decouple=False,
            pdnorm_adaptive=True, pdnorm_affine=True, pdnorm_conditions=None,
            pdnorm_context_channels=CTX,
        ),
        action_config=A(
            txt_ft_size=TXT_FT, context_channels=CTX, txt_reduce="mean",
            use_ee_pose=False, use_step_id=False, max_steps=30,
            reduce="max", dim_actions=7,
            pos_pred_type="heatmap_disc", pos_heatmap_temp=0.1,
            rot_pred_type="euler_disc", dropout=0.0,
            voxel_size=1.0, pos_bins=4, pos_bin_size=0.01,
            best_disc_pos="max", euler_resolution=5,
        ),
    )


def test_policy_action_parity_adanorm():
    shims.install()
    add_reference_to_path()
    from genrobo3d.models import simple_policy_ptv3 as ref_sp

    torch.manual_seed(3)
    ref = ref_sp.SimplePolicyPTV3AdaNorm(_ref_config())
    ref.eval()

    rng_np = np.random.RandomState(11)
    clouds = [surface_cloud(rng_np, 13, 14), surface_cloud(rng_np, 16, 16)]
    feats = [rng_np.randn(len(g), 6).astype(np.float32) for g in clouds]
    for g, f in zip(clouds, feats):
        f[:, :3] = g  # reference reads coords from pc_fts[:, :3]
    txt = rng_np.randn(2, TXT_FT).astype(np.float32)  # pre-reduced (mean)

    ref_batch = {
        "pc_fts": torch.from_numpy(np.concatenate(feats)),
        "offset": torch.tensor(np.cumsum([len(g) for g in clouds])),
        "npoints_in_batch": [len(g) for g in clouds],
        "txt_embeds": torch.from_numpy(txt),
    }
    with torch.no_grad():
        ref_actions = ref(ref_batch, compute_loss=False,
                          compute_final_action=True).numpy()

    # --- ours: same weights, padded batch, on-device decode
    cap = 256
    B = len(clouds)
    pc = np.zeros((B, cap, 6), np.float32)
    mask = np.zeros((B, cap), bool)
    counts = np.zeros(B, np.int32)
    for i, f in enumerate(feats):
        pc[i, :len(f)] = f
        mask[i, :len(f)] = True
        counts[i] = len(f)
    my_batch = {
        "pc_fts": jnp.asarray(pc), "pc_mask": jnp.asarray(mask),
        "pc_counts": jnp.asarray(counts),
        # a single token equal to the reference's pre-reduced embedding:
        # masked mean of one token == that token, and Linear commutes
        "txt_embeds": jnp.asarray(txt[:, None, :]),
        "txt_mask": jnp.ones((B, 1), bool),
        "ee_poses": jnp.zeros((B, 8), jnp.float32),
        "step_ids": jnp.zeros((B,), jnp.int32),
    }
    model = SimplePolicyTPU(ptv3_cfg=TPU_PTV3, act_cfg=TPU_ACT,
                            variant="adanorm")
    model_cfg = {
        "model_class": "SimplePolicyPTV3AdaNorm",
        "ptv3_config": dict(TPU_PTV3),
        "action_config": dict(TPU_ACT),
    }
    params_tree, bstats_tree, missing, unexpected = torch_to_flax(
        {k: v for k, v in ref.state_dict().items()}, model_cfg)
    assert not unexpected, unexpected

    from conftest import abstract_init
    key = jax.random.PRNGKey(0)
    variables = abstract_init(
        model, {"params": key, "dropout": key, "shuffle": key},
        my_batch, deterministic=True)

    def _merge(dst, src, path=""):
        for k, v in src.items():
            assert k in dst, f"missing {path}/{k} in target tree"
            if isinstance(v, dict):
                _merge(dst[k], v, f"{path}/{k}")
            else:
                assert dst[k].shape == v.shape, \
                    f"{path}/{k}: {dst[k].shape} vs {v.shape}"
                dst[k] = jnp.asarray(v)

    _merge(variables["params"], params_tree)
    if bstats_tree:
        _merge(variables["batch_stats"], bstats_tree)

    preds = model.apply(variables, my_batch, deterministic=True)
    my_actions = np.asarray(decode_actions(preds, TPU_ACT))

    # positions exact to decode tolerance; quats identical bins -> identical
    # values; open is the raw logit on both sides
    np.testing.assert_allclose(my_actions[:, :3], ref_actions[:, :3],
                               atol=1e-4, rtol=1e-4, err_msg="position")
    np.testing.assert_allclose(my_actions[:, 3:7], ref_actions[:, 3:7],
                               atol=1e-5, err_msg="rotation quaternion")
    np.testing.assert_allclose(my_actions[:, 7], ref_actions[:, 7],
                               atol=1e-4, err_msg="open logit")


def test_motion_planner_action_parity_ca():
    """Same end-to-end check for the RELEASED motion-planner configuration
    (MotionPlannerPTV3CA, train_3dlotusplus_motion_planner.sh:94-98:
    cross-attention conditioning, plain norms, txt_reduce 'attn' [a dead
    txt_attn_fc in the CA class], use_ee_pose False): per-trajectory-step
    disc-position decode + euler-disc quats + stop bits."""
    shims.install()
    add_reference_to_path()
    from genrobo3d.models import motion_planner_ptv3 as ref_mp
    from robot3dlotus_tpu.models.motion_planner import (
        MotionPlannerTPU, decode_mp_actions,
    )

    L = 3               # max_traj_len
    LBL = 4             # pc_label_channels
    TE = 8              # traj_embed_size
    A = shims.AttrDict
    ref_cfg = A(
        ptv3_config=A(
            in_channels=6,  # reference mutates this += pc_label_channels
            order=list(TPU_PTV3["orders"]), stride=list(TPU_PTV3["stride"]),
            enc_depths=list(TPU_PTV3["enc_depths"]),
            enc_channels=list(TPU_PTV3["enc_channels"]),
            enc_num_head=list(TPU_PTV3["enc_num_head"]),
            enc_patch_size=list(TPU_PTV3["enc_patch_size"]),
            dec_depths=list(TPU_PTV3["dec_depths"]),
            dec_channels=list(TPU_PTV3["dec_channels"]),
            dec_num_head=list(TPU_PTV3["dec_num_head"]),
            dec_patch_size=list(TPU_PTV3["dec_patch_size"]),
            mlp_ratio=4.0, qkv_bias=True, qk_scale=None, qk_norm=True,
            attn_drop=0.0, proj_drop=0.0, drop_path=0.0,
            pre_norm=True, shuffle_orders=False,
            enable_rpe=False, enable_flash=False,
            upcast_attention=True, upcast_softmax=True, cls_mode=False,
            pdnorm_bn=False, pdnorm_ln=False, pdnorm_decouple=True,
            pdnorm_adaptive=False, pdnorm_affine=True,
            pdnorm_conditions=None,
            ctx_channels=CTX, add_coords_in_attn="none",
        ),
        action_config=A(
            txt_ft_size=TXT_FT, context_channels=CTX, txt_reduce="attn",
            use_ee_pose=False, max_steps=30,
            reduce="max", dim_actions=7, max_traj_len=L,
            pc_label_channels=LBL, traj_embed_size=TE,
            pos_pred_type="heatmap_disc", pos_heatmap_temp=0.1,
            rot_pred_type="euler_disc", dropout=0.0,
            voxel_size=1.0, pos_bins=4, pos_bin_size=0.01,
            best_disc_pos="max", euler_resolution=5,
        ),
    )
    torch.manual_seed(5)
    ref = ref_mp.MotionPlannerPTV3CA(ref_cfg)
    ref.eval()

    rng_np = np.random.RandomState(13)
    clouds = [surface_cloud(rng_np, 13, 14), surface_cloud(rng_np, 16, 16)]
    feats = [rng_np.randn(len(g), 6).astype(np.float32) for g in clouds]
    labels = [rng_np.randint(0, 4, len(g)) for g in clouds]
    for g, f in zip(clouds, feats):
        f[:, :3] = g
    ctx_lens = [3, 5]
    ctxs = [rng_np.randn(t, TXT_FT).astype(np.float32) for t in ctx_lens]

    ref_batch = {
        "pc_fts": torch.from_numpy(np.concatenate(feats)),
        "pc_labels": torch.from_numpy(np.concatenate(labels)),
        "offset": torch.tensor(np.cumsum([len(g) for g in clouds])),
        "npoints_in_batch": [len(g) for g in clouds],
        "txt_embeds": torch.from_numpy(np.concatenate(ctxs)),
        "txt_lens": ctx_lens,
    }
    with torch.no_grad():
        ref_actions = ref(ref_batch, compute_loss=False,
                          compute_final_action=True).numpy()  # (B, L, 9)

    # ours
    cap = 256
    B = len(clouds)
    pc = np.zeros((B, cap, 6), np.float32)
    lbl = np.zeros((B, cap), np.int32)
    mask = np.zeros((B, cap), bool)
    counts = np.zeros(B, np.int32)
    for i, (f, lb) in enumerate(zip(feats, labels)):
        pc[i, :len(f)] = f
        lbl[i, :len(lb)] = lb
        mask[i, :len(f)] = True
        counts[i] = len(f)
    T = max(ctx_lens)
    txt = np.zeros((B, T, TXT_FT), np.float32)
    tmask = np.zeros((B, T), bool)
    for i, c in enumerate(ctxs):
        txt[i, :len(c)] = c
        tmask[i, :len(c)] = True
    my_batch = {
        "pc_fts": jnp.asarray(pc), "pc_labels": jnp.asarray(lbl),
        "pc_mask": jnp.asarray(mask), "pc_counts": jnp.asarray(counts),
        "txt_embeds": jnp.asarray(txt), "txt_mask": jnp.asarray(tmask),
        "ee_poses": jnp.zeros((B, 8), jnp.float32),
        "step_ids": jnp.zeros((B,), jnp.int32),
    }
    act = dict(TPU_ACT, txt_reduce="attn", max_traj_len=L,
               pc_label_channels=LBL, traj_embed_size=TE)
    model = MotionPlannerTPU(ptv3_cfg=TPU_PTV3, act_cfg=act, variant="ca")
    model_cfg = {
        "model_class": "MotionPlannerPTV3CA",
        "ptv3_config": dict(TPU_PTV3),
        "action_config": dict(act),
    }
    params_tree, bstats_tree, missing, unexpected = torch_to_flax(
        dict(ref.state_dict()), model_cfg)
    assert not unexpected, unexpected

    from conftest import abstract_init
    key = jax.random.PRNGKey(0)
    variables = abstract_init(
        model, {"params": key, "dropout": key, "shuffle": key},
        my_batch, deterministic=True)

    def _merge(dst, src, path=""):
        for k, v in src.items():
            assert k in dst, f"missing {path}/{k} in target tree"
            if isinstance(v, dict):
                _merge(dst[k], v, f"{path}/{k}")
            else:
                assert dst[k].shape == v.shape, \
                    f"{path}/{k}: {dst[k].shape} vs {v.shape}"
                dst[k] = jnp.asarray(v)

    _merge(variables["params"], params_tree)
    if bstats_tree:
        _merge(variables["batch_stats"], bstats_tree)

    preds = model.apply(variables, my_batch, deterministic=True)
    my_actions = np.asarray(decode_mp_actions(preds, act))  # (B, L, 9)

    np.testing.assert_allclose(my_actions[..., :3], ref_actions[..., :3],
                               atol=1e-4, rtol=1e-4, err_msg="positions")
    # q and -q are the same rotation; scipy's as_quat does not canonicalize
    # the sign, so compare up to a per-quaternion global sign
    qa, qb = my_actions[..., 3:7], ref_actions[..., 3:7]
    diff = np.minimum(np.abs(qa - qb).max(-1), np.abs(qa + qb).max(-1))
    assert float(diff.max()) < 1e-5, f"quaternion mismatch: {diff.max()}"
    np.testing.assert_allclose(my_actions[..., 7:], ref_actions[..., 7:],
                               atol=1e-4, err_msg="open/stop logits")
