"""3D-LOTUS keystep policy (reference simple_policy_ptv3.py:160-463).

Three conditioning variants behind one module:
  * 'ca'      — SimplePolicyPTV3CA: text tokens (+ optional pose/step tokens)
                via cross-attention blocks (reference :376-431)
  * 'adanorm' — SimplePolicyPTV3AdaNorm: pooled context vector through
                adaptive norms (reference :160-306)
  * 'concat'  — SimplePolicyPTV3Concat: context concatenated to every point
                feature (reference :434-463)

Batch layout (static shapes, masked):
  pc_fts      (B, N, Cin)  xyz+rgb(+height), xyz first 3 dims
  pc_mask     (B, N) bool
  pc_counts   (B,) int32
  txt_embeds  (B, T, txt_ft)
  txt_mask    (B, T) bool
  ee_poses    (B, 8)
  step_ids    (B,) int32
  gt_actions  (B, 8)  — pos(3) + rot(quat 4 or euler-disc bins 3 + pad) + open
  disc_pos_probs (B, 3, N*2*pos_bins) — present when pos_pred_type=heatmap_disc
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import rotation as rotops
from ..ops.pos_codec import best_pos_from_disc_logits, disc_pos_gt_prob_jnp
from .layers import dense, LayerNorm
from .heads import ActionHead
from .ptv3 import PointTransformerV3TPU, host_structure_kwargs


class RobotPoseEmbedding(nn.Module):
    """reference models/base.py:52-78, with the scipy quat->euler host
    round-trip replaced by the on-device rotation codec."""
    hidden_size: int

    @nn.compact
    def __call__(self, actions):
        pos = dense(self.hidden_size, name="pos_embedding")(actions[..., :3])
        open_table = nn.Embed(2, self.hidden_size,
                              embedding_init=nn.initializers.truncated_normal(
                                  0.02), name="open_embedding")
        open_e = open_table(actions[..., -1].astype(jnp.int32))
        euler = rotops.quat_to_euler(actions[..., 3:7])  # radians
        rot_in = jnp.concatenate([jnp.sin(euler), jnp.cos(euler)], axis=-1)
        rot = dense(self.hidden_size, name="rot_embedding")(rot_in)
        return LayerNorm(self.hidden_size, eps=1e-12, name="layer_norm")(
            pos + rot + open_e)


class SimplePolicyTPU(nn.Module):
    ptv3_cfg: Dict[str, Any]
    act_cfg: Dict[str, Any]
    variant: str = "ca"  # ca | adanorm | concat

    @nn.compact
    def __call__(self, batch, deterministic=True):
        ac = self.act_cfg
        ctx_ch = ac["context_channels"]
        B = batch["pc_fts"].shape[0]

        txt_ctx = dense(ctx_ch, name="txt_fc")(batch["txt_embeds"])  # (B,T,C)
        txt_mask = batch["txt_mask"]

        pose_e = step_e = None
        if ac.get("use_ee_pose", False):
            pose_e = RobotPoseEmbedding(ctx_ch, name="pose_embedding")(
                batch["ee_poses"])
        if ac.get("use_step_id", False):
            step_table = nn.Embed(
                ac.get("max_steps", 30), ctx_ch,
                embedding_init=nn.initializers.truncated_normal(0.02),
                name="stepid_embedding")
            step_e = step_table(batch["step_ids"].astype(jnp.int32))

        context = context_mask = context_vec = None
        pc_fts = batch["pc_fts"]
        if self.variant == "ca":
            toks, masks = [txt_ctx], [txt_mask]
            for e in (pose_e, step_e):
                if e is not None:
                    toks.append(e[:, None, :])
                    masks.append(jnp.ones((B, 1), bool))
            context = jnp.concatenate(toks, axis=1)
            context_mask = jnp.concatenate(masks, axis=1)
        else:
            if ac.get("txt_reduce", "mean") == "attn":
                w = dense(1, name="txt_attn_fc")(batch["txt_embeds"])[..., 0]
                w = jnp.where(txt_mask, w, -1e9)
                w = jax.nn.softmax(w, axis=-1)
                context_vec = jnp.einsum("bt,btc->bc", w, txt_ctx)
            else:  # mean over valid tokens (linear commutes with the mean)
                m = txt_mask[..., None].astype(txt_ctx.dtype)
                context_vec = jnp.sum(txt_ctx * m, 1) / \
                    jnp.maximum(jnp.sum(m, 1), 1.0)
            if pose_e is not None:
                context_vec = context_vec + pose_e
            if step_e is not None:
                context_vec = context_vec + step_e
            if self.variant == "concat":
                rep = jnp.broadcast_to(context_vec[:, None, :],
                                       (B, pc_fts.shape[1], ctx_ch))
                pc_fts = jnp.concatenate([pc_fts, rep], axis=-1)

        backbone = PointTransformerV3TPU(
            use_cross_attn=(self.variant == "ca"),
            norm_adaptive=(self.variant == "adanorm"
                           and self.ptv3_cfg.get("pdnorm_adaptive", True)),
            grid_size=ac.get("voxel_size", 0.01),
            name="ptv3_model",
            **ptv3_kwargs(self.ptv3_cfg),
        )
        outs = backbone(
            batch["pc_fts"][..., :3], pc_fts, batch["pc_mask"],
            batch["pc_counts"], context=context, context_mask=context_mask,
            context_vec=None if self.variant == "ca" else context_vec,
            deterministic=deterministic,
            **host_structure_kwargs(batch))

        final = outs[-1]
        head = ActionHead(
            reduce=ac.get("reduce", "max"),
            pos_pred_type=ac.get("pos_pred_type", "heatmap_disc"),
            rot_pred_type=ac.get("rot_pred_type", "euler_disc"),
            hidden_size=list(self.ptv3_cfg["dec_channels"])[0],
            dim_actions=ac.get("dim_actions", 7),
            dropout=ac.get("dropout", 0.0),
            euler_resolution=ac.get("euler_resolution", 5),
            pos_bins=ac.get("pos_bins", 50),
            name="act_proj_head")
        xt, xr, xo = head(
            final["feat"], final["mask"], coords=final["coord"],
            temp=ac.get("pos_heatmap_temp", 1.0), deterministic=deterministic)
        return {
            "pos": xt, "rot": xr, "open": xo,
            "final_coord": final["coord"], "final_mask": final["mask"],
            "sort0": outs[0]["sort0"],
            "dec_layers": outs,
            "pool_overflow": outs[0].get("pool_overflow", 0),
        }


_PTV3_FIELDS = {
    "in_channels", "orders", "stride", "enc_depths", "enc_channels",
    "enc_num_head", "enc_patch_size", "dec_depths", "dec_channels",
    "dec_num_head", "dec_patch_size", "mlp_ratio", "qkv_bias", "qk_scale",
    "qk_norm", "attn_drop", "proj_drop", "drop_path", "pre_norm",
    "shuffle_orders", "upcast_softmax", "upcast_attention",
    "scaled_cosine_attn", "pdnorm_only_decoder", "enable_rpe",
    "add_coords_in_attn", "serial_depth",
    "stem_kernel", "compute_dtype", "attn_impl", "conv_impl", "conv_halo",
    "conv_far_per_tap", "lookup_extent",
    "remat", "assume_sorted", "stage_caps",
}

# reference ptv3 kwargs that are consumed elsewhere or are no-ops under this
# execution model (simple_policy_ptv3.yaml:111-129): pdnorm_* norm plumbing is
# resolved by the variant's norm_adaptive rule; enable_flash is superseded by
# attn_impl; cls_mode is never used by the policy/planner models.
_PTV3_IGNORED = {
    "pdnorm_bn", "pdnorm_ln", "pdnorm_decouple", "pdnorm_adaptive",
    "pdnorm_affine", "pdnorm_conditions", "pdnorm_context_channels",
    "enable_flash", "cls_mode",
}


def ptv3_kwargs(cfg):
    """ptv3_config dict -> PointTransformerV3TPU kwargs.

    Raises on unknown truthy keys instead of silently dropping them: a
    reference-dumped training_config.yaml that enables an unimplemented
    option must fail loudly, never load and compute a different model.
    Unknown falsy keys (False/None/0) are tolerated — they request the
    behavior this backbone already has."""
    out = {}
    for k, v in cfg.items():
        if k == "order":  # the reference's name for the SFC order list
            out["orders"] = tuple(v)
        elif k in _PTV3_FIELDS:
            out[k] = tuple(v) if isinstance(v, list) else v
        elif k in _PTV3_IGNORED:
            continue
        elif v:
            raise ValueError(
                f"unknown ptv3_config option {k}={v!r}: not implemented by "
                "PointTransformerV3TPU (refusing to silently ignore a "
                "truthy model option)")
    return out


def build_disc_pos_targets(batch, gt_pos, pos_bins, act_cfg, preds=None):
    """(B, 3, N*2*pos_bins) GT prob tensor built inside the train step from
    pc coords + gt position + robot mask (host-twin: disc_pos_gt_prob_np).
    gt_pos: (B, 3) (or (B, L, 3) — vmapped over leading dims).

    The backbone's per-point logits are in its sorted-resident frame
    (ptv3.py sort0), so when preds are given the targets are built from the
    frame-aligned final_coord/final_mask and the robot mask is permuted
    into that frame; otherwise input order is assumed (host twins/tests).
    """
    if preds is not None:
        xyz = preds["final_coord"]
        mask = preds["final_mask"]
        robot = batch.get("pc_robot_mask")
        if robot is None:
            robot = jnp.zeros_like(mask)
        else:
            robot = jnp.take_along_axis(robot, preds["sort0"], axis=1)
    else:
        xyz = batch["pc_fts"][..., :3]
        mask = batch["pc_mask"]
        robot = batch.get("pc_robot_mask")
        if robot is None:
            robot = jnp.zeros_like(mask)
    build = lambda x, m, g, r: disc_pos_gt_prob_jnp(
        x, m, g, robot_mask=r,
        pos_bin_size=act_cfg.get("pos_bin_size", 0.01),
        pos_bins=pos_bins,
        heatmap_type=act_cfg.get("pos_heatmap_type", "dist"))
    if gt_pos.ndim == 3:  # (B, L, 3): per-trajectory-step targets
        per_cloud = lambda x, m, gl, r: jax.vmap(
            lambda g: build(x, m, g, r))(gl)
        return jax.vmap(per_cloud)(xyz, mask, gt_pos, robot)
    return jax.vmap(build)(xyz, mask, gt_pos, robot)


def compute_loss(preds, batch, act_cfg, loss_cfg):
    """reference simple_policy_ptv3.py:308-373, fully masked/batched.

    `batch_valid` (from collate batch padding) excludes duplicated pad clouds
    from every term; absent means all clouds count.
    """
    gt = batch["gt_actions"]
    tgt_pos, tgt_rot, tgt_open = gt[..., :3], gt[..., 3:-1], gt[..., -1]
    B = gt.shape[0]
    bv = batch.get("batch_valid")
    bv = jnp.ones(B, jnp.float32) if bv is None else bv.astype(jnp.float32)
    nvalid = jnp.maximum(jnp.sum(bv), 1.0)

    def bmean(per_cloud):  # (B,) -> masked scalar mean
        return jnp.sum(per_cloud * bv) / nvalid

    if act_cfg.get("pos_pred_type", "heatmap_disc") == "heatmap_disc":
        # per-cloud CE over all candidates of each axis, averaged over axes
        # then clouds (reference :326-332)
        logits = preds["pos"]                      # (B, 3, N, nb)
        _, _, N, nb = logits.shape
        flat = logits.reshape(B, 3, N * nb)
        target = batch.get("disc_pos_probs")       # (B, 3, N*nb)
        if target is None:
            # loader ships only gt_pos + robot mask; rebuild the GT prob
            # tensor on device (disc_pos_gt_prob_jnp, verdict item 3) in
            # the backbone's sorted frame (preds carry coord/mask/sort0)
            target = build_disc_pos_targets(batch, tgt_pos, nb // 2, act_cfg,
                                            preds=preds)
        elif "sort0" in preds:
            # host-built targets are in input point order; the logits are
            # in the backbone's sorted frame — align the candidate axis
            tgt = target.reshape(B, 3, N, nb)
            idx = jnp.broadcast_to(preds["sort0"][:, None, :, None],
                                   tgt.shape)
            target = jnp.take_along_axis(tgt, idx, axis=2).reshape(
                B, 3, N * nb)
        logp = jax.nn.log_softmax(flat, axis=-1)
        pos_loss = -jnp.sum(
            jnp.where(target > 0, target * logp, 0.0), axis=-1)  # (B, 3)
        pos_loss = bmean(jnp.mean(pos_loss, axis=-1))
    else:
        pos_loss = bmean(jnp.mean((preds["pos"] - tgt_pos) ** 2, axis=-1))

    rot_type = act_cfg.get("rot_pred_type", "euler_disc")
    if rot_type == "euler_disc":
        labels = tgt_rot[..., :3].astype(jnp.int32)   # (B, 3) bins
        logp = jax.nn.log_softmax(preds["rot"], axis=1)  # (B, bins, 3)
        rot_loss = -jnp.take_along_axis(
            logp, labels[:, None, :], axis=1)[:, 0, :]
        rot_loss = bmean(jnp.mean(rot_loss, axis=-1))
    elif rot_type == "quat":
        q = preds["rot"]
        e1 = jnp.mean((q - tgt_rot[..., :4]) ** 2, -1)
        e2 = jnp.mean((q + tgt_rot[..., :4]) ** 2, -1)
        rot_loss = bmean(jnp.minimum(e1, e2))
    elif rot_type == "euler":
        t = tgt_rot[..., :3]
        t_alt = jnp.where(t < 0, t + 2, jnp.where(t > 0, t - 2, t))
        e1 = (preds["rot"] - t) ** 2
        e2 = (preds["rot"] - t_alt) ** 2
        rot_loss = bmean(jnp.mean(jnp.minimum(e1, e2), axis=-1))
    else:  # euler_delta / rot6d (rot6d target conversion done in the dataset)
        se = (preds["rot"] - tgt_rot[..., :preds["rot"].shape[-1]]) ** 2
        rot_loss = bmean(jnp.mean(se, axis=-1))

    open_logit = preds["open"]
    open_loss = bmean(
        jnp.maximum(open_logit, 0) - open_logit * tgt_open +
        jnp.log1p(jnp.exp(-jnp.abs(open_logit))))

    total = loss_cfg.get("pos_weight", 1.0) * pos_loss + \
        loss_cfg.get("rot_weight", 1.0) * rot_loss + open_loss
    out = {"pos": pos_loss, "rot": rot_loss, "open": open_loss,
           "total": total}
    if "pool_overflow" in preds:  # monitored, never part of total
        out["pool_overflow"] = jnp.asarray(preds["pool_overflow"], jnp.float32)
    return out


def decode_actions(preds, act_cfg):
    """Raw head outputs -> (B, 8) [pos, quat, open-logit], fully on device
    (the reference does this on the host: simple_policy_ptv3.py:247-295)."""
    pos_type = act_cfg.get("pos_pred_type", "heatmap_disc")
    if pos_type == "heatmap_disc":
        decode_one = lambda lg, xyz, m: best_pos_from_disc_logits(
            lg, xyz, mask=m,
            pos_bin_size=act_cfg.get("pos_bin_size", 0.01),
            pos_bins=act_cfg.get("pos_bins", 50),
            best=act_cfg.get("best_disc_pos", "max"))
        pos = jax.vmap(decode_one)(
            preds["pos"], preds["final_coord"], preds["final_mask"])
    else:
        pos = preds["pos"]

    rot_type = act_cfg.get("rot_pred_type", "euler_disc")
    if rot_type == "euler_disc":
        bins = jnp.argmax(preds["rot"], axis=1)  # (B, 3)
        quat = rotops.discrete_euler_to_quat(
            bins, act_cfg.get("euler_resolution", 5))
    elif rot_type == "quat":
        quat = preds["rot"]
    elif rot_type == "rot6d":
        quat = rotops.matrix_to_quat(rotops.rot6d_to_matrix(preds["rot"]))
    else:  # euler (normalized to [-1, 1] * 180 deg)
        quat = rotops.euler_to_quat(preds["rot"] * 180.0, degrees=True)
    return jnp.concatenate([pos, quat, preds["open"][..., None]], axis=-1)
