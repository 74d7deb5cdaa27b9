"""3D-LOTUS++ motion planner (reference motion_planner_ptv3.py:20-463).

Differences from the keystep policy:
  * input adds per-point semantic labels (0=obstacle, 1=robot, 2=object,
    3=target; reference :165-166) embedded and concatenated to point features;
  * the head predicts a trajectory of max_traj_len poses plus a per-step stop
    logit, by expanding every point embedding with a learned trajectory-step
    embedding (reference :89-96);
  * losses are masked per valid trajectory step (reference :307-397).

Batch layout extends the SimplePolicy one with:
  pc_labels        (B, N) int32 in [0, 4)
  gt_trajs         (B, L, 8)
  gt_trajs_stop    (B, L)
  traj_masks       (B, L) bool
  disc_pos_probs   (B, L, 3, N*2*pos_bins) when pos_pred_type=heatmap_disc
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import rotation as rotops
from ..ops.pos_codec import best_pos_from_disc_logits
from .layers import dense
from .heads import leaky_relu02
from .simple_policy import RobotPoseEmbedding, ptv3_kwargs
from .ptv3 import PointTransformerV3TPU, host_structure_kwargs


class _SplitDense(nn.Module):
    """dense(features) over concat([a, b], -1), applied FACTORED:
    a @ kernel[:split] and b @ kernel[split:] separately (+ bias), so the
    caller can broadcast-add the two partial products instead of
    materializing the concatenated input. The parameter tree (kernel of
    shape (split + b_dim, features), bias) is IDENTICAL to the dense it
    replaces — torch_convert mappings and released checkpoints unchanged."""
    features: int
    split: int

    @nn.compact
    def __call__(self, a, b):
        from .layers import trunc_init
        in_dim = self.split + (b.shape[-1] if b is not None else 0)
        kernel = self.param("kernel", trunc_init, (in_dim, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ya = a @ kernel[:self.split]
        yb = None if b is None else b @ kernel[self.split:]
        return ya, yb, bias


class TrajActionHead(nn.Module):
    """reference motion_planner_ptv3.py:20-148.

    TPU-first restructure (round-2; the reference materializes a
    (sum_N, L, D+E) expansion through both MLPs, :89-96): the fc1 of each
    head is linear, so fc1(concat(point, traj_embed)) splits into a
    per-point product computed ONCE (B, N, hidden) and a per-trajectory-step
    product (L, hidden) broadcast-added afterwards — L x fewer fc1 FLOPs on
    the point dim and no (B, N, L, D+E) intermediate. The pooled action
    branch commutes the same way: max/mean over points of concat(p, te) ==
    concat(reduce(p), te). Numerically identical to the reference dataflow
    (same params, same sums)."""
    reduce: str = "max"
    pos_pred_type: str = "heatmap_disc"
    rot_pred_type: str = "euler_disc"
    hidden_size: int = 128
    dim_actions: int = 7
    max_traj_len: int = 5
    traj_embed_size: int = 64
    dropout: float = 0.0
    euler_resolution: int = 5
    pos_bins: int = 50

    @property
    def euler_bins(self):
        return 360 // self.euler_resolution

    @nn.compact
    def __call__(self, point_embeds, mask, coords=None, temp=1.0,
                 deterministic=True):
        B, N, D = point_embeds.shape
        L = self.max_traj_len
        E = self.traj_embed_size

        te = None  # (L, E)
        if E > 0:
            traj_table = nn.Embed(
                L, E,
                embedding_init=nn.initializers.truncated_normal(0.02),
                name="traj_embedding")
            te = traj_table(jnp.arange(L))

        def mlp_pointwise(out_dim, name):
            """fc1 factored over (points, traj steps) -> (B, N, L, out)."""
            def f():
                ya, yb, bias = _SplitDense(
                    self.hidden_size, D, name=f"{name}_fc1")(
                    point_embeds, te)
                x = ya[:, :, None, :] + bias
                if yb is not None:
                    x = x + yb[None, None]
                else:
                    x = jnp.broadcast_to(x, (B, N, L, self.hidden_size))
                x = leaky_relu02(x)
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
                return dense(out_dim, name=f"{name}_fc2")(x)
            return f

        if self.pos_pred_type == "heatmap_disc":
            ht = mlp_pointwise(3 * self.pos_bins * 2, "heatmap_mlp")()
            # 'n t (c b) -> t c n b' per cloud: ours (B, L, 3, N, nb)
            xt = ht.reshape(B, N, L, 3, 2 * self.pos_bins)
            xt = xt.transpose(0, 2, 3, 1, 4)
            xt = jnp.where(mask[:, None, None, :, None], xt, -1e9)
        else:  # heatmap_mlp
            ht = mlp_pointwise(1 + 3, "heatmap_mlp")()  # (B, N, L, 4)
            heat = jnp.where(mask[:, :, None], ht[..., 0] / temp, -1e9)
            w = jax.nn.softmax(heat, axis=1)  # over points
            new_coords = coords[:, :, None, :] + ht[..., 1:]
            xt = jnp.einsum("bnt,bntc->btc", w, new_coords)

        # pooled branch: reduce commutes with concat, so reduce the D-dim
        # point embeddings once and fan the traj embedding out after fc1
        if self.reduce == "max":
            pooled_p = jnp.max(
                jnp.where(mask[..., None], point_embeds, -jnp.inf), axis=1)
        elif self.reduce == "mean":
            m = mask[..., None].astype(point_embeds.dtype)
            pooled_p = jnp.sum(point_embeds * m, axis=1) / \
                jnp.maximum(jnp.sum(m, 1), 1.0)
        else:
            raise NotImplementedError(self.reduce)
        out_dim = (self.euler_bins * 3 if self.rot_pred_type == "euler_disc"
                   else self.dim_actions - 3)
        ya, yb, bias = _SplitDense(
            self.hidden_size, D, name="action_mlp_fc1")(pooled_p, te)
        act_h = ya[:, None, :] + bias                      # (B, L, hidden)
        if yb is not None:
            act_h = act_h + yb[None]
        else:
            act_h = jnp.broadcast_to(act_h, (B, L, self.hidden_size))
        act_h = leaky_relu02(act_h)
        act_h = nn.Dropout(self.dropout)(act_h, deterministic=deterministic)
        action_embeds = dense(out_dim + 2, name="action_mlp_fc2")(act_h)

        if self.rot_pred_type == "euler_disc":
            # 'n t (b c) -> n t b c', c=3
            xr = action_embeds[..., :self.euler_bins * 3].reshape(
                B, L, self.euler_bins, 3)
        elif self.rot_pred_type == "quat":
            xr = action_embeds[..., :4]
            xr = xr / jnp.sqrt(
                jnp.maximum(jnp.sum(xr * xr, -1, keepdims=True), 1e-12))
        elif self.rot_pred_type == "rot6d":
            xr = action_embeds[..., :6]
        else:
            xr = action_embeds[..., :3]
        xo = action_embeds[..., -2]
        xstop = action_embeds[..., -1]
        return xt, xr, xo, xstop


class MotionPlannerTPU(nn.Module):
    ptv3_cfg: Dict[str, Any]
    act_cfg: Dict[str, Any]
    variant: str = "adanorm"  # adanorm | ca

    @nn.compact
    def __call__(self, batch, deterministic=True):
        ac = self.act_cfg
        ctx_ch = ac["context_channels"]
        B = batch["pc_fts"].shape[0]

        label_table = nn.Embed(
            4, ac.get("pc_label_channels", 16),
            embedding_init=nn.initializers.truncated_normal(0.02),
            name="pc_label_embedding")
        # the label embedding is only consumed by the backbone stem conv;
        # pass it as a categorical channel (index + table) so the stem
        # gathers 1 raw channel instead of 16 embedded ones — the gather
        # kernel cost is linear in channel count (ops/sparse_conv.py).
        # table rows via a full-range lookup keeps nn.Embed's param layout.
        labels = batch["pc_labels"].astype(jnp.int32)
        stem_categorical = (labels, label_table(jnp.arange(4)))

        txt_ctx = dense(ctx_ch, name="txt_fc")(batch["txt_embeds"])
        txt_mask = batch["txt_mask"]

        pose_e = None
        if ac.get("use_ee_pose", False):
            pose_e = RobotPoseEmbedding(ctx_ch, name="pose_embedding")(
                batch["ee_poses"])

        context = context_mask = context_vec = None
        if self.variant == "ca":
            toks, masks = [txt_ctx], [txt_mask]
            if pose_e is not None:
                toks.append(pose_e[:, None, :])
                masks.append(jnp.ones((B, 1), bool))
            context = jnp.concatenate(toks, axis=1)
            context_mask = jnp.concatenate(masks, axis=1)
        else:
            if ac.get("txt_reduce", "mean") == "attn":
                w = dense(1, name="txt_attn_fc")(batch["txt_embeds"])[..., 0]
                w = jnp.where(txt_mask, w, -1e9)
                w = jax.nn.softmax(w, axis=-1)
                context_vec = jnp.einsum("bt,btc->bc", w, txt_ctx)
            else:
                m = txt_mask[..., None].astype(txt_ctx.dtype)
                context_vec = jnp.sum(txt_ctx * m, 1) / \
                    jnp.maximum(jnp.sum(m, 1), 1.0)
            if pose_e is not None:
                context_vec = context_vec + pose_e

        backbone = PointTransformerV3TPU(
            use_cross_attn=(self.variant == "ca"),
            norm_adaptive=(self.variant == "adanorm"
                           and self.ptv3_cfg.get("pdnorm_adaptive", True)),
            grid_size=ac.get("voxel_size", 0.01),
            name="ptv3_model",
            **ptv3_kwargs(self.ptv3_cfg),
        )
        outs = backbone(
            batch["pc_fts"][..., :3], batch["pc_fts"], batch["pc_mask"],
            batch["pc_counts"], context=context, context_mask=context_mask,
            context_vec=context_vec, deterministic=deterministic,
            stem_categorical=stem_categorical,
            **host_structure_kwargs(batch))

        final = outs[-1]
        head = TrajActionHead(
            reduce=ac.get("reduce", "max"),
            pos_pred_type=ac.get("pos_pred_type", "heatmap_disc"),
            rot_pred_type=ac.get("rot_pred_type", "euler_disc"),
            hidden_size=list(self.ptv3_cfg["dec_channels"])[0],
            dim_actions=ac.get("dim_actions", 7),
            max_traj_len=ac.get("max_traj_len", 5),
            traj_embed_size=ac.get("traj_embed_size", 64),
            dropout=ac.get("dropout", 0.0),
            euler_resolution=ac.get("euler_resolution", 5),
            pos_bins=ac.get("pos_bins", 50),
            name="act_proj_head")
        xt, xr, xo, xstop = head(
            final["feat"], final["mask"], coords=final["coord"],
            temp=ac.get("pos_heatmap_temp", 1.0), deterministic=deterministic)
        return {
            "pos": xt, "rot": xr, "open": xo, "stop": xstop,
            "final_coord": final["coord"], "final_mask": final["mask"],
            "sort0": outs[0]["sort0"],
            "pool_overflow": outs[0].get("pool_overflow", 0),
        }


def _masked_bce(logits, targets, mask):
    per = jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def compute_mp_loss(preds, batch, act_cfg, loss_cfg):
    """reference motion_planner_ptv3.py:307-397.

    `batch_valid` (collate batch padding) zeroes the trajectory mask of pad
    clouds so they drop out of every masked term.
    """
    gt = batch["gt_trajs"]           # (B, L, 8)
    tmask = batch["traj_masks"].astype(jnp.float32)  # (B, L)
    bv = batch.get("batch_valid")
    bv = jnp.ones(gt.shape[0], jnp.float32) if bv is None \
        else bv.astype(jnp.float32)
    tmask = tmask * bv[:, None]
    tgt_pos, tgt_rot, tgt_open = gt[..., :3], gt[..., 3:-1], gt[..., -1]

    if act_cfg.get("pos_pred_type", "heatmap_disc") == "heatmap_disc":
        logits = preds["pos"]                    # (B, L, 3, N, nb)
        B, L, _, N, nb = logits.shape
        flat = logits.reshape(B, L, 3, N * nb)
        target = batch.get("disc_pos_probs")     # (B, L, 3, N*nb)
        if target is None:
            # device-built per-step GT probs from gt_trajs positions +
            # robot mask (verdict item 3; see simple_policy.compute_loss),
            # in the backbone's sorted frame (preds carry coord/mask/sort0)
            from .simple_policy import build_disc_pos_targets
            target = build_disc_pos_targets(
                batch, tgt_pos, nb // 2, act_cfg,
                preds=preds).reshape(B, L, 3, N * nb)
        elif "sort0" in preds:
            # host-built targets are in input order; align to the frame
            tgt = target.reshape(B, L, 3, N, nb)
            idx = jnp.broadcast_to(
                preds["sort0"][:, None, None, :, None], tgt.shape)
            target = jnp.take_along_axis(tgt, idx, axis=3).reshape(
                B, L, 3, N * nb)
        logp = jax.nn.log_softmax(flat, axis=-1)
        ce = -jnp.sum(jnp.where(target > 0, target * logp, 0.0), axis=-1)
        # per cloud: sum over (t, c) weighted by traj mask / mask count
        w = tmask[:, :, None]
        per_cloud = jnp.sum(ce * w, axis=(1, 2)) / \
            jnp.maximum(jnp.sum(w, axis=(1, 2)), 1.0)
        pos_loss = jnp.sum(per_cloud * bv) / jnp.maximum(jnp.sum(bv), 1.0)
    else:
        se = (preds["pos"] - tgt_pos) ** 2
        pos_loss = jnp.sum(se * tmask[..., None]) / \
            jnp.maximum(jnp.sum(tmask), 1.0) / 3.0

    rot_type = act_cfg.get("rot_pred_type", "euler_disc")
    if rot_type == "euler_disc":
        labels = tgt_rot[..., :3].astype(jnp.int32)       # (B, L, 3)
        logp = jax.nn.log_softmax(preds["rot"], axis=2)   # (B, L, bins, 3)
        ce = -jnp.take_along_axis(logp, labels[:, :, None, :], axis=2)[:, :, 0]
        rot_loss = jnp.sum(ce * tmask[..., None]) / \
            jnp.maximum(jnp.sum(tmask), 1.0) / 3.0
    elif rot_type == "quat":
        q = preds["rot"]
        e1 = jnp.mean((q - tgt_rot[..., :4]) ** 2, -1)
        e2 = jnp.mean((q + tgt_rot[..., :4]) ** 2, -1)
        rot_loss = jnp.sum(jnp.minimum(e1, e2) * tmask) / \
            jnp.maximum(jnp.sum(tmask), 1.0)
    else:
        se = (preds["rot"] - tgt_rot[..., :preds["rot"].shape[-1]]) ** 2
        rot_loss = jnp.sum(se * tmask[..., None]) / \
            jnp.maximum(jnp.sum(tmask) * se.shape[-1], 1.0)

    open_loss = _masked_bce(preds["open"], tgt_open, tmask)
    stop_loss = _masked_bce(preds["stop"],
                            batch["gt_trajs_stop"].astype(jnp.float32), tmask)

    total = loss_cfg.get("pos_weight", 1.0) * pos_loss + \
        loss_cfg.get("rot_weight", 1.0) * rot_loss + open_loss + stop_loss
    out = {"pos": pos_loss, "rot": rot_loss, "open": open_loss,
           "stop": stop_loss, "total": total}
    if "pool_overflow" in preds:  # monitored, never part of total
        out["pool_overflow"] = jnp.asarray(preds["pool_overflow"], jnp.float32)
    return out


def decode_mp_actions(preds, act_cfg):
    """-> (B, L, 9): pos(3) + quat(4) + open logit + stop logit, on device."""
    if act_cfg.get("pos_pred_type", "heatmap_disc") == "heatmap_disc":
        def decode_one(lg, xyz, m):
            # lg: (L, 3, N, nb)
            return jax.vmap(lambda g: best_pos_from_disc_logits(
                g, xyz, mask=m,
                pos_bin_size=act_cfg.get("pos_bin_size", 0.01),
                pos_bins=act_cfg.get("pos_bins", 50),
                best=act_cfg.get("best_disc_pos", "max")))(lg)
        pos = jax.vmap(decode_one)(
            preds["pos"], preds["final_coord"], preds["final_mask"])
    else:
        pos = preds["pos"]

    rot_type = act_cfg.get("rot_pred_type", "euler_disc")
    if rot_type == "euler_disc":
        bins = jnp.argmax(preds["rot"], axis=2)  # (B, L, 3)
        quat = rotops.discrete_euler_to_quat(
            bins, act_cfg.get("euler_resolution", 5))
    elif rot_type == "quat":
        quat = preds["rot"]
    elif rot_type == "rot6d":
        quat = rotops.matrix_to_quat(rotops.rot6d_to_matrix(preds["rot"]))
    else:
        quat = rotops.euler_to_quat(preds["rot"] * 180.0, degrees=True)
    return jnp.concatenate(
        [pos, quat, preds["open"][..., None], preds["stop"][..., None]],
        axis=-1)
