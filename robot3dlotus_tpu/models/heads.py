"""Action heads for 3D-LOTUS policies (reference simple_policy_ptv3.py:19-157).

All reductions/softmaxes are masked over padded points; the heatmap softmax
normalizes per cloud over valid points exactly like the reference's per-cloud
torch.split + softmax(dim=0).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import dense


def leaky_relu02(x):
    return jax.nn.leaky_relu(x, negative_slope=0.02)


class ActionHead(nn.Module):
    reduce: str = "max"                  # max | mean | attn
    pos_pred_type: str = "heatmap_disc"  # heatmap_mlp | heatmap_disc
    rot_pred_type: str = "euler_disc"    # quat|rot6d|euler|euler_delta|euler_disc
    hidden_size: int = 128
    dim_actions: int = 7
    dropout: float = 0.0
    euler_resolution: int = 5
    pos_bins: int = 50

    @property
    def euler_bins(self):
        return 360 // self.euler_resolution

    @nn.compact
    def __call__(self, point_embeds, mask, coords=None, temp=1.0,
                 deterministic=True):
        """point_embeds: (B, N, D); mask: (B, N); coords: (B, N, 3).

        Returns (xt, xr, xo):
          heatmap_disc: xt = (B, 3, N, 2*pos_bins) logits
          heatmap_mlp:  xt = (B, 3) expected coordinate
          euler_disc:   xr = (B, euler_bins, 3) logits; else (B, dim)
          xo: (B,) openness logit
        """
        B, N, D = point_embeds.shape

        def mlp(out_dim, name):
            def f(x):
                x = dense(self.hidden_size, name=f"{name}_fc1")(x)
                x = leaky_relu02(x)
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
                return dense(out_dim, name=f"{name}_fc2")(x)
            return f

        if self.pos_pred_type == "heatmap_disc":
            ht = mlp(3 * self.pos_bins * 2, "heatmap_mlp")(point_embeds)
            # (B, N, 3*(2*pos_bins)) -> (B, 3, N, 2*pos_bins); layout matches
            # einops 'n (c b) -> c n b' (simple_policy_ptv3.py:115)
            xt = ht.reshape(B, N, 3, 2 * self.pos_bins).transpose(0, 2, 1, 3)
            # mask invalid points' candidates out of the per-cloud softmax
            xt = jnp.where(mask[:, None, :, None], xt, -1e9)
        elif self.pos_pred_type == "heatmap_mlp":
            ht = mlp(1 + 3, "heatmap_mlp")(point_embeds)
            heat = jnp.where(mask, ht[..., 0] / temp, -1e9)
            w = jax.nn.softmax(heat, axis=-1)  # per-cloud over valid points
            new_coords = coords + ht[..., 1:]
            xt = jnp.einsum("bn,bnc->bc", w, new_coords)
        else:
            raise NotImplementedError(self.pos_pred_type)

        if self.reduce == "max":
            pooled = jnp.max(
                jnp.where(mask[..., None], point_embeds, -jnp.inf), axis=1)
            action_embeds = mlp(self._action_out(), "action_mlp")(pooled)
        elif self.reduce == "mean":
            m = mask[..., None].astype(point_embeds.dtype)
            pooled = jnp.sum(point_embeds * m, axis=1) / \
                jnp.maximum(jnp.sum(m, axis=1), 1.0)
            action_embeds = mlp(self._action_out(), "action_mlp")(pooled)
        elif self.reduce == "attn":
            per_point = mlp(self._action_out() + 1, "action_mlp")(point_embeds)
            heat = jnp.where(mask, per_point[..., 0] / temp, -1e9)
            w = jax.nn.softmax(heat, axis=-1)
            action_embeds = jnp.einsum("bn,bnd->bd", w, per_point[..., 1:])
        else:
            raise NotImplementedError(self.reduce)

        if self.rot_pred_type == "quat":
            xr = action_embeds[..., :4]
            xr = xr / jnp.sqrt(
                jnp.maximum(jnp.sum(xr * xr, -1, keepdims=True), 1e-12))
        elif self.rot_pred_type == "rot6d":
            xr = action_embeds[..., :6]
        elif self.rot_pred_type in ("euler", "euler_delta"):
            xr = action_embeds[..., :3]
        elif self.rot_pred_type == "euler_disc":
            # view(-1, euler_bins, 3): row-major (bin, axis) layout
            xr = action_embeds[..., :self.euler_bins * 3].reshape(
                B, self.euler_bins, 3)
        else:
            raise NotImplementedError(self.rot_pred_type)

        xo = action_embeds[..., -1]
        return xt, xr, xo

    def _action_out(self):
        if self.rot_pred_type == "euler_disc":
            return self.euler_bins * 3 + 1
        return self.dim_actions - 3
