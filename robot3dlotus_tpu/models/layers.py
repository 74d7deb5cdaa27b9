"""Flax building blocks for the TPU PointTransformerV3 stack.

Layer semantics track the reference modules (file:line cited per class) but
operate on padded dense (B, N, C) tensors with validity masks instead of
flat ragged (sum_N, C) tensors, so every op is static-shaped for XLA.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.patching import dup_pad_identity, gather_sorted, scatter_back
from ..ops.sparse_conv import NeighborMap, subm_conv_apply, stencil_offsets

# Reference inits: trunc_normal(std=0.02) for Linear/Embedding weights, zero
# bias (models/base.py:36-49).
trunc_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def dense(features, name=None, use_bias=True, dtype=None):
    """dtype is the flax computation dtype: params stay fp32, inputs and
    params are cast to it for the matmul (bfloat16 on the MXU hot path)."""
    return nn.Dense(features, use_bias=use_bias, kernel_init=trunc_init,
                    bias_init=nn.initializers.zeros, name=name, dtype=dtype)


def gelu(x):
    # torch nn.GELU default is the exact erf formulation
    return jax.nn.gelu(x, approximate=False)


def drop_path(x, rate, deterministic, rng):
    """Per-row stochastic depth (timm DropPath over the point axis, matching
    the reference which applies it on flat (sum_N, C) tensors)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = x.shape[:-1] + (1,)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over all valid points of the batch (torch semantics:
    eps 1e-3, momentum 0.01 — reference model.py:932). Under pjit with a
    batch-sharded mesh the masked sums become global psums automatically,
    which reproduces SyncBatchNorm (train_simple_policy.py:117)."""
    features: int
    eps: float = 1e-3
    momentum: float = 0.01  # torch convention: new = (1-m)*old + m*batch

    @nn.compact
    def __call__(self, x, mask=None, use_running_average=False):
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if mask is None:
                cnt = jnp.float32(x.size // self.features)
                mean = jnp.mean(xf.reshape(-1, self.features), axis=0)
                var = jnp.mean(
                    (xf.reshape(-1, self.features) - mean) ** 2, axis=0)
            else:
                m = mask[..., None].astype(jnp.float32)
                cnt = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(xf * m, axis=tuple(range(x.ndim - 1))) / cnt
                var = jnp.sum(((xf - mean) ** 2) * m,
                              axis=tuple(range(x.ndim - 1))) / cnt
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + \
                    self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + \
                    self.momentum * unbiased
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class LayerNorm(nn.Module):
    features: int
    eps: float = 1e-5  # torch nn.LayerNorm default

    @nn.compact
    def __call__(self, x, mask=None, use_running_average=False):
        del mask, use_running_average
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class AdaptiveNorm(nn.Module):
    """PDNorm equivalent (reference model.py:257-304) with decouple=False:
    a base norm optionally modulated by a per-cloud context vector:
    feat * (1 + scale) + shift, scale/shift = Linear(SiLU(context))."""
    features: int
    kind: str  # 'bn' | 'ln'
    adaptive: bool = False
    context_channels: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None, context=None, use_running_average=False):
        if self.kind == "bn":
            y = MaskedBatchNorm(self.features, name="norm")(
                x, mask=mask, use_running_average=use_running_average)
        else:
            y = LayerNorm(self.features, name="norm")(x)
        if self.adaptive:
            assert context is not None
            mod = dense(2 * self.features, name="modulation",
                        dtype=self.dtype)(jax.nn.silu(context))
            shift, scale = jnp.split(mod.astype(y.dtype), 2, axis=-1)
            # context is per cloud: broadcast over the point axis
            y = y * (1.0 + scale[:, None, :]) + shift[:, None, :]
        return y


class MLP(nn.Module):
    """reference model.py:560-583."""
    hidden: int
    out: int
    drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = dense(self.hidden, name="fc1", dtype=self.dtype)(x)
        x = gelu(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = dense(self.out, name="fc2", dtype=self.dtype)(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class SubMConv(nn.Module):
    """Submanifold sparse conv (spconv.SubMConv3d equivalent); weight layout
    (K, Cin, Cout) with K in stencil_offsets order."""
    features: int
    kernel_size: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, nmap, interpret=False, categorical=None,
                 window_frame=False, host_far=None, host_farp=None,
                 telemetry=None):
        """nmap: a NeighborMap (XLA gather paths) or a WindowMap (windowed
        Pallas kernel, ops/pallas_conv.py) — the conv_impl backbone config
        decides which one the stage aux carries.

        categorical: optional (idx (B, N) int32, table (Kcat, E)) embedded
        categorical channels logically appended to x; the weight covers
        Cin = x.C + E and the NeighborMap path gathers the raw index instead
        of the E channels (ops/sparse_conv.subm_conv_apply)."""
        from ..ops.pallas_conv import WindowMap, subm_conv_windowed
        K = self.kernel_size ** 3
        cin = x.shape[-1]
        if categorical is not None:
            cin += categorical[1].shape[-1]
        # spconv default init: kaiming-uniform-ish over fan_in = K*Cin
        fan_in = K * cin
        w_init = nn.initializers.variance_scaling(
            1.0 / 3.0, "fan_in", "uniform", in_axis=(0, 1), out_axis=2)
        del fan_in
        weight = self.param("weight", w_init, (K, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) \
            if self.use_bias else None
        if self.dtype is not None:
            x = x.astype(self.dtype)
            weight = weight.astype(self.dtype)
        if isinstance(nmap, WindowMap):
            from ..ops.sparse_conv import materialize_categorical
            return subm_conv_windowed(
                materialize_categorical(x, categorical), nmap, weight, bias,
                interpret=interpret)
        return subm_conv_apply(x, nmap, weight, bias, categorical=categorical,
                               window_frame=window_frame, host_far=host_far,
                               host_farp=host_farp, telemetry=telemetry)


def rpe_bias(table, rel_pos, pos_bnd):
    """Relative-position bias lookup (reference model.py:307-326 RPE.forward):
    rel_pos (..., P, P, 3) int32 grid-coord deltas are clamped to
    [-pos_bnd, pos_bnd], shifted positive, offset per axis by rpe_num, and the
    three axis rows of `table` (3*rpe_num, H) are summed -> (..., P, P, H)."""
    rpe_num = 2 * pos_bnd + 1
    idx = (jnp.clip(rel_pos, -pos_bnd, pos_bnd) + pos_bnd
           + jnp.arange(3, dtype=rel_pos.dtype) * rpe_num)
    return jnp.sum(jnp.take(table, idx, axis=0), axis=-2)


class SerializedAttention(nn.Module):
    """Patch attention over one serialized order (reference model.py:329-557).

    Dense formulation: qkv is gathered into padded serialized order via the
    pad maps (ops/patching.py reproduces the reference's duplicate-pad
    scheme), reshaped to (B, num_patches, P, ...) and attended per patch.
    Only dead slots (beyond a cloud's padded length) are masked.
    """
    channels: int
    num_heads: int
    patch_size: int
    order_index: int = 0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    qk_norm: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    upcast_softmax: bool = True
    # upcast q/k to float32 before qk-norm and the logit matmul (reference
    # model.py:504-507 non-flash path; a no-op when compute_dtype is fp32)
    upcast_attention: bool = False
    # cosine attention with a learned per-head temperature clamped at 100
    # (reference model.py:363,511-516; swin-v2 style)
    scaled_cosine_attn: bool = False
    # learned relative-position bias on the patch logits (reference
    # model.py:307-326; off in the release configs — the flash path can't
    # carry it, reference model.py:367-368 — but accepted as a config option)
    enable_rpe: bool = False
    # 'none' | 'qkv' | 'qk': add a Linear(3 -> C) projection of the point
    # coords into the attention inputs (reference model.py:484-495; release
    # configs use 'none')
    add_coords_in_attn: str = "none"
    dtype: Any = None
    # 'auto' = Pallas flash kernel on TPU when attention dropout is inactive
    # (inference / attn_drop=0), XLA einsum otherwise; 'xla' / 'pallas'
    # force a path ('pallas_interpret' runs the kernel interpreted — tests)
    attn_impl: str = "auto"

    def _use_pallas(self, deterministic):
        if self.enable_rpe or self.scaled_cosine_attn:
            # like the reference flash path, the kernel carries neither a
            # bias input nor a per-head learned logit scale
            return False
        if self.attn_impl == "pallas":
            return True
        if self.attn_impl == "pallas_interpret":
            # the CPU interpreter has no real PRNG (prng_random_bits stubs
            # to zeros), so the in-kernel dropout variant is TPU-only
            return deterministic or self.attn_drop == 0.0
        if self.attn_impl == "auto":
            from ..ops.pallas_attention import pallas_available
            return pallas_available()
        return False

    @nn.compact
    def __call__(self, feat, order, inverse, src_pos, key_valid,
                 deterministic=True, grid_coord=None, coord=None,
                 counts=None):
        B, N, C = feat.shape
        H = self.num_heads
        P = self.patch_size
        Dh = C // H
        scale = self.qk_scale or Dh ** -0.5

        # Arrange the INPUTS in padded serialized order before the qkv
        # projection: pointwise projections commute with row permutation,
        # so this gathers C channels where the reference permutes the 3C
        # qkv output (model.py:489-496). When the residual stream already
        # lives in this block's serialized order (order is None — the
        # sorted-resident backbone dataflow), duplicate-padding is a static
        # shift+select and the permute disappears entirely.
        o = order[self.order_index]
        inv = inverse[self.order_index]
        if o is None:
            assert counts is not None
            feat = dup_pad_identity(feat, counts, P)
            if self.add_coords_in_attn != "none":
                coord = dup_pad_identity(coord, counts, P)
        else:
            feat = gather_sorted(feat, o, src_pos)
            if self.add_coords_in_attn != "none":
                coord = gather_sorted(coord, o, src_pos)

        if self.add_coords_in_attn == "qkv":
            assert coord is not None
            # Linear(3, C, bias=False) in the reference (model.py:397)
            feat = feat + dense(C, name="coords_proj", use_bias=False,
                                dtype=self.dtype)(coord.astype(feat.dtype))
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, kernel_init=trunc_init,
                       name="qkv", dtype=self.dtype)(feat)
        if self.add_coords_in_attn == "qk":
            assert coord is not None
            qkc = dense(C, name="coords_proj", use_bias=False,
                        dtype=self.dtype)(coord.astype(feat.dtype))
            qkv = qkv + jnp.concatenate(
                [qkc, qkc, jnp.zeros_like(qkc)], axis=-1)

        NP = N // P
        # the 3C projection packs [q; k; v] 3-major (reference model.py:489
        # reshape (-1, K, 3, H, C//H)), so a contiguous lane split is the
        # same unpack without the strided middle-dim copies XLA emits for
        # qkv[..., i, :, :]
        q, k, v = (t.reshape(B, NP, P, H, Dh)
                   for t in jnp.split(qkv.reshape(B, NP, P, 3 * C), 3, -1))
        if self.upcast_attention:
            # reference model.py:504-507: cast before the qk norms
            q = q.astype(jnp.float32)
            k = k.astype(jnp.float32)
        if self.qk_norm:
            q = LayerNorm(Dh, eps=1e-6, name="q_norm")(q)
            k = LayerNorm(Dh, eps=1e-6, name="k_norm")(k)

        if self._use_pallas(deterministic):
            from ..ops.pallas_attention import (
                patch_attention, patch_attention_dropout,
            )
            interp = self.attn_impl == "pallas_interpret"
            if self.upcast_attention:
                # the reference forbids upcast_attention with flash
                # (model.py:370-371); like flash, the Pallas kernel
                # accumulates in fp32 internally, so feed it the compute
                # dtype (the fp32 cast above still makes the qk norms
                # fp32-exact) instead of doubling in-kernel bandwidth
                q = q.astype(v.dtype)
                k = k.astype(v.dtype)
            # (B, NP, P, H, Dh) -> (B*NP, H, P, Dh)
            qg = q.transpose(0, 1, 3, 2, 4).reshape(B * NP, H, P, Dh)
            kg = k.transpose(0, 1, 3, 2, 4).reshape(B * NP, H, P, Dh)
            vg = v.transpose(0, 1, 3, 2, 4).reshape(B * NP, H, P, Dh)
            kv = key_valid.reshape(B * NP, P)
            if not deterministic and self.attn_drop > 0.0:
                # in-kernel dropout: probs + keep-mask regenerated from the
                # seed in the Pallas backward, so no (G,H,P,P) residuals
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32)
                og = patch_attention_dropout(
                    qg, kg, vg, kv, seed, float(scale),
                    float(self.attn_drop), interp)
            else:
                og = patch_attention(qg, kg, vg, kv, float(scale), interp)
            out = og.reshape(B, NP, H, P, Dh).transpose(0, 1, 3, 2, 4)
            out = out.reshape(B, N, C).astype(qkv.dtype)
        else:
            # (B, NP, H, P, P)
            if self.scaled_cosine_attn:
                # torch layout: logit_scale (H, 1, 1) init log(10), clamped
                # at log(100) (reference model.py:363,511-516)
                logit_scale = self.param(
                    "logit_scale",
                    lambda _: jnp.full((H, 1, 1), jnp.log(10.0), jnp.float32))
                qh = q / jnp.maximum(
                    jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
                kh = k / jnp.maximum(
                    jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
                logits = jnp.einsum("bnphd,bnqhd->bnhpq", qh, kh,
                                    preferred_element_type=jnp.float32)
                logits = logits * jnp.exp(
                    jnp.minimum(logit_scale, jnp.log(100.0))).astype(
                        logits.dtype)
            else:
                logits = jnp.einsum("bnphd,bnqhd->bnhpq", q * scale, k,
                                    preferred_element_type=jnp.float32)
            if self.enable_rpe:
                assert grid_coord is not None, \
                    "enable_rpe needs grid_coord in the attention aux"
                # reference pos_bnd/table sizing (model.py:312-314)
                pos_bnd = int((4 * P) ** (1 / 3) * 2)
                table = self.param(
                    "rpe_table", trunc_init,
                    (3 * (2 * pos_bnd + 1), self.num_heads))
                gc = dup_pad_identity(
                    grid_coord.astype(jnp.int32), counts, P) if o is None \
                    else gather_sorted(grid_coord.astype(jnp.int32), o,
                                       src_pos)
                gc = gc.reshape(B, NP, P, 3)
                rel = gc[:, :, :, None, :] - gc[:, :, None, :, :]
                bias = rpe_bias(table.astype(jnp.float32), rel, pos_bnd)
                logits = logits + bias.transpose(0, 1, 4, 2, 3)
            kv_mask = key_valid.reshape(B, NP, 1, 1, P)
            logits = jnp.where(kv_mask, logits, -1e9)
            if self.upcast_softmax:
                logits = logits.astype(jnp.float32)
            attn = jax.nn.softmax(logits, axis=-1)
            attn = nn.Dropout(self.attn_drop)(
                attn, deterministic=deterministic)
            out = jnp.einsum("bnhpq,bnqhd->bnphd", attn.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
            out = out.reshape(B, N, C).astype(qkv.dtype)
        # identity order: rows < m are already per-point outputs; rows >= m
        # are dup/dead slots that every downstream consumer masks (exactly
        # the garbage the old scatter also left in invalid rows)
        if inv is not None:
            out = scatter_back(out, inv)
        out = dense(C, name="proj", dtype=self.dtype)(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class CrossAttention(nn.Module):
    """Points -> text-context cross attention (reference model_ca.py:19-101),
    dense masked formulation over (B, N) x (B, T)."""
    channels: int
    num_heads: int
    qk_norm: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, feat, context, context_mask, deterministic=True):
        B, N, C = feat.shape
        H = self.num_heads
        Dh = C // H
        scale = Dh ** -0.5
        q = dense(C, name="q", dtype=self.dtype)(feat).reshape(B, N, H, Dh)
        kv = dense(2 * C, name="kv", dtype=self.dtype)(context)
        # [k; v] packs 2-major (reference model_ca.py:49) — contiguous split
        k, v = (t.reshape(B, context.shape[1], H, Dh)
                for t in jnp.split(kv, 2, -1))
        if self.qk_norm:
            q = LayerNorm(Dh, eps=1e-6, name="q_norm")(q)
            k = LayerNorm(Dh, eps=1e-6, name="k_norm")(k)
        logits = jnp.einsum("bnhd,bthd->bnth", q, k,
                            preferred_element_type=jnp.float32) * scale
        # reference masks with -1e4 (model_ca.py:89)
        logits = jnp.where(context_mask[:, None, :, None], logits, -1e4)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=2)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bnth,bthd->bnhd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, N, C).astype(q.dtype)
        out = dense(C, name="proj", dtype=self.dtype)(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class Block(nn.Module):
    """PTv3 block: CPE conv residual, pre-norm attn, pre-norm MLP
    (reference model.py:586-680)."""
    channels: int
    num_heads: int
    patch_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    qk_norm: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path: float = 0.0
    order_index: int = 0
    pre_norm: bool = True
    norm_adaptive: bool = False
    upcast_softmax: bool = True
    upcast_attention: bool = False
    scaled_cosine_attn: bool = False
    enable_rpe: bool = False
    add_coords_in_attn: str = "none"
    dtype: Any = None
    attn_impl: str = "auto"
    conv_interpret: bool = False  # run the windowed CPE kernel interpreted

    @nn.compact
    def __call__(self, feat, pc_aux, context_vec=None, deterministic=True,
                 cpe_feat=None):
        """pc_aux: dict with order/inverse/src_pos/key_valid/cpe_nmap/mask.

        cpe_feat: optional stale input for the CPE conv. The reference's
        SerializedUnpooling never refreshes point.sparse_conv_feat
        (model.py:817-828 updates only .feat), so the FIRST block after each
        unpooling runs its CPE conv on the proj_skip output rather than the
        skip+child sum; released checkpoints were trained with that dataflow,
        so decoder stages pass the skip features here for block 0."""
        def norm(name):
            return AdaptiveNorm(self.channels, kind="ln",
                                adaptive=self.norm_adaptive, name=name,
                                dtype=self.dtype)

        # CPE: conv -> linear -> LN, residual (model.py:615-625, 659-662)
        cpe = SubMConv(self.channels, 3, use_bias=True, name="cpe_conv",
                       dtype=self.dtype)(
            feat if cpe_feat is None else cpe_feat, pc_aux["cpe_nmap"],
            interpret=self.conv_interpret)
        cpe = dense(self.channels, name="cpe_fc", dtype=self.dtype)(cpe)
        # the reference builds the CPE's norm from norm_layer too
        # (model.py:30-39), so under AdaNorm it is an adaptive PDNorm
        cpe = norm("cpe_norm")(cpe, mask=pc_aux["mask"], context=context_vec,
                               use_running_average=deterministic)
        feat = feat + cpe

        shortcut = feat
        x = norm("norm1")(feat, mask=pc_aux["mask"], context=context_vec,
                          use_running_average=deterministic)
        x = SerializedAttention(
            self.channels, self.num_heads, self.patch_size,
            order_index=self.order_index, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, qk_norm=self.qk_norm,
            attn_drop=self.attn_drop, proj_drop=self.proj_drop,
            upcast_softmax=self.upcast_softmax, name="attn",
            upcast_attention=self.upcast_attention,
            scaled_cosine_attn=self.scaled_cosine_attn,
            enable_rpe=self.enable_rpe,
            add_coords_in_attn=self.add_coords_in_attn,
            dtype=self.dtype, attn_impl=self.attn_impl,
        )(x, pc_aux["order"], pc_aux["inverse"], pc_aux["src_pos"],
          pc_aux["key_valid"], deterministic=deterministic,
          grid_coord=pc_aux.get("grid_coord"), coord=pc_aux.get("coord"),
          counts=pc_aux.get("counts"))
        if self.drop_path > 0:
            x = drop_path(x, self.drop_path, deterministic,
                          self.make_rng("dropout"))
        feat = shortcut + x

        shortcut = feat
        x = norm("norm2")(feat, mask=pc_aux["mask"], context=context_vec,
                          use_running_average=deterministic)
        x = MLP(int(self.channels * self.mlp_ratio), self.channels,
                drop=self.proj_drop, name="mlp", dtype=self.dtype)(
            x, deterministic=deterministic)
        if self.drop_path > 0:
            x = drop_path(x, self.drop_path, deterministic,
                          self.make_rng("dropout"))
        feat = shortcut + x
        return feat


class CABlock(nn.Module):
    """Cross-attention block interleaved after each self-attn block in the CA
    variant (reference model_ca.py:104-152)."""
    channels: int
    num_heads: int
    mlp_ratio: float = 4.0
    qk_norm: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    norm_adaptive: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, feat, context, context_mask, pc_aux, context_vec=None,
                 deterministic=True):
        def norm(name):
            return AdaptiveNorm(self.channels, kind="ln",
                                adaptive=self.norm_adaptive, name=name,
                                dtype=self.dtype)

        shortcut = feat
        x = norm("norm1")(feat, mask=pc_aux["mask"], context=context_vec,
                          use_running_average=deterministic)
        x = CrossAttention(self.channels, self.num_heads, qk_norm=self.qk_norm,
                           attn_drop=self.attn_drop, proj_drop=self.proj_drop,
                           name="attn", dtype=self.dtype)(
            x, context, context_mask, deterministic=deterministic)
        feat = shortcut + x

        shortcut = feat
        x = norm("norm2")(feat, mask=pc_aux["mask"], context=context_vec,
                          use_running_average=deterministic)
        x = MLP(int(self.channels * self.mlp_ratio), self.channels,
                drop=self.proj_drop, name="mlp", dtype=self.dtype)(
            x, deterministic=deterministic)
        feat = shortcut + x
        return feat
