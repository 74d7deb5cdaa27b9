"""TPU-native PointTransformerV3 backbone (U-Net over serialized point
patches), covering both conditioning variants of the reference:

  * context-vector conditioning through adaptive norms (PDNorm, reference
    model.py:864-1101 with pdnorm_adaptive=True) — the AdaNorm policy /
    motion-planner variant;
  * per-token cross-attention conditioning (reference model_ca.py:155-412) —
    the CA variant used by the released 3D-LOTUS policy
    (job_scripts/train_3dlotus_policy.sh: MODEL.model_class SimplePolicyPTV3CA).

Differences from the reference's execution model (all semantics-preserving,
see SURVEY.md §7):
  * clouds live in fixed-capacity padded (B, N_s, C) tensors with masks;
    per-stage capacities halve (stride-2 pooling merges >=2 surface voxels on
    average), keeping every shape static under jit;
  * spconv/flash-attn/torch_scatter are replaced by the XLA-native engines in
    ops/ (searchsorted neighbor maps + gather-matmul, dense duplicate-padded
    patch attention, masked scatter segment reduce);
  * grid coordinates are per-cloud (batch-composition-invariant) rather than
    the reference's batch-global coordinate origin (model.py:96-98);
  * serialization depth is static (default 10 <=> 2^10 voxels per axis)
    instead of data-adaptive (model.py:100-102);
  * SORTED-RESIDENT dataflow: where the reference keeps points in input
    order and permutes around every attention (model.py:468-557
    index_select in/out) and pooling, this backbone re-serializes each
    stage ONCE at stage entry (sort by the stage's first SFC order) and
    keeps the residual stream in that frame. Blocks whose order_index is 0
    — every block of the release depth-1 configs — then need ZERO
    permutes: duplicate-padding degenerates to a static shift+select, the
    windowed CPE conv consumes the frame directly, and pooling's segment
    maps are already contiguous. All per-point outputs (feat/coord/mask)
    are returned in the stage-0 sorted frame together with `sort0`
    (outputs[0], frame position -> input index) for aligning per-point
    ground truth. Per-cloud outputs (masked reductions, decoded actions)
    are unaffected.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.serialization import serialize_codes, argsort_with_inverse, SFC_ORDERS
from ..ops.patching import build_pad_maps
from ..ops.pooling import (
    build_pool_maps, segment_reduce, gather_heads, unpool_gather,
)
from ..ops.sparse_conv import build_neighbor_map
from ..ops.pallas_conv import DEFAULT_CONV_HALO, DEFAULT_CONV_FAR_PER_TAP
from .layers import (
    AdaptiveNorm, Block, CABlock, MaskedBatchNorm, SubMConv, dense, gelu,
)


def host_structure_kwargs(batch):
    """Collect the loader-shipped structure keys (train/datasets/
    structure.py) into PointTransformerV3TPU call kwargs: order_perm,
    stem_nmap, the per-stage cpe_nmap{s} cascade, and the per-stage
    windowed-conv far lists cpe_far{s} (absent for full-window stages)."""
    maps, fars, s = [], [], 0
    while f"cpe_nmap{s}" in batch:
        maps.append(batch[f"cpe_nmap{s}"])
        far = batch.get(f"cpe_far{s}")
        fars.append(None if far is None else
                    (far, batch[f"cpe_far_dropped{s}"],
                     batch.get(f"cpe_far_meta{s}")))
        s += 1
    stem_far = None
    if batch.get("stem_far") is not None:
        stem_far = (batch["stem_far"], batch["stem_far_dropped"],
                    batch.get("stem_far_meta"))
    stem_farp = None
    if batch.get("stem_farp") is not None:
        stem_farp = (batch["stem_farp"], batch["stem_farp_dropped"],
                     batch.get("stem_farp_meta"))
    return {"order_perm": batch.get("order_perm"),
            "stem_nmap": batch.get("stem_nmap"),
            "stem_far": stem_far,
            "stem_farp": stem_farp,
            "cpe_nmaps": tuple(maps) if maps else None,
            "cpe_fars": tuple(fars) if maps else None}


def _take_rows(x, order):
    """x: (B, N) or (B, N, D) -> rows rearranged by order (B, M)."""
    if x.ndim == 2:
        return jnp.take_along_axis(x, order, axis=1)
    idx = jnp.broadcast_to(order[..., None], order.shape + x.shape[2:])
    return jnp.take_along_axis(x, idx, axis=1)


def compute_grid_coord(coord, mask, grid_size, depth):
    """floor((coord - per-cloud min) / grid_size), clipped to the serial cube."""
    big = jnp.float32(1e9)
    cmin = jnp.min(jnp.where(mask[..., None], coord, big), axis=1, keepdims=True)
    gc = jnp.floor((coord - cmin) / grid_size).astype(jnp.int32)
    return jnp.clip(gc, 0, (1 << depth) - 1)


class SerializedPoolingTPU(nn.Module):
    """Grid pooling: linear proj -> segment max -> BN -> GELU
    (reference model.py:683-790)."""
    features: int
    reduce: str = "max"
    norm_adaptive: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, feat_sorted, maps, child_cap, child_mask,
                 context_vec=None, deterministic=True):
        x = dense(self.features, name="proj", dtype=self.dtype)(feat_sorted)
        x = segment_reduce(x, maps, child_cap, self.reduce)
        x = AdaptiveNorm(self.features, kind="bn",
                         adaptive=self.norm_adaptive, name="norm",
                         dtype=self.dtype)(
            x, mask=child_mask, context=context_vec,
            use_running_average=deterministic)
        x = gelu(x)
        return x


class SerializedUnpoolingTPU(nn.Module):
    """proj(child)[cluster] + proj_skip(parent); each proj is
    Linear -> BN -> GELU (reference model.py:793-828)."""
    features: int
    norm_adaptive: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, child_feat, child_mask, parent_feat, parent_mask,
                 cluster, child_cap, context_vec=None, deterministic=True):
        x = dense(self.features, name="proj_fc", dtype=self.dtype)(child_feat)
        x = AdaptiveNorm(self.features, kind="bn",
                         adaptive=self.norm_adaptive, name="proj_norm",
                         dtype=self.dtype)(
            x, mask=child_mask, context=context_vec,
            use_running_average=deterministic)
        x = gelu(x)
        skip = dense(self.features, name="proj_skip_fc",
                     dtype=self.dtype)(parent_feat)
        skip = AdaptiveNorm(self.features, kind="bn",
                            adaptive=self.norm_adaptive, name="proj_skip_norm",
                            dtype=self.dtype)(
            skip, mask=parent_mask, context=context_vec,
            use_running_average=deterministic)
        skip = gelu(skip)
        # also return the bare skip: the reference leaves the sparse-conv
        # feature buffer at this value (model.py:817-828 never refreshes it),
        # so the next block's CPE conv must consume it (see Block.cpe_feat)
        return skip + unpool_gather(x, cluster, child_cap), skip


class PointTransformerV3TPU(nn.Module):
    """The U-Net backbone. Returns the list of decoder layer outputs
    (dicts with feat/coord/mask/counts), mirroring return_dec_layers=True
    (reference model.py:1089-1098, model_ca.py:400-409)."""
    in_channels: int = 7
    orders: Tuple[str, ...] = SFC_ORDERS
    stride: Tuple[int, ...] = (2, 2, 2, 2)
    enc_depths: Tuple[int, ...] = (1, 1, 1, 1, 1)
    enc_channels: Tuple[int, ...] = (64, 128, 256, 512, 768)
    enc_num_head: Tuple[int, ...] = (2, 4, 8, 16, 32)
    enc_patch_size: Tuple[int, ...] = (128, 128, 128, 128, 128)
    dec_depths: Tuple[int, ...] = (1, 1, 1, 1)
    dec_channels: Tuple[int, ...] = (128, 128, 256, 512)
    dec_num_head: Tuple[int, ...] = (4, 4, 8, 16)
    dec_patch_size: Tuple[int, ...] = (128, 128, 128, 128)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    qk_norm: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path: float = 0.0
    pre_norm: bool = True
    shuffle_orders: bool = True
    upcast_softmax: bool = True
    upcast_attention: bool = False
    # swin-v2-style cosine attention with learned per-head temperature
    # (reference model.py:363,511-516)
    scaled_cosine_attn: bool = False
    # adaptive norms only in the decoder (+ last encoder stage); encoder
    # stem/pooling/blocks fall back to vanilla norms
    # (reference model.py:954,975,996)
    pdnorm_only_decoder: bool = False
    # learned relative-position bias in patch attention (reference
    # model.py:307-326/888; release configs train with it off)
    enable_rpe: bool = False
    # add Linear(3->C)-projected coords into attention inputs
    # ('none' | 'qkv' | 'qk', reference model.py:484-495)
    add_coords_in_attn: str = "none"
    # conditioning
    use_cross_attn: bool = False     # CA variant
    norm_adaptive: bool = False      # AdaNorm variant (pdnorm_adaptive)
    # geometry
    grid_size: float = 0.01
    serial_depth: int = 10
    # stem stencil size (reference model.py:845-852 uses k=5; shrinkable for
    # fast-compile dry runs / tests)
    stem_kernel: int = 5
    # computation dtype of the residual stream and all matmuls ('bfloat16'
    # doubles MXU throughput and halves HBM traffic; params, norm statistics,
    # softmax, and backbone outputs stay float32). None/'float32' = exact
    # fp32 path for parity tests and checkpoint-converted eval.
    compute_dtype: Optional[str] = None
    # patch-attention implementation: 'auto' | 'xla' | 'pallas' |
    # 'pallas_interpret' (see models/layers.py SerializedAttention)
    attn_impl: str = "auto"
    # CPE submanifold-conv implementation: 'auto' | 'xla' | 'pallas' |
    # 'pallas_interpret'. 'pallas' = the windowed kernel of
    # ops/pallas_conv.py (sorted-window DMA + MXU one-hot gather); 'auto'
    # enables it on TPU backends. The k=5 stem always uses the XLA
    # streaming path (125-offset stencils have weaker window locality).
    conv_impl: str = "auto"
    # sorted-order halo for the windowed conv: one int or a per-stage
    # tuple. Small halos keep the one-hot window matmul cheap (its FLOPs
    # scale with Wn = tile + 2*halo); links beyond the halo ride the
    # k-grouped far path, whose per-link cost is ~2*Cin*Cout — cheaper
    # than a near link whenever Cout < Wn — so a tight window + generous
    # far capacity beats a wide window on measured tabletop clouds
    # (ops/pallas_conv.py module docstring). Stages whose capacity is
    # <= tile + 2*halo run one full-cloud window and skip the far pass.
    # (release cascade: stage 4 has <= tile + 2*halo points, so it keeps a
    # single full-cloud window; stage 3 runs a 320-point window at halo 96,
    # where the r05 audit measured zero far links).
    # Defaults live in ops/pallas_conv.py (DEFAULT_CONV_HALO) so the host
    # structure builder ships matching far lists.
    conv_halo: Tuple[int, ...] | int = DEFAULT_CONV_HALO
    # per-tap static far-list capacity per stage (None = N/4 auto).
    # Sized ~1.5x over the worst single-tap far count measured on
    # realistic keystep-pipeline clouds at halo 64 (194/324/92/11/0 for
    # the release cascade; stage 1 is the worst stage — pooling packs
    # points 8x denser in grid space, so its sorted-order locality is
    # poorest). Overflow is counted in the conv_far_dropped telemetry,
    # never silent. One int applies to every stage.
    conv_far_per_tap: Tuple[int, ...] | int | None = DEFAULT_CONV_FAR_PER_TAP
    # dense occupancy-table neighbor lookup (ops/sparse_conv.py): voxel
    # coords must fit extent^3 (the release layout — xyz_shift 'center',
    # xyz_norm False, 1 cm voxels — spans ~100 cells; pooled stages only
    # shrink). Out-of-extent points degrade to 'no neighbors'; configs
    # that radius-normalize coords (xyz_norm True -> up to ~200 cells)
    # should set 0 to use the extent-free z-order searchsorted path.
    lookup_extent: int = 128
    # rematerialize each transformer block in the backward pass
    # (jax.checkpoint): trades ~30% more FLOPs for O(depth) less
    # activation HBM — the standard knob for scaling batch x points
    remat: bool = False
    # inputs arrive ALREADY sorted ascending by orders[0]'s SFC code
    # (invalid points at the tail) — e.g. the eval actioner presorts on the
    # host — so the stage-0 entry sort is skipped. Only honored when order
    # shuffling is inactive (deterministic eval); ignored otherwise.
    assume_sorted: bool = False
    # per-stage point capacities overriding the halve-per-stage default
    # (len == len(enc_depths); entry 0 is clamped to the input capacity).
    # Segments beyond a stage's capacity DROP their geometry (telemetry:
    # pool_overflow) — size these from scripts/audit_pool_capacity.py,
    # which measures worst-case unique-parent counts on real/generated
    # clouds at the release preprocessing.
    stage_caps: Optional[Tuple[int, ...]] = None

    @property
    def _dtype(self):
        if self.compute_dtype in (None, "float32", "fp32"):
            return None
        return jnp.dtype(self.compute_dtype)

    def _stage_caps(self, n0):
        if self.stage_caps is not None:
            assert len(self.stage_caps) == len(self.enc_depths), (
                f"stage_caps {self.stage_caps} must have one entry per "
                f"stage ({len(self.enc_depths)})")
            base = [int(c) for c in self.stage_caps]
            if n0 >= base[0]:
                return [min(base[0], n0)] + base[1:]
            # shrunken input capacity (eval point buckets): scale the
            # audited schedule proportionally, rounded up to a patch
            # multiple so attention tiling stays clean
            mp = min(self.enc_patch_size)
            out = [n0]
            for c in base[1:]:
                scaled = -(-c * n0 // base[0])
                scaled = -(-scaled // mp) * mp
                out.append(max(min(scaled, c), min(mp, n0)))
            return out
        caps = [n0]
        for s in range(1, len(self.enc_depths)):
            caps.append(max(caps[-1] // 2, min(self.enc_patch_size)))
        return caps

    def _stage_knob(self, val, s):
        """Per-stage int knob: tuples index by stage (last entry extends
        to deeper stages so shorter tuples stay valid for any depth);
        plain ints apply everywhere; None passes through."""
        if val is None:
            return None
        if isinstance(val, (tuple, list)):
            return int(val[min(s, len(val) - 1)])
        return int(val)

    def _conv_windowed(self):
        """(use windowed pallas kernel, run it interpreted) for the CPE."""
        if self.conv_impl == "pallas":
            return True, False
        if self.conv_impl == "pallas_interpret":
            return True, True
        if self.conv_impl == "auto":
            from ..ops.pallas_attention import pallas_available
            return pallas_available(), False
        return False, False

    def _used_order_indices(self, s):
        """Order indices any block of stage s (encoder or the decoder
        revisit) actually attends in — depth-1 stages use only index 0."""
        n_orders = len(self.orders)
        used = {i % n_orders for i in range(self.enc_depths[s])}
        if s < len(self.dec_depths):
            used |= {i % n_orders for i in range(self.dec_depths[s])}
        used.add(0)
        return sorted(used)

    def _make_aux(self, cur, s, patch, host_nmap=None, host_far=None):
        """Per-stage attention/conv structures, built in the stage's sorted
        frame (frame position == rank in codes[0]). order/inverse entries
        are None for index 0 (the frame itself — no permute) and real
        argsorts only for the extra orders deeper configs attend in.

        host_nmap: optional (B, cap, 27) int, -1 = missing — the stage's
        CPE stencil map precomputed by the input pipeline in THIS frame
        (train/datasets/structure.py replays the pooling cascade on the
        host), replacing the on-device occupancy-table build."""
        codes, counts, cap = cur["codes"], cur["counts"], cur["cap"]
        order = [None] * len(self.orders)
        inverse = [None] * len(self.orders)
        for i in self._used_order_indices(s):
            if i == 0:
                continue
            order[i], inverse[i] = argsort_with_inverse(codes[i])
        src_pos, key_valid = build_pad_maps(counts, cap, min(patch, cap))
        windowed, _ = self._conv_windowed()
        if host_nmap is not None:
            assert host_nmap.shape[1] == cap, (
                f"stage {s}: host cpe map cap {host_nmap.shape[1]} != "
                f"model cap {cap} — host/model stage_caps must agree")
            from ..ops.sparse_conv import NeighborMap
            nm = NeighborMap(idx=jnp.maximum(host_nmap, 0).astype(jnp.int32),
                             ok=host_nmap >= 0)
            if windowed:
                from ..ops.pallas_conv import (
                    window_map_from_nmap, _choose_tile)
                fcap = self._stage_knob(self.conv_far_per_tap, s)
                halo = self._stage_knob(self.conv_halo, s)
                if host_far is not None and fcap is not None:
                    assert host_far[0].shape[-2] == fcap, (
                        f"stage {s}: host far capacity "
                        f"{host_far[0].shape[-2]} != model conv_far_per_tap"
                        f" {fcap} — host/model configs must agree (derive "
                        f"both via structure_cfg_from_model)")
                    # the host compacted its lists against a specific
                    # window geometry; a halo/tile mismatch would silently
                    # double-count (or drop) links inside the device
                    # window, so the builder ships its (halo, tile) as the
                    # SHAPE of a zero-size meta array (static under jit)
                    # and the model refuses a divergent geometry
                    # (advisor r4, medium).
                    if len(host_far) > 2 and host_far[2] is not None:
                        mh, mt = host_far[2].shape[1], host_far[2].shape[2]
                        assert (mh, mt) == (halo, _choose_tile(cap)), (
                            f"stage {s}: host far lists built at "
                            f"halo/tile {(mh, mt)} != model "
                            f"{(halo, _choose_tile(cap))} — host/model "
                            f"configs must agree (derive both via "
                            f"structure_cfg_from_model)")
                    host_far = host_far[:2]
                cpe_nmap = window_map_from_nmap(
                    nm, halo=halo, far_capacity=fcap, host_far=host_far)
            else:
                cpe_nmap = nm
        elif windowed:
            from ..ops.pallas_conv import build_window_map
            # the stage frame IS a locality-preserving serialized order, so
            # the window map needs no sort of its own (presorted)
            cpe_nmap = build_window_map(
                cur["grid_coord"], cur["mask"], 3,
                cur["depth"], halo=self._stage_knob(self.conv_halo, s),
                far_capacity=self._stage_knob(self.conv_far_per_tap, s),
                presorted=True,
                extent=self.lookup_extent)
        else:
            cpe_nmap = build_neighbor_map(cur["grid_coord"], cur["mask"], 3,
                                          cur["depth"],
                                          extent=self.lookup_extent)
        return {
            "order": order, "inverse": inverse, "src_pos": src_pos,
            "key_valid": key_valid, "cpe_nmap": cpe_nmap,
            "mask": cur["mask"], "grid_coord": cur["grid_coord"],
            "coord": cur["coord"], "counts": counts,
        }

    def _entry_sort(self, cur, skip_sort):
        """Re-serialize a stage: sort every per-point array of `cur` by
        codes[0] (ascending; sentinel-coded invalid points to the tail) so
        the whole stage runs resident in that frame. skip_sort=True states
        codes[0] is ALREADY ascending by construction (un-shuffled child
        codes inherit the parent sort; presorted inputs at stage 0) and
        returns cur unchanged. Returns (cur_sorted, order|None)."""
        if skip_sort:
            return cur, None
        from ..ops.pallas_gather import permute_rows_any
        codes = cur["codes"]
        order = jnp.argsort(codes[0], axis=-1, stable=True).astype(jnp.int32)
        new = dict(cur)
        new["feat"] = permute_rows_any(cur["feat"], order)
        new["coord"] = _take_rows(cur["coord"], order)
        new["grid_coord"] = _take_rows(cur["grid_coord"], order)
        new["codes"] = jnp.take_along_axis(
            codes, jnp.broadcast_to(order[None], codes.shape), axis=-1)
        # valid points sort ahead of the sentinel tail: prefix mask
        new["mask"] = (jnp.arange(cur["cap"], dtype=jnp.int32)[None, :]
                       < cur["counts"][:, None])
        return new, order

    @nn.compact
    def __call__(self, coord, feat, mask, counts, context=None,
                 context_mask=None, context_vec=None, deterministic=True,
                 return_dec_layers=True, stem_categorical=None,
                 order_perm=None, stem_nmap=None, stem_far=None,
                 stem_farp=None, cpe_nmaps=None, cpe_fars=None):
        """coord: (B, N, 3); feat: (B, N, Cin); mask: (B, N) bool;
        counts: (B,) int32; context: (B, T, ctx) tokens for the CA variant;
        context_vec: (B, ctx) vector for adaptive norms;
        stem_categorical: optional (idx (B, N) int32, table (Kcat, E))
        categorical channels logically appended to feat for the stem conv
        only (the motion planner's semantic labels) — gathered as one raw
        index channel instead of E embedding channels (layers.SubMConv).

        Host-precomputed structure (train/datasets/structure.py — integer
        index work is weight-independent, so the input pipeline does it and
        prefetch hides it):
          order_perm: (num_orders,) int — the order shuffle the HOST chose;
            inputs must already be sorted by orders[order_perm[0]]'s SFC
            code (valid prefix). Replaces the in-model shuffle rng AND the
            stage-0 entry sort.
          stem_nmap: (B, N, stem_kernel^3) int — stem stencil neighbors in
            the presorted frame, -1 = missing (build_neighbor_map_np);
            replaces the on-device stem map construction.
          cpe_nmaps: optional per-stage tuple of (B, cap_s, 27) int CPE
            stencil maps (or None entries) — the host replays the pooling
            cascade, so these are valid iff order_perm was supplied (the
            frames match only in the host-presorted, unshuffled program).
          cpe_fars: optional per-stage tuple of (far (B, K, Fk, 2) int16,
            dropped (B,) int32) windowed-conv far lists (None for
            full-window stages) — same builder, same frame caveat; the
            shapes must match this model's conv_far_per_tap knobs
            (checked in _make_aux)."""
        num_stages = len(self.enc_depths)
        B, N0, _ = feat.shape
        caps = self._stage_caps(N0)
        depth0 = self.serial_depth
        pool_overflow = jnp.zeros((), jnp.int32)
        conv_far_dropped = jnp.zeros((), jnp.int32)
        _, conv_interp = self._conv_windowed()

        grid_coord = compute_grid_coord(coord, mask, self.grid_size, depth0)
        # dense occupancy-table telemetry: valid points whose per-cloud grid
        # coordinate exceeds lookup_extent lose every stencil tap (including
        # self) unless build_neighbor_map falls back to the searchsorted
        # path; surfaced like pool_overflow so training logs show it
        conv_out_of_extent = jnp.zeros((), jnp.int32)
        if self.lookup_extent and self.lookup_extent > 0:
            conv_out_of_extent = jnp.sum(
                (jnp.max(grid_coord, axis=-1) >= self.lookup_extent) & mask
            ).astype(jnp.int32)
        codes = serialize_codes(grid_coord, mask, depth0, self.orders)
        # the reference shuffles orders via torch.randperm in eval mode too
        # (model.py:130-134) — that randomness is what ensemble inference
        # averages over; here shuffling happens whenever a 'shuffle' rng is
        # supplied (training always supplies one), UNLESS the host already
        # chose the shuffle (order_perm input) and presorted the batch
        shuffle = self.shuffle_orders and order_perm is None and (
            not deterministic or self.has_rng("shuffle"))
        if shuffle:
            perm = jax.random.permutation(self.make_rng("shuffle"),
                                          len(self.orders))
            codes = codes[perm]
        elif order_perm is not None:
            codes = jnp.take(codes, order_perm, axis=0)

        # pdnorm_only_decoder means two DIFFERENT things in the reference:
        #  * plain/AdaNorm backbone (model.py:954,975,996): stem + encoder
        #    pooling + encoder block norms go vanilla (except last-stage ln)
        #  * CA backbone (model_ca.py:296): norms are untouched; instead the
        #    encoder CROSS-ATTENTION blocks are omitted except in the last
        #    stage ("condition only the decoder side")
        only_dec_norms = self.pdnorm_only_decoder and not self.use_cross_attn
        enc_adaptive = self.norm_adaptive and not only_dec_norms

        # --- stage-0 entry sort: everything downstream (stem conv included)
        # runs resident in the codes[0]-serialized frame ---
        cur = {
            "feat": feat, "coord": coord, "grid_coord": grid_coord,
            "mask": mask, "counts": counts, "codes": codes, "depth": depth0,
            "cap": N0,
        }
        skip0 = (self.assume_sorted or order_perm is not None) and not shuffle
        cur, sort0 = self._entry_sort(cur, skip_sort=skip0)
        if stem_categorical is not None and sort0 is not None:
            stem_categorical = (_take_rows(stem_categorical[0], sort0),
                                stem_categorical[1])
        if sort0 is None:  # consumers always get the frame map
            sort0 = jnp.broadcast_to(
                jnp.arange(N0, dtype=jnp.int32)[None, :], (B, N0))

        # stem: SubMConv k=5 + BN + GELU (reference model.py:831-861)
        dt = self._dtype
        if stem_nmap is not None:
            # host-precomputed map, valid only in the presorted frame
            assert skip0, "stem_nmap requires host-presorted inputs"
            from ..ops.sparse_conv import NeighborMap
            stem_map = NeighborMap(
                idx=jnp.maximum(stem_nmap, 0).astype(jnp.int32),
                ok=stem_nmap >= 0)
        else:
            stem_map = build_neighbor_map(cur["grid_coord"], cur["mask"],
                                          self.stem_kernel, depth0,
                                          extent=self.lookup_extent)
        # the frame here IS sorted-resident (entry sort above, or the host
        # presorted), so the stem gather may ride the windowed kernel
        # (ops/pallas_stem.py); host-shipped far lists must match its
        # window geometry (shape-carried meta, like the CPE check above)
        def _check_stem_meta(meta, kind):
            if meta is None:
                return
            from ..ops.pallas_stem import DEFAULT_STEM_HALO, _stem_tile
            mh, mt = meta.shape[1], meta.shape[2]
            want = (DEFAULT_STEM_HALO, _stem_tile(N0) or 0)
            assert (mh, mt) == want, (
                f"stem {kind} far lists built at halo/tile {(mh, mt)} != "
                f"kernel {want} — host/model configs must agree")

        stem_host_far = None
        stem_host_farp = None
        if stem_farp is not None and stem_nmap is not None:
            # pooled far list (capacity rides the shipped shape; only the
            # window geometry needs cross-checking)
            if len(stem_farp) > 2:
                _check_stem_meta(stem_farp[2], "pooled")
            stem_host_farp = stem_farp[:2]
        elif stem_far is not None and stem_nmap is not None:
            if len(stem_far) > 2:
                _check_stem_meta(stem_far[2], "per-tap")
            stem_host_far = stem_far[:2]
        stem_telemetry = {}
        x = SubMConv(self.enc_channels[0], self.stem_kernel, use_bias=False,
                     name="embedding_stem_conv", dtype=dt)(
            cur["feat"], stem_map, categorical=stem_categorical,
            window_frame=self._conv_windowed()[0],
            host_far=stem_host_far, host_farp=stem_host_farp,
            telemetry=stem_telemetry)
        if "stem_far_dropped" in stem_telemetry:
            conv_far_dropped = conv_far_dropped + \
                stem_telemetry["stem_far_dropped"]
        x = AdaptiveNorm(self.enc_channels[0], kind="bn",
                         adaptive=enc_adaptive, name="embedding_norm",
                         dtype=dt)(
            x, mask=cur["mask"], context=context_vec,
            use_running_average=deterministic)
        x = gelu(x)
        if dt is not None:
            x = x.astype(dt)
            if context is not None:
                context = context.astype(dt)
        cur["feat"] = x

        # static_argnums: `deterministic` steers Python-level branches
        # (dropout, attention impl), so it must stay concrete under remat;
        # remat-ed blocks are therefore called positionally
        Blk = nn.remat(Block, static_argnums=(4,)) if self.remat else Block
        CABlk = nn.remat(CABlock, static_argnums=(6,)) if self.remat             else CABlock

        # encoder
        enc_dp = _linspace(0.0, self.drop_path, sum(self.enc_depths))
        stage_state = []  # saved per stage for the decoder
        pool_records = []  # (cluster, parent stage index)
        for s in range(num_stages):
            if s > 0:
                cur, record, overflow = self._pool(
                    s, cur, caps[s], context_vec, deterministic,
                    shuffle=shuffle)
                pool_overflow = pool_overflow + overflow
                pool_records.append(record)
            # host maps are valid only when the batch frame IS the host-
            # presorted frame: order_perm supplied (training) or an
            # assume_sorted model (the eval actioner presorts on host)
            host_nmap = host_far = None
            if cpe_nmaps is not None and s < len(cpe_nmaps) and skip0:
                host_nmap = cpe_nmaps[s]
                if cpe_fars is not None and s < len(cpe_fars):
                    host_far = cpe_fars[s]
            aux = self._make_aux(cur, s, self.enc_patch_size[s],
                                 host_nmap=host_nmap, host_far=host_far)
            cur["aux"] = aux
            if hasattr(aux["cpe_nmap"], "far_dropped"):
                conv_far_dropped = conv_far_dropped + jnp.sum(
                    aux["cpe_nmap"].far_dropped)
            # reference model.py:996: under pdnorm_only_decoder all encoder
            # stages except the last use vanilla block norms (plain/AdaNorm
            # variant only — see only_dec_norms above)
            blk_adaptive = self.norm_adaptive and (
                not only_dec_norms or s == num_stages - 1)
            for i in range(self.enc_depths[s]):
                blk_dp = enc_dp[sum(self.enc_depths[:s]) + i]
                cur["feat"] = Blk(
                    self.enc_channels[s], self.enc_num_head[s],
                    min(self.enc_patch_size[s], cur["cap"]),
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale, qk_norm=self.qk_norm,
                    attn_drop=self.attn_drop, proj_drop=self.proj_drop,
                    drop_path=blk_dp, order_index=i % len(self.orders),
                    norm_adaptive=blk_adaptive,
                    upcast_softmax=self.upcast_softmax,
                    upcast_attention=self.upcast_attention,
                    scaled_cosine_attn=self.scaled_cosine_attn,
                    enable_rpe=self.enable_rpe,
                    add_coords_in_attn=self.add_coords_in_attn, dtype=dt,
                    attn_impl=self.attn_impl, conv_interpret=conv_interp,
                    name=f"enc{s}_block{i}",
                )(cur["feat"], aux, context_vec, deterministic, None)
                # CA variant of pdnorm_only_decoder (model_ca.py:296):
                # encoder CABlocks exist only in the last stage
                if self.use_cross_attn and (
                        not self.pdnorm_only_decoder or s == num_stages - 1):
                    cur["feat"] = CABlk(
                        self.enc_channels[s], self.enc_num_head[s],
                        mlp_ratio=self.mlp_ratio, qk_norm=self.qk_norm,
                        attn_drop=self.attn_drop, proj_drop=self.proj_drop,
                        norm_adaptive=self.norm_adaptive, dtype=dt,
                        name=f"enc{s}_cablock{i}",
                    )(cur["feat"], context, context_mask, aux,
                      context_vec, deterministic)
            stage_state.append(dict(cur))

        outputs = [self._pack(cur)]
        # frame map of the stage-0 sorted-resident outputs: per-point
        # results (outputs[-1] and all stage-0-cap layers) are in serialized
        # order; sort0[b, p] = input index of frame position p
        outputs[0]["sort0"] = sort0
        outputs[0]["pool_overflow"] = pool_overflow
        # windowed-conv exactness telemetry (0 = exact; >0 = links beyond
        # the far-capacity were dropped — surfaced like pool_overflow)
        outputs[0]["conv_far_dropped"] = conv_far_dropped
        outputs[0]["conv_out_of_extent"] = conv_out_of_extent

        # decoder (reference model.py:1012-1063)
        dec_dp = _linspace(0.0, self.drop_path, sum(self.dec_depths))
        dec_channels = list(self.dec_channels) + [self.enc_channels[-1]]
        for s in reversed(range(num_stages - 1)):
            parent = stage_state[s]
            cluster, child_cap = pool_records[s]
            feat_s, skip_s = SerializedUnpoolingTPU(
                dec_channels[s], norm_adaptive=self.norm_adaptive,
                dtype=dt, name=f"dec{s}_up",
            )(cur["feat"], cur["mask"], parent["feat"], parent["mask"],
              cluster, child_cap, context_vec=context_vec,
              deterministic=deterministic)
            cur = dict(parent)
            cur["feat"] = feat_s
            aux = parent["aux"]
            dp_slice = dec_dp[sum(self.dec_depths[:s]):
                              sum(self.dec_depths[:s + 1])][::-1]
            for i in range(self.dec_depths[s]):
                cur["feat"] = Blk(
                    dec_channels[s], self.dec_num_head[s],
                    min(self.dec_patch_size[s], cur["cap"]),
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale, qk_norm=self.qk_norm,
                    attn_drop=self.attn_drop, proj_drop=self.proj_drop,
                    drop_path=dp_slice[i], order_index=i % len(self.orders),
                    norm_adaptive=self.norm_adaptive,
                    upcast_softmax=self.upcast_softmax,
                    upcast_attention=self.upcast_attention,
                    scaled_cosine_attn=self.scaled_cosine_attn,
                    enable_rpe=self.enable_rpe,
                    add_coords_in_attn=self.add_coords_in_attn, dtype=dt,
                    attn_impl=self.attn_impl, conv_interpret=conv_interp,
                    name=f"dec{s}_block{i}",
                )(cur["feat"], aux, context_vec, deterministic,
                  skip_s if i == 0 else None)
                if not self.use_cross_attn and return_dec_layers:
                    outputs.append(self._pack(cur))
                if self.use_cross_attn:
                    cur["feat"] = CABlk(
                        dec_channels[s], self.dec_num_head[s],
                        mlp_ratio=self.mlp_ratio, qk_norm=self.qk_norm,
                        attn_drop=self.attn_drop, proj_drop=self.proj_drop,
                        norm_adaptive=self.norm_adaptive, dtype=dt,
                        name=f"dec{s}_cablock{i}",
                    )(cur["feat"], context, context_mask, aux,
                      context_vec, deterministic)
                    if return_dec_layers:
                        outputs.append(self._pack(cur))
        return outputs

    def _pool(self, s, cur, child_cap, context_vec, deterministic,
              shuffle=False):
        """Grid pooling in the sorted-resident frame: cur arrives sorted by
        its codes[0], so segments are contiguous runs and NO feature permute
        is needed. Children emerge in that same (parent-code >> 3) order;
        the child stage is then re-serialized only when order shuffling
        made its new codes[0] a different curve (_entry_sort)."""
        codes = cur["codes"]
        maps = build_pool_maps(codes[0], None, None, cur["counts"],
                               child_cap)

        new_feat = SerializedPoolingTPU(
            self.enc_channels[s],
            # vanilla-encoder-norm clause applies to the plain/AdaNorm
            # variant only (model.py:975 vs model_ca.py — see __call__)
            norm_adaptive=(self.norm_adaptive
                           and not (self.pdnorm_only_decoder
                                    and not self.use_cross_attn)),
            dtype=self._dtype, name=f"enc{s}_down",
        )(cur["feat"], maps, child_cap, maps.child_mask,
          context_vec=context_vec, deterministic=deterministic)
        new_coord = segment_reduce(cur["coord"], maps, child_cap, "mean")
        new_gc = gather_heads(cur["grid_coord"], None, maps) >> 1
        new_codes = jnp.stack([
            gather_heads(codes[k], None, maps) >> 3
            for k in range(codes.shape[0])
        ])
        sentinel = jnp.int32(jnp.iinfo(jnp.int32).max)
        new_codes = jnp.where(maps.child_mask[None], new_codes, sentinel)
        if shuffle:
            perm = jax.random.permutation(self.make_rng("shuffle"),
                                          len(self.orders))
            new_codes = new_codes[perm]
        # silent-drop telemetry: segments beyond child_cap lose geometry
        # (ops/pooling.py:48-49); surfaced per stage so training logs show
        # a nonzero pool_overflow instead of silently degrading
        overflow = jnp.sum(jnp.maximum(maps.child_counts - child_cap, 0))
        new_counts = jnp.minimum(maps.child_counts, child_cap)
        new_cur = {
            "feat": new_feat, "coord": new_coord, "grid_coord": new_gc,
            "mask": maps.child_mask, "counts": new_counts,
            "codes": new_codes, "depth": max(cur["depth"] - 1, 1),
            "cap": child_cap,
        }
        # child entry sort: unshuffled child codes[0] inherit the parent's
        # ascending order (code >> 3 of an ascending sequence) — skip
        new_cur, o_child = self._entry_sort(new_cur, skip_sort=not shuffle)
        if o_child is None:
            cluster = maps.seg_sorted
        else:
            # remap emission segment ids into the child's sorted frame;
            # the drop slot (child_cap) keeps pointing at the zero pad row
            inv_child = jnp.argsort(o_child, axis=-1).astype(jnp.int32)
            padded_inv = jnp.concatenate(
                [inv_child,
                 jnp.full((inv_child.shape[0], 1), child_cap, jnp.int32)],
                axis=1)
            cluster = jnp.take_along_axis(padded_inv, maps.seg_sorted,
                                          axis=1)
        return new_cur, (cluster, child_cap), overflow

    @staticmethod
    def _pack(cur):
        # heads and losses always consume float32 regardless of the
        # backbone compute dtype
        return {
            "feat": cur["feat"].astype(jnp.float32), "coord": cur["coord"],
            "mask": cur["mask"], "counts": cur["counts"],
        }


def _linspace(a, b, n):
    if n <= 1:
        return [b] * n
    return [a + (b - a) * i / (n - 1) for i in range(n)]
