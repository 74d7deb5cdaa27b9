"""Host-precomputed batch structure: order shuffle + SFC presort + stem
neighbor map, built in the input pipeline so the device never spends scalar
cycles on weight-independent integer work.

Profile motivation (BENCH_NOTES round 3): at the release shape the k=5 stem
neighbor map costs ~230 ms of a 474 ms train step — the dense-table lookups
are random scalar loads the TPU runs at ~70 M/s. The loader computes the
same map with numpy (bit-identical: tests/test_structural_ops.py) while the
device trains on the previous batch; the map ships as ONE int16 tensor
(idx, -1 = missing, ~16 MB per release batch) that PrefetchToDevice
overlaps with compute.

The batch's point rows are REORDERED in place (sorted by the chosen order's
SFC code) — consumers are order-invariant (per-point losses/targets ride
the same permutation). The model sees:
  order_perm: (num_orders,) int32 — which order shuffle the host chose;
  stem_nmap:  (B, N, k^3) int16   — stencil neighbors in the sorted frame;
  cpe_nmap{s}: (B, cap_s, 27) int16 — each stage's CPE stencil map, built
    by replaying the pooling cascade on the host (parents are contiguous
    runs of codes >> 3 in the sorted-resident frame).
and skips its shuffle rng, stage-0 entry sort, stem map construction, and
every per-stage occupancy-table build (models/ptv3.py __call__/_make_aux).

Not used under sequence parallelism: stem_nmap indexes each row's local
point axis, which an sp-sharded layout splits (the driver attaches
structure only when mesh.sp == 1).

Stochasticity note: one order permutation is drawn PER BATCH and reused
across every pooling stage — the shipped cpe_nmap{s} cascade is only valid
in the unshuffled child frame (children inherit the parent's sort), so the
reference's per-stage redraw (SerializedPooling, model.py:220-224) cannot
be replayed without re-sorting every stage on device. Across training
steps each stage still sees every curve uniformly; only the within-step,
across-stage decorrelation differs. TRAIN.host_structure=False restores
the reference recipe exactly (see train/driver.py).
"""
from __future__ import annotations

import numpy as np

from ...ops.serialization import sfc_encode_np, SFC_ORDERS
from ...ops.sparse_conv import build_neighbor_map_np

# per-point batch keys that must ride the presort permutation
_POINT_KEYS = ("pc_fts", "robot_point_mask", "pc_robot_mask", "pc_labels")
# disc_pos_probs is also per-point but under a reshape: (B, [L,] 3, N*nb)
# with the point axis at -2 once the candidate axis is split off. The
# loaders never ship it (targets are rebuilt on device in the sorted
# frame), but the loss functions accept it as an override and then align
# it via preds["sort0"] — which is the identity when the HOST presorted,
# so the override must ride the presort here.


def structure_cfg_from_model(model_cfg):
    """MODEL config node -> the geometry knobs the host builder needs."""
    p3 = dict(model_cfg["ptv3_config"])
    act = dict(model_cfg["action_config"])
    from ...ops.pallas_conv import (
        DEFAULT_CONV_HALO, DEFAULT_CONV_FAR_PER_TAP)
    caps = p3.get("stage_caps")
    return dict(
        conv_halo=p3.get("conv_halo", DEFAULT_CONV_HALO),
        conv_far_per_tap=p3.get("conv_far_per_tap",
                                DEFAULT_CONV_FAR_PER_TAP),
        orders=tuple(p3.get("order") or p3.get("orders") or SFC_ORDERS),
        serial_depth=int(p3.get("serial_depth", 10)),
        grid_size=float(act.get("voxel_size", 0.01)),
        stem_kernel=int(p3.get("stem_kernel", 5)),
        lookup_extent=int(p3.get("lookup_extent", 128)),
        shuffle=bool(p3.get("shuffle_orders", True)),
        num_stages=len(p3["enc_depths"]),
        min_patch=int(min(p3["enc_patch_size"])),
        stage_caps=tuple(int(c) for c in caps) if caps else None,
    )


def _stage_caps_np(cfg, n0):
    """Host twin of PointTransformerV3TPU._stage_caps (models/ptv3.py):
    the shipped per-stage maps must use the exact capacities the model
    will compute for this point count."""
    caps_cfg, mp = cfg.get("stage_caps"), cfg["min_patch"]
    if caps_cfg is not None:
        base = list(caps_cfg)
        if n0 >= base[0]:
            return [min(base[0], n0)] + base[1:]
        out = [n0]
        for c in base[1:]:
            scaled = -(-c * n0 // base[0])
            scaled = -(-scaled // mp) * mp
            out.append(max(min(scaled, c), min(mp, n0)))
        return out
    caps = [n0]
    for _ in range(1, cfg["num_stages"]):
        caps.append(max(caps[-1] // 2, mp))
    return caps


def _stage_nmap(grid, counts, kernel, depth, ext):
    """One stage's stencil map: C++ dense table, numpy twin fallback."""
    from ...native import neighbor_map_dense_native
    from ...ops.sparse_conv import build_neighbor_map_np, stencil_offsets
    nmap = None
    if ext:
        nmap = neighbor_map_dense_native(
            grid, counts, stencil_offsets(kernel), ext)
    if nmap is None:  # no native lib, or coords out of the dense extent
        nmap = build_neighbor_map_np(grid, counts, kernel, depth,
                                     extent=ext or None).astype(np.int16)
    return nmap


def attach_host_structure(batch, cfg, rng):
    """Presort a collated batch by a host-chosen SFC order and attach the
    stem neighbor map. Mutates `batch` (numpy arrays) and returns it."""
    orders = cfg["orders"]
    depth = cfg["serial_depth"]
    gs = np.float32(cfg["grid_size"])
    perm = (rng.permutation(len(orders)) if cfg.get("shuffle", True)
            else np.arange(len(orders))).astype(np.int32)
    order0 = orders[int(perm[0])]

    pc = batch["pc_fts"]
    counts = np.asarray(batch["pc_counts"]).astype(np.int32)
    B, N, _ = pc.shape
    sentinel = np.int32(np.iinfo(np.int32).max)
    grid = np.zeros((B, N, 3), np.int32)
    codes = np.full((B, N), sentinel, np.int32)
    for b in range(B):
        n = int(counts[b])
        if n == 0:
            continue
        xyz = pc[b, :n, :3]
        # float32 math identical to ptv3.compute_grid_coord
        gc = np.floor((xyz - xyz.min(0, keepdims=True)) / gs).astype(
            np.int32)
        np.clip(gc, 0, (1 << depth) - 1, out=gc)
        c = sfc_encode_np(gc, order0, depth)
        o = np.argsort(c, kind="stable")
        for key in _POINT_KEYS:
            if key in batch:
                batch[key][b, :n] = batch[key][b, :n][o]
        if "disc_pos_probs" in batch:
            dp = batch["disc_pos_probs"]
            v = dp[b].reshape(dp[b].shape[:-1] + (N, -1))
            v[..., :n, :] = v[..., o, :]
        grid[b, :n] = gc[o]
        codes[b, :n] = c[o]

    batch["order_perm"] = perm
    batch.update(build_structure_maps(grid, codes, counts, cfg))
    return batch


def build_structure_maps(grid, codes, counts, cfg, depth=None,
                         with_far=True):
    """Stencil maps for a batch ALREADY in the sorted-resident frame:
    the k=stem_kernel stage-0 map plus the k=3 CPE map of every stage,
    replaying the pooling cascade (models/ptv3.py _pool on the unshuffled
    frame): parents are contiguous runs of codes >> 3; heads keep the
    run's first grid coord >> 1; overflow heads beyond the stage capacity
    are dropped exactly like ops/pooling.build_pool_maps. With these keys
    the model builds NO occupancy tables on the device (ptv3._make_aux).

    grid: (B, N, 3) int32 sorted-frame grid coords; codes: (B, N) int32
    chosen-order SFC codes (ascending per valid prefix); counts: (B,).
    Returns {"stem_nmap": ..., "cpe_nmap{s}": ...} (int16, -1 = missing).
    The eval actioner shares this builder for its latency path."""
    B, N = codes.shape
    depth = cfg["serial_depth"] if depth is None else depth
    sentinel = np.int32(np.iinfo(np.int32).max)
    ext = cfg.get("lookup_extent") or 0
    assert N < np.iinfo(np.int16).max
    # the C++ dense-table builder (native/voxelize.cpp neighbor_map_dense)
    # is ~50x over the numpy twin at release shape; it runs per batch on
    # the loader thread, so it must be far cheaper than a device step
    out = {"stem_nmap": _stage_nmap(grid, counts, cfg["stem_kernel"],
                                    depth, ext)}
    if with_far:
        # far lists for the windowed stem gather (ops/pallas_stem.py) —
        # geometry must mirror the kernel's own (halo/tile validated via
        # the shape-carried meta, models/ptv3.py stem path). Default
        # layout is POOLED (ops/pallas_stem.stem_far_pooled_apply): the
        # far gather/scatter fusions are row-count-bound, and the pooled
        # list carries 2.6x fewer rows than the per-tap rectangle
        # (FAR_AUDIT_r05.json; per-tap stays as stem_far_layout="per_tap"
        # and as the device-compaction fallback).
        from ...ops.pallas_stem import (
            DEFAULT_STEM_HALO, DEFAULT_STEM_FAR_PER_TAP,
            DEFAULT_STEM_FAR_POOL_FACTOR, _stem_tile)
        st = _stem_tile(N)
        layout = cfg.get("stem_far_layout", "pooled")
        if st is not None and layout == "pooled":
            pool = cfg.get("stem_far_pool") or \
                DEFAULT_STEM_FAR_POOL_FACTOR * N
            farp = _far_pool_np(out["stem_nmap"], DEFAULT_STEM_HALO,
                                int(pool), st)
            if farp is not None:
                out["stem_farp"], out["stem_farp_dropped"] = farp[:2]
                out["stem_farp_meta"] = np.zeros((0, farp[2], farp[3]),
                                                 np.int8)
        elif st is not None:
            far = _far_lists_np(out["stem_nmap"], DEFAULT_STEM_HALO,
                                min(DEFAULT_STEM_FAR_PER_TAP, N), st)
            if far is not None:
                out["stem_far"], out["stem_far_dropped"] = far[:2]
                out["stem_far_meta"] = np.zeros((0, far[2], far[3]),
                                                np.int8)
    caps = _stage_caps_np(cfg, N)
    for s in range(cfg["num_stages"]):
        if s > 0:
            cap = caps[s]
            new_grid = np.zeros((B, cap, 3), np.int32)
            new_codes = np.full((B, cap), sentinel, np.int32)
            new_counts = np.zeros(B, np.int32)
            for b in range(B):
                n = int(counts[b])
                if n == 0:
                    continue
                par = codes[b, :n] >> 3
                head = np.empty(n, bool)
                head[0] = True
                head[1:] = par[1:] != par[:-1]
                hidx = np.nonzero(head)[0][:cap]
                k = len(hidx)
                new_grid[b, :k] = grid[b, hidx] >> 1
                new_codes[b, :k] = par[hidx]
                new_counts[b] = k
            grid, codes, counts = new_grid, new_codes, new_counts
            depth = max(depth - 1, 1)
        nm = _stage_nmap(grid, counts, 3, depth, ext)
        out[f"cpe_nmap{s}"] = nm
        if with_far:
            far = _stage_far_lists(nm, s, cfg)
            if far is not None:
                out[f"cpe_far{s}"], out[f"cpe_far_dropped{s}"] = far[:2]
                # window geometry the lists were compacted against, carried
                # as a zero-size array's SHAPE (0, halo, tile) — static
                # metadata the model checks at trace time (ptv3._make_aux)
                halo, tile = far[2], far[3]
                out[f"cpe_far_meta{s}"] = np.zeros((0, halo, tile), np.int8)
    return out


def _stage_knob_np(val, s):
    """Host twin of PointTransformerV3TPU._stage_knob."""
    if val is None:
        return None
    if isinstance(val, (tuple, list)):
        return int(val[min(s, len(val) - 1)])
    return int(val)


def _stage_far_lists(nm, s, cfg):
    """Per-tap far lists for the windowed CPE conv, computed on the host so
    the device skips its per-stage top_k compaction (ops/pallas_conv.py
    _compact_far_per_tap — bit-identical lists: both keep the FIRST Fk far
    links of each tap in ascending destination order).

    nm: (B, cap, K) int16 stage stencil map (-1 = missing).
    Returns (far (B, K, Fk, 2) int16 [src, dst; -1 = unused slot],
             dropped (B,) int32, halo, tile), or None when the stage window
    covers the whole cloud (no far links possible). Shapes/halos derive
    from the SAME model config as the device windows
    (structure_cfg_from_model), which the model re-checks against its own
    knobs at trace time (Fk from the far shape; halo/tile from the shipped
    cpe_far_meta{s} zero-size shape)."""
    cap = nm.shape[1]
    halo = _stage_knob_np(cfg.get("conv_halo", 256), s)
    fk = _stage_knob_np(cfg.get("conv_far_per_tap"), s)
    if fk is None:
        fk = min(cap, max(8, -(-cap // 4 // 8) * 8))
    return _far_lists_np(nm, halo, min(fk, cap), _choose_tile_np(cap))


def _far_lists_np(nm, halo, fk, P):
    """Core per-tap far-list compaction for any window geometry (the CPE
    stages above and the stem window below share it). Vectorized: one
    partition+sort along the point axis instead of B*K flatnonzero loops
    (the K=125 stem made the loop a loader-thread hotspot)."""
    B, cap, K = nm.shape
    Wn = min(cap, P + 2 * halo)
    if Wn == cap:
        return None
    row = np.arange(cap, dtype=np.int32)
    ws = np.clip((row // P) * P - halo, 0, max(cap - Wn, 0)).astype(np.int32)
    # first fk far destinations per (b, k), ascending (bit-identical to the
    # device compaction's ordering): sentinel-cap non-far rows, partition
    # the smallest fk, then sort those. Everything runs in the
    # (B, K, cap)-transposed layout with in-place ops: the big elementwise
    # temporaries (not the sort) dominate on the single-core loader host.
    nmT = np.ascontiguousarray(nm.transpose(0, 2, 1))    # (B, K, cap)
    relT = nmT.astype(np.int32)
    relT -= ws[None, None, :]
    fmT = relT < 0
    fmT |= relT >= Wn
    fmT &= nmT >= 0                                      # (B, K, cap)
    posT = np.where(fmT, row[None, None, :], np.int32(cap))
    if fk < cap:
        posT = np.partition(posT, fk, axis=-1)[..., :fk]
    d = np.sort(posT, axis=-1)                           # (B, K, fk)
    valid = d < cap
    src = np.take_along_axis(nmT, np.where(valid, d, 0),
                             axis=-1)                    # (B, K, fk)
    out = np.full((B, K, fk, 2), -1, np.int16)
    out[..., 0] = np.where(valid, src, -1)
    out[..., 1] = np.where(valid, d, -1)
    dropped = (fmT.sum(axis=(1, 2))
               - valid.sum(axis=(1, 2))).astype(np.int32)
    return out, dropped, halo, P


def _far_pool_np(nm, halo, pool, P):
    """POOLED far list for one window geometry: every (dst, tap) link whose
    source falls outside dst's sorted window, packed as (B, pool, 2) int32
    [src * K + tap, dst] in dst-ascending (tap-minor) order, -1 = unused.

    The fused src*K+tap index addresses the device's (B, N*K, Cout)
    pre-applied tap table directly (ops/pallas_stem.stem_far_pooled_apply).
    Links beyond `pool` drop from the dst-ascending suffix, counted in
    dropped (B,) int32 — same non-silent overflow contract as the per-tap
    compaction, different tie-break (per-tap keeps each tap's FIRST Fk;
    pooled keeps the batch's first `pool` in dst order)."""
    B, cap, K = nm.shape
    Wn = min(cap, P + 2 * halo)
    if Wn == cap:
        return None
    row = np.arange(cap, dtype=np.int32)
    ws = np.clip((row // P) * P - halo, 0, max(cap - Wn, 0)).astype(np.int32)
    nmi = nm.astype(np.int32)                       # (B, cap, K) dst-major
    rel = nmi - ws[None, :, None]
    fm = (rel < 0) | (rel >= Wn)
    fm &= nmi >= 0
    out = np.full((B, pool, 2), -1, np.int32)
    dropped = np.zeros(B, np.int32)
    flat_fm = fm.reshape(B, cap * K)
    flat_src = nmi.reshape(B, cap * K)
    for b in range(B):
        ii = np.flatnonzero(flat_fm[b])             # dst-major ascending
        n = len(ii)
        if n > pool:
            dropped[b] = n - pool
            ii = ii[:pool]
            n = pool
        src = flat_src[b, ii]
        dst = ii // K
        tap = ii % K
        out[b, :n, 0] = src * K + tap
        out[b, :n, 1] = dst
    return out, dropped, halo, P


def _choose_tile_np(n):
    for p in (128, 64, 32, 16, 8):
        if n % p == 0:
            return min(p, n)
    return n
