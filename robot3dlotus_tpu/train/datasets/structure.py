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
  stem_nmap:  (B, N, k^3) int16   — stencil neighbors in the sorted frame.
and skips its shuffle rng, stage-0 entry sort, and stem map construction
(models/ptv3.py __call__).

Not used under sequence parallelism: stem_nmap indexes each row's local
point axis, which an sp-sharded layout splits (the driver attaches
structure only when mesh.sp == 1).
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
    return dict(
        orders=tuple(p3.get("order") or p3.get("orders") or SFC_ORDERS),
        serial_depth=int(p3.get("serial_depth", 10)),
        grid_size=float(act.get("voxel_size", 0.01)),
        stem_kernel=int(p3.get("stem_kernel", 5)),
        lookup_extent=int(p3.get("lookup_extent", 128)),
        shuffle=bool(p3.get("shuffle_orders", True)),
    )


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
    counts = np.asarray(batch["pc_counts"])
    B, N, _ = pc.shape
    grid = np.zeros((B, N, 3), np.int32)
    for b in range(B):
        n = int(counts[b])
        if n == 0:
            continue
        xyz = pc[b, :n, :3]
        # float32 math identical to ptv3.compute_grid_coord
        gc = np.floor((xyz - xyz.min(0, keepdims=True)) / gs).astype(
            np.int32)
        np.clip(gc, 0, (1 << depth) - 1, out=gc)
        o = np.argsort(sfc_encode_np(gc, order0, depth), kind="stable")
        for key in _POINT_KEYS:
            if key in batch:
                batch[key][b, :n] = batch[key][b, :n][o]
        if "disc_pos_probs" in batch:
            dp = batch["disc_pos_probs"]
            v = dp[b].reshape(dp[b].shape[:-1] + (N, -1))
            v[..., :n, :] = v[..., o, :]
        grid[b, :n] = gc[o]

    batch["order_perm"] = perm
    ext = cfg.get("lookup_extent") or None
    assert N < np.iinfo(np.int16).max
    nmap = None
    if ext:
        # C++ dense-table builder (native/voxelize.cpp neighbor_map_dense):
        # ~25x over the numpy twin at release shape (B=16, N=4096, k=5) —
        # this runs per batch on the loader thread, so it must be far
        # cheaper than a device step. Bails (None) on out-of-extent coords.
        from ...native import neighbor_map_dense_native
        from ...ops.sparse_conv import stencil_offsets
        nmap = neighbor_map_dense_native(
            grid, counts, stencil_offsets(cfg["stem_kernel"]), ext)
    if nmap is None:
        nmap = build_neighbor_map_np(grid, counts, cfg["stem_kernel"],
                                     depth, extent=ext).astype(np.int16)
    batch["stem_nmap"] = nmap
    return batch
