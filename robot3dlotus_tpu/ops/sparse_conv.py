"""Submanifold sparse convolution for TPU: neighbor maps + gather-matmul.

Replaces spconv.SubMConv3d (reference model.py:615-622 CPE k=3, :844-852 stem
k=5). A submanifold conv keeps the active-site set fixed and, for each active
voxel v, computes  out[v] = sum_o W[o] @ feat[neighbor(v, o)]  over the k^3
stencil offsets o, skipping empty neighbors.

TPU-first formulation (static shapes, MXU-dominant):
  1. neighbor discovery = binary search: z-order-encode each voxel, sort once
     per stage, and for all k^3 offsets searchsorted the query codes
     (z-order encode of grid_coord + offset). One (B, N, K) int32 map per
     stage, shared by every conv in that stage — the analogue of spconv's
     indice_key caching (model.py:621, 1000).
  2. apply = one big matmul: gather neighbor features to (B, N, K*Cin) with
     zeros at missing neighbors, then einsum against W (K*Cin, Cout). XLA maps
     this straight onto the MXU; no scatter in the backward pass beyond the
     gather transpose.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .serialization import z_order_encode


class NeighborMap(NamedTuple):
    idx: jnp.ndarray    # (B, N, K) int32 — original-order point index of neighbor
    ok: jnp.ndarray     # (B, N, K) bool — neighbor exists


def stencil_offsets(kernel_size: int) -> np.ndarray:
    """k^3 offsets in spconv's iteration order (x-major, ascending), centered."""
    r = kernel_size // 2
    rng = np.arange(-r, kernel_size - r)
    grid = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), axis=-1)
    return grid.reshape(-1, 3).astype(np.int32)  # (K, 3)


def build_neighbor_map(grid_coord, mask, kernel_size: int, depth: int,
                       extent: int | None = None) -> NeighborMap:
    """grid_coord: (B, N, 3) int32 >= 0; mask: (B, N) bool.

    extent: when set, neighbor discovery uses a dense (B, extent^3)
    occupancy table (linear-address scatter + direct lookup) instead of
    z-order searchsorted — O(N*K) gathers instead of an O(N*K log) co-sort,
    the dominant index-build cost at the release shapes. The table requires
    every valid voxel coordinate < extent (the 1 cm workspace grid spans
    ~100 cells), but grid coords are only bounded by 2^depth and the ±180°
    z-rotation augmentation can push a cloud's axis-aligned span past
    extent cells — so when ANY valid coordinate is out of extent the whole
    batch falls back (lax.cond) to the extent-free searchsorted path
    instead of silently dropping those points' neighborhoods. Semantics of
    both paths match exactly, including lowest-index winner for duplicate
    coordinates (scatter-min vs stable sort)."""
    if extent is not None and extent > 0:
        import jax
        oob = jnp.any((jnp.max(grid_coord, axis=-1) >= extent) & mask)
        return jax.lax.cond(
            oob,
            lambda: _build_neighbor_map_sorted(grid_coord, mask,
                                               kernel_size, depth),
            lambda: _build_neighbor_map_dense(grid_coord, mask,
                                              kernel_size, extent))
    return _build_neighbor_map_sorted(grid_coord, mask, kernel_size, depth)


def _build_neighbor_map_sorted(grid_coord, mask, kernel_size: int,
                               depth: int) -> NeighborMap:
    B, N, _ = grid_coord.shape
    offs = stencil_offsets(kernel_size)  # (K, 3) numpy — static stencil
    K = offs.shape[0]

    sentinel = jnp.int32(jnp.iinfo(jnp.int32).max)
    codes = jnp.where(mask, z_order_encode(grid_coord, depth), sentinel)
    sort_idx = jnp.argsort(codes, axis=-1)
    codes_sorted = jnp.take_along_axis(codes, sort_idx, axis=-1)  # (B, N)

    # Stencil query keys by per-axis interleave composition: z-order lanes
    # are disjoint per axis, so code(p + off) = OR of three shifted-axis
    # interleaves. (2r+1)*3 interleaves instead of k^3*3 — ~9x less bit
    # work at k=3, ~25x at the k=5 stem.
    from .serialization import z_order_axis_interleave
    r = kernel_size // 2
    shifts = list(range(-r, kernel_size - r))
    hi = (1 << depth) - 1
    ax_key, ax_ok = [], []
    for a in range(3):
        va = grid_coord[..., a]
        ax_key.append({d: z_order_axis_interleave(
            jnp.clip(va + d, 0, hi), a, depth) for d in shifts})
        ax_ok.append({d: (va + d >= 0) & (va + d <= hi) for d in shifts})
    q_codes = jnp.stack(
        [ax_key[0][dx] | ax_key[1][dy] | ax_key[2][dz]
         for dx, dy, dz in offs.tolist()], axis=-1)          # (B, N, K)
    in_range = jnp.stack(
        [ax_ok[0][dx] & ax_ok[1][dy] & ax_ok[2][dz]
         for dx, dy, dz in offs.tolist()], axis=-1)

    # vectorized binary search per batch row
    pos = _vmap_searchsorted(codes_sorted, q_codes.reshape(B, -1))
    pos = jnp.clip(pos, 0, N - 1).astype(jnp.int32)
    found = jnp.take_along_axis(codes_sorted, pos, axis=-1) == \
        q_codes.reshape(B, -1)
    nbr = jnp.take_along_axis(sort_idx, pos, axis=-1).astype(jnp.int32)

    ok = found.reshape(B, N, K) & in_range & mask[:, :, None]
    idx = jnp.where(ok, nbr.reshape(B, N, K), 0)
    return NeighborMap(idx=idx, ok=ok)


def _build_neighbor_map_dense(grid_coord, mask, kernel_size: int,
                              extent: int) -> NeighborMap:
    B, N, _ = grid_coord.shape
    offs = stencil_offsets(kernel_size)  # (K, 3) numpy — static stencil
    K = offs.shape[0]
    E = extent
    cells = E * E * E

    in_ext = jnp.all((grid_coord >= 0) & (grid_coord < E), axis=-1) & mask
    lin = (grid_coord[..., 0] * (E * E) + grid_coord[..., 1] * E
           + grid_coord[..., 2])
    lin_own = jnp.where(in_ext, lin, cells)            # park invalid

    big = jnp.int32(N)
    table = jnp.full((B, cells + 1), big, jnp.int32)
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    # min: lowest original index wins for duplicate coords — matches the
    # stable-argsort + searchsorted-left winner of the sort path
    table = table.at[bidx, lin_own].min(
        jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N)))

    q = grid_coord[:, :, None, :] + jnp.asarray(offs)[None, None]  # (B,N,K,3)
    q_ok = jnp.all((q >= 0) & (q < E), axis=-1)
    lin_q = (q[..., 0] * (E * E) + q[..., 1] * E + q[..., 2])
    lin_q = jnp.where(q_ok, lin_q, cells).reshape(B, N * K)
    nbr = jnp.take_along_axis(table, lin_q, axis=-1).reshape(B, N, K)

    ok = (nbr < big) & q_ok & mask[:, :, None]
    idx = jnp.where(ok, nbr, 0)
    return NeighborMap(idx=idx, ok=ok)


def _vmap_searchsorted(sorted_rows, queries):
    import jax
    # method='sort' lowers to one co-sort of (keys ++ queries) instead of a
    # sequential log-N scan of dynamic slices; measured 7x faster on TPU for
    # the stencil workload (N=4k keys, N*K queries)
    return jax.vmap(
        lambda s, q: jnp.searchsorted(s, q, method="sort"))(
            sorted_rows, queries)


# test seam: run the smallc one-hot gather path in Pallas interpret mode on
# CPU (tests/test_structural_ops.py exercises the categorical-split branch)
_SMALLC_INTERPRET = False


def materialize_categorical(feat, categorical):
    """Concatenate the embedded categorical channels onto feat — the
    fallback for conv paths that don't split the gather (the smallc kernel
    gathers the raw index instead; see subm_conv_apply)."""
    if categorical is None:
        return feat
    cat_idx, cat_table = categorical
    return jnp.concatenate(
        [feat, cat_table[cat_idx.astype(jnp.int32)].astype(feat.dtype)],
        axis=-1)


def subm_conv_apply(feat, nmap: NeighborMap, weight, bias=None,
                    streaming: bool | None = None, categorical=None,
                    window_frame=False, host_far=None, host_farp=None,
                    telemetry=None):
    """feat: (B, N, Cin); weight: (K, Cin + E, Cout); bias: (Cout,) or None.

    out[b, n] = sum_k ok * W[k]^T feat[b, idx[b,n,k]]  (+ bias on active sites)

    categorical: optional (idx (B, N) int32 in [0, Kcat), table (Kcat, E)) —
    an embedded categorical feature logically concatenated to `feat`
    (the motion planner's per-point semantic labels,
    motion_planner_ptv3.py:165-166). The gather cost of the one-hot kernel
    family scales linearly with the gathered channel count, so instead of
    gathering the E embedding channels we gather the RAW index as ONE extra
    float channel and reconstruct the embedding post-gather with a one-hot
    row-select matmul — bit-identical (the one-hot picks exact table rows,
    and the table still receives gradients through the matmul), with
    (Cin+1)/(Cin+E) of the gather traffic.

    Two equivalent dataflows:
      * dense:     materialize (B, N, K, Cin) neighbor features, one
                   (B*N, K*Cin) x (K*Cin, Cout) matmul. Best MXU utilization,
                   but K x the activation HBM traffic (write + read of the
                   gathered tensor) and K x the peak activation memory —
                   452 MB per CPE at the release shapes (B=16, N=4096, K=27,
                   C=64 fp32).
      * streaming: lax.scan over the K stencil offsets, accumulating
                   gather(feat, idx_k) @ W[k] in an fp32 carry. Peak memory
                   O(B*N*C); HBM traffic is the gather reads only (the
                   irreducible cost), ~3x less than dense. Each step is a
                   (B*N, Cin) x (Cin, Cout) matmul — still MXU-shaped.

    Default: streaming for the 27/125-point stencils, dense for tiny ones.
    """
    if streaming is None:
        streaming = weight.shape[0] >= 27
    smallc_width = feat.shape[-1] + (1 if categorical is not None else 0)
    use_smallc = streaming and smallc_width <= 32
    if not use_smallc and categorical is not None:
        # fallback paths consume the materialized concat
        feat = materialize_categorical(feat, categorical)
        categorical = None
    if use_smallc:
        # tiny-Cin stencils (the k=5 stem: Cin=7 policy, 7(+1 label channel)
        # motion planner): gather ALL taps at once
        # through the two-level one-hot kernel (ops/pallas_gather.py) and do
        # one dense (B*N, K*Cin) x (K*Cin, Cout) matmul — the K scattered
        # row gathers of the scan were the single slowest op of the release
        # step. Falls back to the scan off-TPU.
        from .pallas_attention import pallas_available
        if pallas_available() or _SMALLC_INTERPRET:
            from .pallas_gather import gather_rows_smallc
            B, N, C = feat.shape
            K = nmap.idx.shape[-1]
            feat_nocat = feat
            if categorical is not None:
                cat_idx, cat_table = categorical
                # ship the raw index ONE-BASED: the windowed gather zeroes
                # out-of-window (far) rows, and a zero raw channel must
                # reconstruct to a ZERO embedding, not table[0] — far links
                # get their real contribution from the far path, so a
                # table[0] residue here would double-count into every far
                # link's destination
                feat = jnp.concatenate(
                    [feat, (cat_idx + 1).astype(feat.dtype)[..., None]],
                    axis=-1)
            # windowed stem gather when the CALLER vouches the frame is
            # sorted-resident (window_frame=True — neighbors fall in a
            # +-halo band of sorted positions; out-of-band links ride the
            # compacted far lists with overflow telemetry). 2.5x the
            # full-N two-level kernel at the release shape
            # (ops/pallas_stem.py); the full-N kernel stays both the
            # unaligned-shape fallback and the arbitrary-frame path.
            from .pallas_stem import (
                stem_gather_windowed, stem_window_available,
                stem_far_pooled_apply)
            far_info = None
            farp_out = None
            if window_frame and stem_window_available(feat, nmap.idx):
                if host_farp is not None:
                    # POOLED far list (training path): the windowed kernel
                    # handles near links only; far links ride ONE row
                    # gather + ONE scatter-add sized to ~actual link
                    # counts instead of K * per-tap capacity
                    # (stem_far_pooled_apply docstring)
                    g, _ = stem_gather_windowed(
                        feat, nmap, interpret=_SMALLC_INTERPRET,
                        with_far=False)
                    farp_out = stem_far_pooled_apply(
                        materialize_categorical(feat_nocat, categorical),
                        weight, host_farp[0])
                    if telemetry is not None:
                        telemetry["stem_far_dropped"] = jnp.sum(
                            host_farp[1].astype(jnp.int32))
                else:
                    g, far_info = stem_gather_windowed(
                        feat, nmap, host_far=host_far,
                        interpret=_SMALLC_INTERPRET)
                    if telemetry is not None:
                        telemetry["stem_far_dropped"] = (
                            jnp.sum(far_info[3]) if far_info is not None
                            else jnp.zeros((), jnp.int32))
            else:
                g = gather_rows_smallc(
                    feat, nmap.idx.reshape(B, N * K),
                    interpret=_SMALLC_INTERPRET).reshape(
                        B, N, K, feat.shape[-1])

            def _reconstruct(rows):
                # raw label-index channel -> embedding channels (the
                # gather ships 1 index channel instead of E, see
                # docstring). One-based match: a zeroed (out-of-window)
                # row matches NO table entry -> zero embedding
                onehot = (rows[..., -1:].astype(jnp.int32) ==
                          1 + jnp.arange(cat_table.shape[0],
                                         dtype=jnp.int32))
                lab = jnp.einsum(
                    "...e,ec->...c", onehot.astype(feat.dtype),
                    cat_table.astype(feat.dtype),
                    preferred_element_type=feat.dtype)
                return jnp.concatenate([rows[..., :-1], lab], axis=-1)

            if categorical is not None:
                g = _reconstruct(g)
            g = jnp.where(nmap.ok[..., None], g, 0.0)
            out = jnp.einsum("bnkc,kcd->bnd", g, weight,
                             preferred_element_type=jnp.float32)
            if far_info is not None:
                # far links: stencil first, then ONE scatter-add in the
                # (B, N, Cout) output shape — the A/B-fast scatter shape
                # (ops/pallas_stem.py docstring)
                rows, far_dst, far_ok, _ = far_info
                if categorical is not None:
                    rows = _reconstruct(rows)
                rows = jnp.where(far_ok[..., None], rows, 0.0)
                fc = jnp.einsum("bkfc,kcd->bkfd", rows, weight,
                                preferred_element_type=jnp.float32)
                Fk = rows.shape[2]
                import jax as _jax
                out = out + _jax.vmap(
                    lambda z, r, i: z.at[i].add(r))(
                        jnp.zeros_like(out),
                        fc.reshape(B, K * Fk, out.shape[-1]),
                        far_dst.reshape(B, K * Fk))
            if farp_out is not None:
                out = out + farp_out
            streaming = False
        else:
            out = _subm_conv_streaming(
                materialize_categorical(feat, categorical), nmap, weight)
    elif streaming:
        out = _subm_conv_streaming(feat, nmap, weight)
    else:
        gathered = _gather_neighbors(feat, nmap.idx)
        gathered = jnp.where(nmap.ok[..., None], gathered, 0.0)
        out = jnp.einsum(
            "bnkc,kcd->bnd", gathered, weight,
            preferred_element_type=jnp.float32,
        )
    if bias is not None:
        out = out + bias
    # accumulation is fp32 (preferred_element_type); return in the stream
    # dtype so a bfloat16 residual stream stays bfloat16
    return out.astype(feat.dtype)


def _subm_conv_streaming(feat, nmap: NeighborMap, weight):
    """scan over stencil offsets; fp32 accumulator of shape (B, N, Cout)."""
    import jax
    B, N, _ = feat.shape
    Cout = weight.shape[-1]

    # xs layout: (K, ...) so scan slices one stencil offset per step
    xs = (jnp.moveaxis(nmap.idx, -1, 0),   # (K, B, N)
          jnp.moveaxis(nmap.ok, -1, 0),    # (K, B, N)
          weight)                           # (K, Cin, Cout)

    def step(acc, x):
        idx_k, ok_k, w_k = x
        g = jnp.take_along_axis(
            feat, jnp.broadcast_to(idx_k[..., None], idx_k.shape +
                                   (feat.shape[-1],)), axis=1)
        g = jnp.where(ok_k[..., None], g, 0.0)
        acc = acc + jnp.einsum("bnc,cd->bnd", g, w_k,
                               preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((B, N, Cout), jnp.float32)
    # unroll: each while-loop iteration costs ~ms of fixed overhead on the
    # dev rig (dispatch + loop bookkeeping); batching 5 taps per iteration
    # amortizes it without blowing up compile time at K=125
    out, _ = jax.lax.scan(step, acc0, xs, unroll=5)
    return out


def _gather_neighbors(feat, idx):
    """feat: (B, N, C); idx: (B, N, K) -> (B, N, K, C)."""
    B, N, C = feat.shape
    K = idx.shape[-1]
    flat = idx.reshape(B, N * K)
    g = jnp.take_along_axis(
        feat, jnp.broadcast_to(flat[..., None], (B, N * K, C)), axis=1)
    return g.reshape(B, N, K, C)


def build_neighbor_map_np(grid_coord, counts, kernel_size: int,
                          depth: int, extent: int | None = None):
    """Host twin of build_neighbor_map for the input pipeline: the stencil
    neighbor map is weight-independent integer work, and on TPU its random
    table lookups run on the scalar unit (~230 ms/step for the k=5 stem at
    the release shape — half the train step), so the loader precomputes it
    and ships one int16 tensor per stencil (idx, -1 = missing) that
    prefetch overlaps with compute.

    grid_coord: (B, N, 3) int >= 0 (padding rows arbitrary); counts: (B,).
    Returns (B, N, K) int32 with -1 where there is no neighbor (semantics
    identical to the device builder incl. lowest-index duplicate winner).
    """
    import numpy as np
    B, N, _ = grid_coord.shape
    offs = stencil_offsets(kernel_size)
    K = offs.shape[0]
    p = np.arange(N)
    out = np.full((B, N, K), -1, np.int32)
    use_dense = extent is not None and extent > 0
    for b in range(B):
        n = int(counts[b])
        gc = grid_coord[b, :n].astype(np.int64)
        if use_dense and (n == 0 or gc.max(initial=0) < extent):
            E = extent
            table = np.full(E * E * E + 1, n, np.int32)
            lin = gc[:, 0] * (E * E) + gc[:, 1] * E + gc[:, 2]
            # lowest original index wins for duplicate coords
            np.minimum.at(table, lin, p[:n])
            q = gc[:, None, :] + offs[None]                 # (n, K, 3)
            q_ok = np.all((q >= 0) & (q < E), axis=-1)
            lin_q = q[..., 0] * (E * E) + q[..., 1] * E + q[..., 2]
            nbr = table[np.where(q_ok, lin_q, E * E * E)]
            out[b, :n] = np.where(q_ok & (nbr < n), nbr, -1)
        else:
            from .serialization import z_order_encode_np
            hi = (1 << depth) - 1
            codes = z_order_encode_np(np.clip(gc, 0, hi).astype(np.int32),
                                      depth)
            order = np.argsort(codes, kind="stable")
            cs = codes[order]
            q = gc[:, None, :] + offs[None]
            q_ok = np.all((q >= 0) & (q <= hi), axis=-1)
            qc = z_order_encode_np(
                np.clip(q, 0, hi).astype(np.int32), depth)
            pos = np.searchsorted(cs, qc.reshape(-1)).clip(0, max(n - 1, 0))
            found = (cs[pos] == qc.reshape(-1)) if n else \
                np.zeros(pos.shape, bool)
            nbr = order[pos]
            ok = found.reshape(n, K) & q_ok
            out[b, :n] = np.where(ok, nbr.reshape(n, K), -1)
    return out
