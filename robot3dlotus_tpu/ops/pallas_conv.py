"""Pallas TPU kernel for submanifold sparse convolution via sorted windows.

The XLA paths in ops/sparse_conv.py pay the irreducible cost of random HBM
gathers: every one of the K stencil taps reads a (Cin,)-row of the feature
array at an arbitrary index — K * B * N * Cin bytes of scattered HBM traffic
per conv, at poor transaction efficiency.

This kernel exploits a property of the serialization the backbone already
relies on (reference model.py:96-128): after sorting points by z-order code,
3x3x3-stencil neighbors are overwhelmingly CLOSE in the sorted order.
Measured on voxelized tabletop scans (1 cm voxels, 4096 points): 98.3% of
neighbor links fall within +-256 sorted positions, 99.3% within +-512.

Dataflow (exact, not approximate):
  1. features are permuted to z-sorted order (one gather, B*N*Cin bytes);
  2. the kernel walks tiles of P=128 sorted points; for each tile ONE
     contiguous DMA brings the window [tile_start-H, tile_start+P+H) of
     sorted features into VMEM;
  3. in-window neighbor taps become VMEM reads, realised as a one-hot
     (P, Wn) x (Wn, Cin) matmul on the MXU (a gather the MXU is happy to
     do), followed by the (P, Cin) x (Cin, Cout) stencil matmul, accumulated
     over the K grid dimension into the output block;
  4. out-of-window links are compacted into per-tap static-capacity lists
     (B, K, Fk) and applied by XLA take_along_axis + ONE batched matmul
     over the tap axis + XLA scatter-add (both A/B-chosen on chip over the
     one-hot realizations, BENCH_AB_r05.json). Grouping by tap makes a far
     link cost ~2*Cin*Cout FLOPs (vs 2*Wn*Cin for a near link when
     Cout < Wn), so capacities can be generous — real tabletop scans have a heavy SFC-jump tail (~20% of
     links at halo 64) that the one-hot window should NOT pay for: shrinking
     the halo and widening the far lists is the cheaper trade. When the
     window covers the whole cloud (pooled stages: N <= P + 2H) there are
     no far links and the pass is skipped at trace time.

HBM traffic: the window DMAs re-read each sorted row (P+2H)/P ~ 5x, so
~5 * B*N*Cin contiguous bytes versus ~27 * B*N*Cin scattered bytes for the
gather paths — and contiguous DMA runs at full bandwidth.

Training: subm_conv_windowed is a custom_vjp. dL/dx is the SAME windowed
kernel with mirrored-transposed weights (the submanifold stencil relation is
symmetric: q = p + off[k]  <=>  p = q + off[K-1-k], reference spconv
semantics model.py:615-622), so the backward gather rides the same windows.
dL/dW rides the windows too (_dw_kernel: per-tap dW block VMEM-resident
across the (b, t) sweep) plus the compacted far list — no full-cloud
gathers anywhere in the VJP.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import flax.struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_precision import kernel_dot_precision
from .sparse_conv import NeighborMap, build_neighbor_map
from .serialization import z_order_encode


@flax.struct.dataclass
class WindowMap:
    """Sorted-domain neighbor structure for the windowed kernel.

    Array fields are pytree leaves (traced); tile/halo/window are static so
    they can shape the kernel grid.

    Far links are grouped BY STENCIL TAP with a static per-tap capacity
    (B, K, Fk): grouping turns the far correction into one batched matmul
    (einsum over the k axis) instead of K weight-masked passes over a flat
    list — 2*F*Cin*Cout FLOPs total rather than 2*K*F*Cin*Cout — which in
    turn makes generous capacities affordable; real tabletop scans need
    them (their SFC far-link tail is heavy: ~8.6k far links per 4096-point
    cloud at halo 64, up to ~780 on a single tap)."""
    order: jnp.ndarray      # (B, N) int32: sorted slot -> original index,
    #                         or None when the caller's frame IS the sorted
    #                         frame (presorted=True) — no sort/unsort permute
    inverse: jnp.ndarray    # (B, N) int32: original index -> sorted slot
    #                         (None iff order is None)
    rel: jnp.ndarray        # (B, T, K, P) int32: window-relative neighbor
    #                         slot, or -1 when absent/far (one-hot of -1
    #                         matches no window row, so it gathers zeros)
    far_src: jnp.ndarray    # (B, K, Fk) int32: sorted slot of the source
    far_dst: jnp.ndarray    # (B, K, Fk) int32: sorted slot of the dest
    far_ok: jnp.ndarray     # (B, K, Fk) bool
    far_dropped: jnp.ndarray  # (B,) int32 telemetry: links beyond capacity
    nmap: NeighborMap       # original-order map (kept for diagnostics)
    tile: int = flax.struct.field(pytree_node=False)
    halo: int = flax.struct.field(pytree_node=False)
    window: int = flax.struct.field(pytree_node=False)  # Wn = min(N, P+2H)


# Release-cascade defaults, shared by the backbone config (models/ptv3.py)
# and the host structure builder (train/datasets/structure.py) so the
# device windows and the host-shipped far lists always agree. Halos sized
# so the one-hot window stays tight (Wn = 256 at stages 0-2 and 320 at
# stage 3 — the r05 audit measured ZERO far links at halo 96 there, so
# shrinking from the full 512 window cuts ~2.6e11 step FLOPs for a
# 16-deep far capacity; stage 4 keeps a single full-cloud window);
# per-tap far capacities 1.25x the worst single-tap far count measured
# over 384 augmented keystep-pipeline clouds (FAR_AUDIT_r05.json,
# scripts/audit_far_capacity.py: tap-max 256/342/104/5/0) — the far
# gather/scatter fusions are row-count-bound (~8 ns/row, BENCH_NOTES
# r05), so every capacity slot costs like a real link every step;
# overflow is non-silent (cpe_far_dropped{s} telemetry).
DEFAULT_CONV_HALO = (64, 64, 64, 96, 192)
DEFAULT_CONV_FAR_PER_TAP = (320, 432, 136, 8, 8)


def _choose_tile(n: int) -> int:
    for p in (128, 64, 32, 16, 8):
        if n % p == 0:
            return min(p, n)
    return n


def _auto_far_per_tap(n: int) -> int:
    """Default per-tap far capacity: N/4 rounded up to 8 (max single-tap
    far count measured on dense tabletop scans at halo 64 is ~N/5 — the
    SFC jump tail concentrates on the corner taps), floored at 8."""
    return min(n, max(8, -(-n // 4 // 8) * 8))


def _compact_far_per_tap(q, ok, near, fk: int):
    """Group out-of-window links by stencil tap with static capacity.

    q, ok, near: (B, N, K) neighbor slots / validity / in-window flags.
    Returns far_src, far_dst: (B, K, Fk) int32, far_ok: (B, K, Fk) bool,
    far_dropped: (B,) int32. Within each tap, destinations come out in
    ascending slot order (top_k over descending position keys), so the
    per-tap lists are deterministic and cache-friendly to gather."""
    B, N, K = q.shape
    fk = min(fk, N)
    far = (ok & ~near).transpose(0, 2, 1)                    # (B, K, N)
    pos = jnp.arange(N, dtype=jnp.int32)
    vals, _ = jax.lax.top_k(jnp.where(far, N - pos, 0), fk)  # (B, K, Fk)
    far_ok = vals > 0
    far_dst = jnp.where(far_ok, N - vals, 0).astype(jnp.int32)
    far_src = jnp.take_along_axis(q.transpose(0, 2, 1), far_dst, axis=-1)
    far_src = jnp.where(far_ok, far_src, 0).astype(jnp.int32)
    far_dropped = (jnp.sum(far, axis=(-1, -2)) -
                   jnp.sum(far_ok, axis=(-1, -2))).astype(jnp.int32)
    return far_src, far_dst, far_ok, far_dropped


def build_window_map(grid_coord, mask, kernel_size: int, depth: int,
                     halo: int = 256, far_capacity: int | None = None,
                     tile: int | None = None, sort_order=None,
                     sort_inverse=None, extent: int | None = None,
                     presorted: bool = False) -> WindowMap:
    """grid_coord: (B, N, 3) int32 >= 0; mask: (B, N) bool.

    sort_order/sort_inverse: optionally reuse an existing spatially-local
    serialization sort (any SFC order qualifies — the window statistics
    hold for hilbert as for z) instead of argsorting z-codes again; the
    backbone passes its per-stage aux order (models/ptv3.py _make_aux).

    presorted: the caller's point frame is ALREADY a spatially-local
    serialized order (the sorted-resident backbone): neighbor indices from
    build_neighbor_map are window slots directly, order/inverse are None,
    and subm_conv_windowed skips the sort/unsort permutes entirely.
    """
    B, N, _ = grid_coord.shape
    nmap = build_neighbor_map(grid_coord, mask, kernel_size, depth,
                              extent=extent)
    if presorted:
        # the frame is already serialized: neighbor indices ARE sorted slots
        return window_map_from_nmap(nmap, halo=halo,
                                    far_capacity=far_capacity, tile=tile)
    K = nmap.idx.shape[-1]
    P = tile if tile is not None else _choose_tile(N)
    assert N % P == 0, (N, P)
    T = N // P
    Wn = min(N, P + 2 * halo)
    if far_capacity is None:
        far_capacity = _auto_far_per_tap(N)
    F = 1 if Wn == N else far_capacity  # no far links possible at Wn == N

    if sort_order is not None:
        order = sort_order.astype(jnp.int32)
        inverse = (sort_inverse if sort_inverse is not None
                   else jnp.argsort(order, axis=-1)).astype(jnp.int32)
    else:
        sentinel = jnp.int32(jnp.iinfo(jnp.int32).max)
        codes = jnp.where(mask, z_order_encode(grid_coord, depth), sentinel)
        order = jnp.argsort(codes, axis=-1).astype(jnp.int32)   # (B, N)
        inverse = jnp.argsort(order, axis=-1).astype(jnp.int32)

    # neighbor sorted slots, arranged by destination sorted slot. The
    # row rearrangement (B, N, K+1) -> sorted order is a row permute;
    # small integers are exact in f32, so it rides the one-hot kernel
    q_orig = jnp.take_along_axis(
        inverse, nmap.idx.reshape(B, -1), axis=-1).reshape(B, N, K)
    from .pallas_gather import permute_rows
    from .pallas_attention import pallas_available
    if pallas_available():
        qo = jnp.concatenate(
            [q_orig.astype(jnp.float32), nmap.ok.astype(jnp.float32)], -1)
        qo = permute_rows(qo, order)
        q = qo[..., :K].astype(jnp.int32)
        ok = qo[..., K:] > 0.5
    else:
        gather_order = jnp.broadcast_to(order[:, :, None], (B, N, K))
        q = jnp.take_along_axis(q_orig, gather_order, axis=1)  # (B,N,K)
        ok = jnp.take_along_axis(nmap.ok, gather_order, axis=1)

    slot = jnp.arange(N, dtype=jnp.int32)
    win_start = jnp.clip(
        (slot // P) * P - halo, 0, max(N - Wn, 0))               # (N,)
    rel = q - win_start[None, :, None]
    near = ok & (rel >= 0) & (rel < Wn)
    rel = jnp.where(near, rel, -1).astype(jnp.int32)
    rel = rel.reshape(B, T, P, K).transpose(0, 1, 3, 2)          # (B,T,K,P)

    far_src, far_dst, far_ok, far_dropped = _compact_far_per_tap(
        q, ok, near, F)

    return WindowMap(order=order, inverse=inverse, rel=rel,
                     far_src=far_src, far_dst=far_dst,
                     far_ok=far_ok, far_dropped=far_dropped, nmap=nmap,
                     tile=P, halo=halo, window=Wn)


def window_map_from_nmap(nmap: NeighborMap, halo: int = 256,
                         far_capacity: int | None = None,
                         tile: int | None = None,
                         host_far=None) -> WindowMap:
    """WindowMap for a frame that is ALREADY serialized (the sorted-resident
    backbone / host-shipped maps): neighbor indices ARE window slots, so no
    sort/unsort permutes and no code machinery — only the cheap elementwise
    rel split and the far-link compaction. This is the consumer of
    host-precomputed CPE maps (train/datasets/structure.py).

    host_far: optional (far (B, K, Fk, 2) int16 [src, dst; -1 = unused],
    dropped (B,) int32) — far lists the HOST already compacted
    (structure._stage_far_lists, bit-identical to _compact_far_per_tap),
    skipping the on-device per-tap top_k sorts entirely. The host must
    have used the same halo/tile (shared config — structure_cfg_from_model
    reads the model's knobs); Fk comes from the shipped shape."""
    B, N, K = nmap.idx.shape
    P = tile if tile is not None else _choose_tile(N)
    assert N % P == 0, (N, P)
    T = N // P
    Wn = min(N, P + 2 * halo)
    if far_capacity is None:
        far_capacity = _auto_far_per_tap(N)
    F = 1 if Wn == N else far_capacity
    q, ok = nmap.idx, nmap.ok

    slot = jnp.arange(N, dtype=jnp.int32)
    win_start = jnp.clip(
        (slot // P) * P - halo, 0, max(N - Wn, 0))               # (N,)
    rel = q - win_start[None, :, None]
    near = ok & (rel >= 0) & (rel < Wn)
    rel = jnp.where(near, rel, -1).astype(jnp.int32)
    rel = rel.reshape(B, T, P, K).transpose(0, 1, 3, 2)          # (B,T,K,P)

    if host_far is not None and Wn < N:
        far, far_dropped = host_far
        far_dst = far[..., 1].astype(jnp.int32)
        far_ok = far_dst >= 0
        far_src = jnp.where(far_ok, far[..., 0].astype(jnp.int32), 0)
        far_dst = jnp.where(far_ok, far_dst, 0)
        far_dropped = far_dropped.astype(jnp.int32)
    else:
        far_src, far_dst, far_ok, far_dropped = _compact_far_per_tap(
            q, ok, near, F)
    return WindowMap(order=None, inverse=None, rel=rel,
                     far_src=far_src, far_dst=far_dst,
                     far_ok=far_ok, far_dropped=far_dropped, nmap=nmap,
                     tile=P, halo=halo, window=Wn)


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------

def _tap_layout(K, cin, cout, itemsize, budget=int(4.5 * 1024 * 1024)):
    """Mosaic-legal (Kp, KB, CB) chunking of the (K, Cin, Cout) weight.

    The rel block is (1, 1, KB, P) and the weight block (KB, Cin, CB);
    Mosaic requires the last two block dims to be (8, 128)-divisible or
    equal to the array dims (lowering.py _check_block_mappings — the r03
    bench crash). Legal KB is therefore K itself (block == array dim) or a
    multiple of 8; K = 27/125 has no multiple-of-8 divisor, so when the
    whole-K weight chunk exceeds `budget` VMEM the tap axis is padded to
    Kp = ceil(K/8)*8 (padded rel = -1 gathers zeros; padded weight rows are
    zero) and KB ranges over multiple-of-8 divisors of Kp. When even KB=8
    is over budget (wide channels, e.g. 768x768), the output channel axis
    is split into CB-wide grid blocks (CB a multiple-of-128 divisor of
    Cout, or Cout itself).

    Chunking exists because a (B, T, K) grid pays the fixed per-step
    pipeline cost K times per tile — profiled at ~0.4 us/step, that was
    ~70% of the release CPE conv time and ~90% of the k=125 stem — so
    among legal layouts we maximize per-step work KB*CB (weight HBM
    traffic is layout-invariant: steps x block = Kp*Cin*Cout either way).
    Mosaic double-buffers grid-indexed blocks, so the live footprint is
    ~2x `budget`; 2*4.5 MB + the (Wn, Cin) window scratch (<2 MB at 768
    fp32) stays well under the ~16 MB VMEM/core."""
    if K * cin * cout * itemsize <= budget:
        return K, K, cout  # whole-K block: legal (== array dim), no pad
    kp = -(-K // 8) * 8
    kbs = [kb for kb in range(8, kp + 1, 8) if kp % kb == 0]
    cbs = [cb for cb in range(128, cout, 128) if cout % cb == 0] + [cout]
    best = None
    for kb in kbs:
        for cb in cbs:
            if kb * cin * cb * itemsize > budget:
                continue
            if best is None or kb * cb > best[0] * best[1]:
                best = (kb, cb)
    if best is None:  # correctness over budget: smallest legal chunk
        best = (8, min(cbs))
    return kp, best[0], best[1]


def _pad_taps(rel, weight, kp):
    """Pad the tap axis K -> kp: rel -1 (one-hot matches no window row, so
    gathers zeros) and weight zeros, keeping padded-tap contributions 0."""
    K = weight.shape[0]
    if kp == K:
        return rel, weight
    rel = jnp.pad(rel, ((0, 0), (0, 0), (0, kp - K), (0, 0)),
                  constant_values=-1)
    weight = jnp.pad(weight, ((0, kp - K), (0, 0), (0, 0)))
    return rel, weight


def _conv_kernel(rel_ref, w_ref, feat_hbm, out_ref, window, sem, *,
                 tile, halo, wn, n, kb):
    b = pl.program_id(0)
    t = pl.program_id(1)
    co = pl.program_id(2)
    kc = pl.program_id(3)

    @pl.when((co == 0) & (kc == 0))
    def _():
        start = jnp.clip(t * tile - halo, 0, max(n - wn, 0))
        # every reachable value (0, t*P-H, n-wn) is a multiple of the tile
        # gcd; Mosaic needs the divisibility proven for tiled-HBM slicing
        align = int(np.gcd.reduce([tile, halo or tile, max(n - wn, tile)]))
        start = pl.multiple_of(start, align)
        cp = pltpu.make_async_copy(
            feat_hbm.at[b, pl.ds(start, wn), :], window, sem)
        cp.start()
        cp.wait()

    @pl.when(kc == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    win = window[...]                                        # (Wn, Cin)
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, wn), 1)
    acc = None
    for j in range(kb):  # static unroll: kb taps per grid step
        rel = rel_ref[0, 0, j]                               # (P,) int32
        onehot = (rel[:, None] == iota)
        gathered = jax.lax.dot_general(                      # (P, Cin)
            onehot.astype(win.dtype), win,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=kernel_dot_precision(win),
            preferred_element_type=jnp.float32)
        contrib = jax.lax.dot_general(                       # (P, Cout)
            gathered.astype(w_ref.dtype), w_ref[j],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=kernel_dot_precision(w_ref[j]),
            preferred_element_type=jnp.float32)
        acc = contrib if acc is None else acc + contrib
    out_ref[0] += acc.astype(out_ref.dtype)


def _windowed_core(feat_sorted, rel, weight, *, tile, halo, wn,
                   interpret=False):
    """feat_sorted: (B, N, Cin); rel: (B, T, K, P); weight: (K, Cin, Cout).

    Returns (B, N, Cout) fp32: near-link contributions in sorted order.
    """
    B, N, Cin = feat_sorted.shape
    _, T, K, P = rel.shape
    Cout = weight.shape[-1]
    # the halo DMA slices rows out of the (1,128)-tiled HBM array, so the
    # channel width must be a lane multiple; zero-pad feat and the weight's
    # input axis together (release CPE widths 128/256/512/768 are already
    # aligned — only the 64-wide first stage pays the 2x window DMA)
    if Cin % 128 and not interpret:
        pad = 128 - Cin % 128
        feat_sorted = jnp.pad(feat_sorted, ((0, 0), (0, 0), (0, pad)))
        weight = jnp.pad(weight, ((0, 0), (0, pad), (0, 0)))
        Cin += pad
    KP, KB, CB = _tap_layout(K, Cin, Cout, weight.dtype.itemsize)
    rel, weight = _pad_taps(rel, weight, KP)
    kern = functools.partial(_conv_kernel, tile=tile, halo=halo, wn=wn, n=N,
                             kb=KB)
    flops = 2 * B * T * K * (P * wn * Cin + P * Cin * Cout)
    out = pl.pallas_call(
        kern,
        # kc innermost so each output block's revisits are consecutive
        # (accumulation stays VMEM-resident between them)
        grid=(B, T, Cout // CB, KP // KB),
        in_specs=[
            # one (KB, P) tap-chunk block per grid step: Mosaic wants the
            # last two block dims (8,128)-aligned or equal to the array
            # dims (KB is a multiple of 8 after _pad_taps, or == K);
            # chunking taps raises per-step work so the fixed pipeline
            # cost amortizes (see _tap_layout)
            pl.BlockSpec((1, 1, KB, P), lambda b, t, co, kc: (b, t, kc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KB, Cin, CB), lambda b, t, co, kc: (kc, 0, co),
                         memory_space=pltpu.VMEM),
            # keep features in HBM explicitly: under pl.ANY the compiler
            # may promote them to VMEM with 128-lane tiling, and the halo
            # DMA slice is then misaligned for Cin < 128
            pl.BlockSpec(memory_space=pltpu.HBM if not interpret else pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, P, CB), lambda b, t, co, kc: (b, t, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, Cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((wn, Cin), feat_sorted.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=B * T * wn * Cin * feat_sorted.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(rel, weight, feat_sorted)
    return out


def _far_gather(feat_sorted, idx2, interpret=False):
    """(B, M) row gather for the far lists: XLA take_along_axis.

    Round-5 on-chip A/B (BENCH_AB_r05.json far_path): at the release far
    shapes (M = K*Fk in 4-13k, N in 1-4k) XLA's native gather beats the
    one-hot MXU kernel 1.5-2.4x — M is small enough that the scattered
    reads stay cheap while the one-hot pays 2*B*M*N*C MXU FLOPs. The
    one-hot stays the winner where M is large (the full-N permutes and the
    M = N*K stem gather, 25x there — see ops/pallas_gather.py).

    The index keeps a SIZE-1 channel dim: materializing per-channel
    indices (broadcast_to) turns the lowering into 26M single-element
    gathers (measured 366 ms in-program where the row-gather form runs
    ~1.6 ms)."""
    del interpret
    return jnp.take_along_axis(feat_sorted, idx2[..., None], axis=1)


def _far_scatter_add(rows, dst, n, interpret=False):
    """Scatter-add rows (B, M, C) fp32 into (B, n, C) at row indices dst
    (B, M).

    Realization is shape-chosen: XLA's scatter-add beats the one-hot
    transpose-matmul 2.4-3x at the big far shapes (BENCH_AB_r05.json
    far_path, confirmed end-to-end: forcing one-hot everywhere cost 9
    samples/s), but at TINY index lists (stage 3's 432 rows) the one-hot's
    few-GFLOP matmul undercuts the XLA scatter fusion's fixed cost."""
    from .pallas_attention import pallas_available
    B, M, C = rows.shape
    onehot_flops = 2 * B * n * M * C
    if (pallas_available() or interpret) and onehot_flops <= 1e10:
        from .pallas_gather import scatter_rows_add
        return scatter_rows_add(rows, dst, n, interpret=interpret)
    zeros = jnp.zeros((B, n, C), rows.dtype)
    return jax.vmap(lambda z, g, i: z.at[i].add(g))(zeros, rows, dst)


def _far_correction(feat_sorted, wmap: WindowMap, weight, interpret=False):
    """Far links -> (B, N, Cout) fp32 in sorted order: ONE batched matmul
    over the tap axis (the per-tap grouping makes each tap's links share a
    weight slice), bracketed by XLA gather/scatter-add (A/B-chosen, see
    _far_gather/_far_scatter_add)."""
    B, N, _ = feat_sorted.shape
    K, Cin, Cout = weight.shape
    Fk = wmap.far_src.shape[-1]
    src = _far_gather(feat_sorted, wmap.far_src.reshape(B, K * Fk),
                      interpret=interpret)
    src = src.reshape(B, K, Fk, Cin)
    src = jnp.where(wmap.far_ok[..., None], src, 0).astype(jnp.float32)
    contrib = jnp.einsum("bkfc,kcd->bkfd", src,
                         weight.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
    return _far_scatter_add(contrib.reshape(B, K * Fk, Cout),
                            wmap.far_dst.reshape(B, K * Fk), N,
                            interpret=interpret)


def _windowed_forward(feat, wmap: WindowMap, weight, interpret=False):
    from .pallas_gather import permute_rows
    B, N, Cin = feat.shape
    # sort/unsort are row permutes: one-hot MXU kernel on TPU
    # (ops/pallas_gather.py), XLA gather elsewhere; skipped entirely when
    # the caller's frame is the sorted frame (presorted WindowMap)
    feat_sorted = feat if wmap.order is None else \
        permute_rows(feat, wmap.order, interpret=interpret)
    out_sorted = _windowed_core(
        feat_sorted, wmap.rel, weight,
        tile=wmap.tile, halo=wmap.halo, wn=wmap.window, interpret=interpret)
    if wmap.window < N:  # static: a full-cloud window has no far links
        out_sorted = out_sorted + _far_correction(
            feat_sorted, wmap, weight, interpret=interpret)
    if wmap.inverse is None:
        return out_sorted
    return permute_rows(out_sorted, wmap.inverse, interpret=interpret)


def _dw_kernel(rel_ref, g_ref, feat_hbm, dw_ref, window, sem, *,
               tile, halo, wn, n, kb):
    """dW[k] += gather(window, rel_k)^T @ g_tile for each tap k of this
    chunk, accumulated across the whole (b, t) sweep. Grid is (CO, KC, B, T)
    with the chunk indices OUTERMOST so the dW block for the chunk stays
    VMEM-resident while every window streams through; the window DMA
    re-issues per step (compute is ~2*P MACs per DMA'd byte, so the copy
    hides under the MXU on any healthy part)."""
    b = pl.program_id(2)
    t = pl.program_id(3)

    @pl.when((b == 0) & (t == 0))
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    start = jnp.clip(t * tile - halo, 0, max(n - wn, 0))
    align = int(np.gcd.reduce([tile, halo or tile, max(n - wn, tile)]))
    start = pl.multiple_of(start, align)
    cp = pltpu.make_async_copy(
        feat_hbm.at[b, pl.ds(start, wn), :], window, sem)
    cp.start()
    cp.wait()

    win = window[...]                                        # (Wn, Cin)
    g = g_ref[0].astype(jnp.float32)                         # (P, Cout)
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, wn), 1)
    for j in range(kb):  # static unroll: kb taps per grid step
        rel = rel_ref[0, 0, j]                               # (P,) int32
        onehot = (rel[:, None] == iota)
        gathered = jax.lax.dot_general(                      # (P, Cin)
            onehot.astype(win.dtype), win,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=kernel_dot_precision(win),
            preferred_element_type=jnp.float32)
        dw_ref[j] += jax.lax.dot_general(                    # (Cin, Cout)
            gathered, g,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _dw_windowed(feat_sorted, g_sorted, rel, *, tile, halo, wn,
                 interpret=False):
    """Near-link weight gradient: (K, Cin, Cout) fp32 from sorted-frame
    features and cotangents (rel as in _windowed_core)."""
    B, N, Cin = feat_sorted.shape
    _, T, K, P = rel.shape
    Cout = g_sorted.shape[-1]
    cin0 = Cin
    if Cin % 128 and not interpret:  # same lane alignment as the forward
        pad = 128 - Cin % 128
        feat_sorted = jnp.pad(feat_sorted, ((0, 0), (0, 0), (0, pad)))
        Cin += pad
    # the dW chunk is fp32 (itemsize 4) and stays resident across the whole
    # (b, t) sweep rather than double-buffering, same budget as the forward
    KP, KB, CB = _tap_layout(K, Cin, Cout, 4)
    if KP != K:  # padded rel taps are -1: they gather zeros into dw rows
        rel = jnp.pad(rel, ((0, 0), (0, 0), (0, KP - K), (0, 0)),
                      constant_values=-1)
    kern = functools.partial(_dw_kernel, tile=tile, halo=halo, wn=wn, n=N,
                             kb=KB)
    dw = pl.pallas_call(
        kern,
        grid=(Cout // CB, KP // KB, B, T),
        in_specs=[
            # (KB, P) tap-chunk block per (b, t) — same Mosaic alignment
            # rule as the forward (last two block dims must be
            # (8,128)-aligned or equal to the array dims)
            pl.BlockSpec((1, 1, KB, P), lambda co, kc, b, t: (b, t, kc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, CB), lambda co, kc, b, t: (b, t, co),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM if not interpret else pl.ANY),
        ],
        out_specs=pl.BlockSpec((KB, Cin, CB), lambda co, kc, b, t: (kc, 0, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((KP, Cin, Cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((wn, Cin), feat_sorted.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * K * (P * wn * Cin + P * Cin * Cout),
            bytes_accessed=B * T * K * wn * Cin
            * feat_sorted.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(rel, g_sorted, feat_sorted)
    return dw[:K, :cin0, :]


def _dw_far(feat_sorted, g_sorted, wmap: WindowMap, K, interpret=False):
    """Weight gradient of the far links: one batched matmul over the tap
    axis — dW[k] += sum_f x[src_kf]^T g[dst_kf]."""
    B = feat_sorted.shape[0]
    Fk = wmap.far_src.shape[-1]
    src = _far_gather(feat_sorted, wmap.far_src.reshape(B, K * Fk),
                      interpret=interpret)
    gdst = _far_gather(g_sorted, wmap.far_dst.reshape(B, K * Fk),
                       interpret=interpret)
    src = src.reshape(B, K, Fk, -1)
    gdst = gdst.reshape(B, K, Fk, -1).astype(jnp.float32)
    src = jnp.where(wmap.far_ok[..., None], src, 0).astype(jnp.float32)
    return jnp.einsum("bkfc,bkfd->kcd", src, gdst,
                      preferred_element_type=jnp.float32)


def _mirror_weight(weight):
    """W'[k] = W[K-1-k]^T — the adjoint stencil (offsets(K-1-k) == -offsets(k)
    in spconv's x-major ascending iteration order)."""
    return jnp.flip(weight, axis=0).transpose(0, 2, 1)


def _float0_zeros(tree):
    return jax.tree_util.tree_map(
        lambda x: np.zeros(np.shape(x), jax.dtypes.float0), tree)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _windowed_op(feat, weight, wmap: WindowMap, interpret=False):
    return _windowed_forward(feat, wmap, weight, interpret=interpret)


def _windowed_op_fwd(feat, weight, wmap, interpret):
    return _windowed_forward(feat, wmap, weight, interpret=interpret), \
        (feat, weight, wmap)


def _windowed_op_bwd(interpret, res, g):
    feat, weight, wmap = res
    g = g.astype(jnp.float32)
    # dx: same windows, mirrored-transposed weights (stencil symmetry)
    dx = _windowed_forward(g, wmap, _mirror_weight(weight),
                           interpret=interpret).astype(feat.dtype)
    # dW[k] = sum_links x[src]^T g[dst]: near links ride the SAME window
    # structure as the forward (one resident dW tap block per grid-k, see
    # _dw_kernel) instead of K full-cloud gathers; the compacted far list
    # supplies the remainder exactly.
    from .pallas_gather import permute_rows
    K = weight.shape[0]
    feat_sorted = feat if wmap.order is None else \
        permute_rows(feat, wmap.order, interpret=interpret)
    g_sorted = g if wmap.order is None else \
        permute_rows(g, wmap.order, interpret=interpret)
    dW = _dw_windowed(feat_sorted, g_sorted, wmap.rel, tile=wmap.tile,
                      halo=wmap.halo, wn=wmap.window, interpret=interpret)
    if wmap.window < feat.shape[1]:  # static: full-window => no far links
        dW = dW + _dw_far(feat_sorted, g_sorted, wmap, K,
                          interpret=interpret)
    return dx, dW.astype(weight.dtype), _float0_zeros(wmap)


_windowed_op.defvjp(_windowed_op_fwd, _windowed_op_bwd)


def subm_conv_windowed(feat, wmap: WindowMap, weight, bias=None,
                       interpret=False):
    """Drop-in equivalent of ops.sparse_conv.subm_conv_apply on a WindowMap.

    feat: (B, N, Cin); weight: (K, Cin, Cout); bias: (Cout,) or None.
    Exact (near links on the MXU via windows, far links via the compacted
    XLA pass) provided wmap.far_dropped is all zero — callers should surface
    that counter (cf. the pooling-overflow telemetry).

    Backward-pass precondition: dL/dx re-runs the forward with the
    mirrored-transposed stencil (_mirror_weight), which equals the true
    adjoint only when the neighbor relation is link-symmetric — i.e. every
    valid point owns a unique in-extent voxel coordinate. Duplicate voxel
    coords (scatter-min keeps the lowest index; the loser's reverse link is
    missing) or points outside the occupancy-table extent make dx silently
    drop those links' contributions, while the XLA subm_conv_apply path
    autodiffs exactly. Model-level voxelized inputs satisfy uniqueness by
    construction (one point per 1 cm voxel) and build_window_map's
    out-of-extent telemetry (conv_out_of_extent in the backbone outputs)
    covers the extent clause.
    """
    out = _windowed_op(feat, weight, wmap, interpret)
    if bias is not None:
        out = out + bias
    return out.astype(feat.dtype)
