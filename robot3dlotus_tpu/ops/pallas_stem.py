"""Windowed Pallas gather for the k=5 stem convolution's tiny-channel rows.

The stem conv (reference model.py:845-852: SubMConv3d k=5, Cin=7(+label))
gathers M = N*125 rows of <= 8 channels. XLA's scattered row gather is
catastrophic at this shape (937 ms on-chip vs 37 ms for the full-N two-level
one-hot, BENCH_AB_r05.json stem_gather), and the full-N one-hot pays
2*B*M*N_sub*C*NSUB MXU FLOPs it doesn't need: in the sorted-resident frame
stem neighbors are window-local exactly like the CPE stencil's
(ops/pallas_conv.py), so the hi-level one-hot only has to span a
P + 2*halo window instead of the whole cloud.

Kernel dataflow per (b, row-tile t, tap-chunk kc):
  1. ONE contiguous DMA of the window's NSUB-packed rows
     xr[b, ws/NSUB : ws/NSUB + Wn/NSUB] -> VMEM, where
     xr[b, blk, r*C8 + c] = feat[b, blk*NSUB + r, c]  (r-major: each
     16-row block is one 128-lane vector for C8 = 8);
  2. per tap: hi one-hot (P, Wn/NSUB) x (Wn/NSUB, C8*NSUB) on the MXU
     realizes the 16-row block; the in-block row is selected with ONE
     same-shape lane dynamic_gather (idx = lo*C8 + lane%C8 — Mosaic's only
     dynamic-gather form) and a static 8-lane slice;
  3. the per-tap (P, C8) slabs land in the output block's lanes, giving the
     SAME (B, N, K, C8) gathered intermediate as ops/pallas_gather
     gather_rows_smallc — the XLA stencil matmul, the label-embedding
     reconstruct, and the dW-from-residual autodiff downstream stay
     untouched.

Links outside the window ride host-shipped POOLED far lists by default
(stem_far_pooled_apply below; train/datasets/structure.py builds them),
with the rectangular per-tap layout kept as stem_far_layout="per_tap" and
as the device-side-compaction fallback (BENCH_AB_r05.json
stem_far_layout has the measured A/B of both plus two rejected pooled
realizations).

Measured at the release shape (B=16, N=4096, K=125, C8=8, bf16):
16.3 ms vs 41 ms for the full-N smallc gather + matmul.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_precision import kernel_dot_precision

NSUB = 16           # rows per packed block; C8 * NSUB = one 128-lane vector
C8 = 8              # padded channel width (policy stem 7, motion 7+label)
DEFAULT_STEM_HALO = 128   # window halo in sorted rows (DMA-alignment: the
#                           window start must stay a multiple of gcd(P, halo))
KB = 32             # taps per grid step
# per-tap far capacity at halo 128 on generated keystep-pipeline clouds:
# worst single-tap far count measured 372 over 72 release-preprocessed
# clouds (k=5 corner taps at 1 cm voxels, 4096 points) — sized ~1.4x over
# it; overflow rides the stem_far_dropped telemetry, never silent.
# This rectangular (K, Fk) layout is the device-side-compaction fallback;
# the training path ships a POOLED list instead (see stem_far_pooled_apply)
# because per-tap loads are skewed: K*Fk = 64000 slots/cloud vs a measured
# worst-case TOTAL of ~18.2k (FAR_AUDIT_r05.json), and the far
# gather/scatter fusions are row-count-bound (~8 ns/row).
DEFAULT_STEM_FAR_PER_TAP = 512
# pooled per-cloud far capacity, as a multiple of the point count: 6*N =
# 24576 at N=4096 covers the audited worst cloud total (18247) with 35%
# margin; truncation is dst-ascending-suffix and rides the same dropped
# telemetry
DEFAULT_STEM_FAR_POOL_FACTOR = 6


def _stem_tile(n: int):
    for p in (256, 128):
        if n % p == 0:
            return p
    return None


def stem_window_available(feat, idx):
    """Whether the windowed stem gather applies to these operands."""
    B, N, C = feat.shape
    return (feat.ndim == 3 and idx.ndim == 3 and C <= C8
            and _stem_tile(N) is not None
            and jnp.issubdtype(feat.dtype, jnp.floating))


def _gather_kernel(rel_ref, xr_hbm, out_ref, win, sem, *,
                   tile, halo, wn, n, kb, c8):
    b = pl.program_id(0)
    t = pl.program_id(1)
    kc = pl.program_id(2)
    P = tile
    lanes = c8 * NSUB
    s_w = wn // NSUB

    @pl.when(kc == 0)
    def _():
        ws = jnp.clip(t * tile - halo, 0, max(n - wn, 0))
        align = max(int(np.gcd.reduce(
            [tile, halo or tile, max(n - wn, tile)])) // NSUB, 1)
        h0 = pl.multiple_of(ws // NSUB, align)
        cp = pltpu.make_async_copy(xr_hbm.at[b, pl.ds(h0, s_w), :], win, sem)
        cp.start()
        cp.wait()

    w = win[...]                                        # (s_w, C8*NSUB)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (P, lanes), 1)
    for j in range(kb):
        rel = rel_ref[0, 0, j]                          # (P,) int32, -1 miss
        relc = jnp.maximum(rel, 0)
        hi = jnp.where(rel >= 0, relc // NSUB, -1)
        lo = relc % NSUB
        oh = (hi[:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (P, s_w), 1))
        y = jax.lax.dot_general(                        # (P, C8*NSUB) f32
            oh.astype(w.dtype), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=kernel_dot_precision(w),
            preferred_element_type=jnp.float32)
        # r-major lanes: candidate row r holds lanes [r*C8, (r+1)*C8);
        # pick the lo group per output row with a same-shape lane gather
        idx_sel = lo[:, None] * c8 + (lane_iota % c8)
        g_rep = jnp.take_along_axis(y, idx_sel, axis=1)
        out_ref[0, :, j * c8:(j + 1) * c8] = \
            g_rep[:, :c8].astype(out_ref.dtype)


def _gather_call(feat, rel, interpret=False):
    """feat (B, N, C8); rel (B, T, KP, P) window-relative (-1 = not near).
    Returns (B, N, KP*C8) near-gathered rows in feat dtype."""
    B, N, _ = feat.shape
    _, T, KP, P = rel.shape
    halo = DEFAULT_STEM_HALO
    wn = min(N, P + 2 * halo)
    xr = feat.reshape(B, N // NSUB, NSUB * C8)
    kb = KB if KP % KB == 0 else KP
    kern = functools.partial(_gather_kernel, tile=P, halo=halo, wn=wn, n=N,
                             kb=kb, c8=C8)
    return pl.pallas_call(
        kern,
        grid=(B, T, KP // kb),
        in_specs=[
            pl.BlockSpec((1, 1, kb, P), lambda b, t, kc: (b, t, kc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM if not interpret
                         else pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, P, kb * C8), lambda b, t, kc: (b, t, kc),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, KP * C8), feat.dtype),
        scratch_shapes=[
            pltpu.VMEM((wn // NSUB, C8 * NSUB), feat.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * KP * (wn // NSUB) * C8 * NSUB,
            bytes_accessed=B * T * wn * C8 * feat.dtype.itemsize
            + B * N * KP * C8 * feat.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(rel, xr)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _windowed_gather_op(feat, rel, flat_idx, interpret):
    return _gather_call(feat, rel, interpret=interpret)


def _windowed_gather_fwd(feat, rel, flat_idx, interpret):
    proto = jnp.zeros((feat.shape[1], 0), feat.dtype)  # shape/dtype carrier
    return _gather_call(feat, rel, interpret=interpret), (proto, flat_idx)


def _windowed_gather_bwd(interpret, res, g):
    # cotangent scatter rides the existing full-N two-level kernel
    # (ops/pallas_gather._smallc_bwd_call) on the FLAT original indices —
    # only live when the stem input itself carries gradients (it normally
    # does not: pc features and the raw label-index channel are inputs)
    from .pallas_gather import _smallc_bwd_call
    proto, flat_idx = res
    B = g.shape[0]
    N = proto.shape[0]
    KP = g.shape[-1] // C8
    g3 = g.reshape(B, N * KP, C8)
    dx = _smallc_bwd_call(flat_idx, g3, N, interpret)
    return dx.astype(proto.dtype), None, None


_windowed_gather_op.defvjp(_windowed_gather_fwd, _windowed_gather_bwd)


def stem_gather_windowed(feat, nmap, host_far=None, interpret=False,
                         far_per_tap: int | None = None,
                         with_far: bool = True):
    """Windowed drop-in for the stem's gather_rows_smallc call.

    feat: (B, N, C<=8) float (will be zero-padded to C8 channels);
    nmap: NeighborMap with idx (B, N, K) in the SAME (sorted-resident)
    frame as feat; host_far: optional (far (B, K, Fk, 2) int16, dropped
    (B,) int32) from train/datasets/structure.py (stem geometry: the
    shipped meta shape is validated by the caller).

    Returns (gathered (B, N, K, C) in feat dtype — NEAR links only,
             far_info — None, or (rows (B, K, Fk, C), dst (B, K, Fk),
                                   ok (B, K, Fk), dropped (B,) int32)).
    Far rows are handed back raw rather than scattered into the (B, N*K)
    intermediate: the consumer applies the stencil weight to them and
    scatter-adds the (B, K*Fk, Cout) result into the (B, N, Cout) output
    — XLA's scatter over the 125x-larger intermediate ran at ~1 GB/s on
    chip (300-570 ms per scatter) while the post-stencil shape matches the
    A/B-validated fast path (BENCH_AB_r05.json far_path).
    """
    from .pallas_conv import _compact_far_per_tap
    B, N, C = feat.shape
    K = nmap.idx.shape[-1]
    P = _stem_tile(N)
    halo = DEFAULT_STEM_HALO
    wn = min(N, P + 2 * halo)
    T = N // P
    KP = -(-K // KB) * KB if K > KB else K

    if C < C8:
        feat = jnp.pad(feat, ((0, 0), (0, 0), (0, C8 - C)))

    q = nmap.idx.astype(jnp.int32)
    ok = nmap.ok
    slot = jnp.arange(N, dtype=jnp.int32)
    win_start = jnp.clip((slot // P) * P - halo, 0, max(N - wn, 0))
    rel = q - win_start[None, :, None]
    near = ok & (rel >= 0) & (rel < wn)
    rel = jnp.where(near, rel, -1).astype(jnp.int32)
    rel = rel.reshape(B, T, P, K).transpose(0, 1, 3, 2)       # (B,T,K,P)
    if KP != K:
        rel = jnp.pad(rel, ((0, 0), (0, 0), (0, KP - K), (0, 0)),
                      constant_values=-1)

    # flat original indices for the (rarely live) backward scatter: sentinel
    # N for non-near entries so their cotangents drop
    flat = jnp.where(near, q, N).reshape(B, N * K)
    if KP != K:
        flat = jnp.concatenate(
            [flat.reshape(B, N, K),
             jnp.full((B, N, KP - K), N, jnp.int32)], -1).reshape(B, N * KP)

    g = _windowed_gather_op(feat, rel, flat, interpret)       # (B,N,KP*C8)
    g = g.reshape(B, N, KP, C8)[:, :, :K, :]

    far_info = None
    if wn < N and with_far:
        if host_far is not None:
            far, far_dropped = host_far[0], host_far[1].astype(jnp.int32)
            far_dst = far[..., 1].astype(jnp.int32)
            far_ok = far_dst >= 0
            far_src = jnp.where(far_ok, far[..., 0].astype(jnp.int32), 0)
            far_dst = jnp.where(far_ok, far_dst, 0)
        else:
            fk = far_per_tap or DEFAULT_STEM_FAR_PER_TAP
            far_src, far_dst, far_ok, far_dropped = _compact_far_per_tap(
                q, ok, near, min(fk, N))
        Fk = far_src.shape[-1]
        # size-1 channel dim on the index = ROW gather lowering (the
        # materialized broadcast form degrades to per-element gathers)
        rows = jnp.take_along_axis(
            feat, far_src.reshape(B, K * Fk)[..., None], axis=1)
        rows = jnp.where(far_ok.reshape(B, K * Fk)[..., None], rows, 0)
        far_info = (rows.reshape(B, K, Fk, C8)[..., :C], far_dst, far_ok,
                    far_dropped)

    return g[..., :C], far_info


def stem_far_pooled_apply(feat, weight, farp):
    """Far-link contribution of the stem conv from a host-shipped POOLED
    list (stem_far_layout="pooled") — an alternative to the per-tap
    (B, K, Fk, 2) layout above.

    feat: (B, N, Cin) with Cin the FULL stencil input width (categorical
    channels already materialized); weight: (K, Cin, Cout);
    farp: (B, F, 2) int32 [src * K + tap, dst] sorted by dst ascending,
    -1 = unused slot.

    Returns the (B, N, Cout) float32 far contribution:
        out[b, dst] += feat[b, src] @ weight[tap]   for each link.

    Realization: the far gather/scatter fusions are ROW-COUNT-bound on
    this chip (~8 ns/row from the 64 KB feat table), so the pooled list
    pays them on ~actual links (capacity 6*N = 24576/cloud over an
    audited worst-case total of 18247, FAR_AUDIT_r05.json) instead of
    the per-tap layout's K * max-tap-load = 64000 capacity slots. The
    per-row tap matrix rides a ONE-HOT OVER TAPS (Kpad = 128):
    Wg[b, f] = onehot(tap) @ W_pack(Kpad, Cin*Cout) is an MXU matmul of
    B*F*Kpad*Cin*Cout FLOPs (~1e11 counted with its dW transpose), then
    out_row = sum_i rows[.., i] * Wg[.., i, :] on the VPU. A row-GATHER
    Wg (zero counted FLOPs) matches it in the forward but loses 3.5
    samples/s end-to-end: its dW cotangent is a 393k-row scatter-add
    into the 125-row weight table (hot-spot serialization), where the
    one-hot's dW is a clean (Kpad, B*F) x (B*F, Cin*Cout) MXU matmul
    (A/B in BENCH_NOTES r05).

    Two REJECTED alternatives, measured on chip (BENCH_NOTES r05):
      * a pre-applied (B, N*K, Cout) tap table — gathers from the 1 GB
        table ran at 2x the ns/row of the small-table gather, and its
        autodiff cotangent scatter lowered to a 64-step serialized loop
        (~110 ms/step all-in);
      * a khatri-rao one-hot over K*Cin — pays K x the matmul FLOPs on
        every row (the kernel-family inflation round 3 flagged).

    Backward is plain autodiff: gathers, scatter-adds, and dense
    contractions in small shapes only; the Wg residual is (B, F,
    Cin*Cout) bf16 (~0.4 GB at the release shape).
    """
    B, N, Cin = feat.shape
    K, wc, Cout = weight.shape
    assert wc == Cin, (wc, Cin)
    src_tap = farp[..., 0]
    dst = farp[..., 1]
    ok = dst >= 0
    src_tap = jnp.where(ok, src_tap, 0)
    dst = jnp.where(ok, dst, 0)
    src = src_tap // K
    tap = src_tap - src * K
    # per-row input rows from the SMALL (B, N, Cin) table — size-1
    # trailing dim on the index = ROW gather lowering (a materialized
    # broadcast index degrades to per-element gathers)
    rows = jnp.take_along_axis(feat, src[..., None], axis=1)   # (B, F, Ci)
    # per-row tap matrix via one-hot over taps (MXU both ways — see
    # docstring for the rejected gather realization)
    kpad = -(-K // 128) * 128
    w_pack = weight.astype(feat.dtype).reshape(K, Cin * Cout)
    if kpad != K:
        w_pack = jnp.pad(w_pack, ((0, kpad - K), (0, 0)))
    onehot = (tap[..., None] ==
              jnp.arange(kpad, dtype=jnp.int32)).astype(feat.dtype)
    wg = jnp.einsum("bfk,kc->bfc", onehot, w_pack,
                    preferred_element_type=feat.dtype)
    wg = wg.reshape(B, wg.shape[1], Cin, Cout)
    out_rows = jnp.einsum("bfi,bfio->bfo", rows, wg,
                          preferred_element_type=jnp.float32)
    out_rows = jnp.where(ok[..., None], out_rows, 0)
    return jax.vmap(lambda z, r, i: z.at[i].add(r))(
        jnp.zeros((B, N, Cout), jnp.float32), out_rows, dst)
