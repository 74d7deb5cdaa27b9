"""Pallas TPU kernel for batched row permutation (gather by row index).

The serialized-attention dataflow permutes the (B, N, C) feature array into
each space-filling-curve order before attention and back afterwards
(reference model.py:468-557 does the same with flat index_select). XLA
lowers `jnp.take_along_axis` row gathers to scattered HBM reads that run
far below copy bandwidth; profiled on the release config they had become
the single largest cost of the forward pass (~0.36 s per block at
B=16, N=4096, 3C=192 on the dev rig — more than the attention itself).

TPU-first formulation: at every stage of this backbone the whole per-cloud
feature array fits comfortably in VMEM (N halves while C doubles, keeping
N*C*2 bytes ~1.5-3 MB << 16 MB). So the gather becomes a one-hot matmul —
the canonical MXU gather:

  grid (B, T):  x[b] stays VMEM-resident across the T row-tiles
                (constant index_map -> fetched once per cloud);
                each tile builds onehot (P, N) = (idx_tile == iota) in VMEM
                and emits onehot @ x[b]  -> (P, C) on the MXU.

HBM traffic is exactly one contiguous read of x and one contiguous write of
the output — zero scattered transactions. The extra MXU work (2*N*N*C*B
FLOPs) is the intended trade: MXU cycles are abundant, scattered HBM
transactions are not.

The custom VJP routes the cotangent through the transposed one-hot in the
same resident-block style, accumulating dx[b] in VMEM across row tiles —
which also makes the backward exact for duplicated indices (the duplicate-
pad scheme of ops/patching.py maps several output rows to one source row;
their cotangents sum).

Non-float inputs (e.g. int32 grid coords for RPE) and shapes whose
per-cloud array exceeds the VMEM budget fall back to take_along_axis.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from robot3dlotus_tpu.ops.kernel_precision import kernel_dot_precision

# per-cloud feature bytes above which we fall back to XLA (x + fp32 dx +
# one-hot must fit VMEM together with double-buffered tiles)
_VMEM_BUDGET_BYTES = 6 * 1024 * 1024


def _choose_tile(n: int) -> int:
    for p in (128, 64, 32, 16, 8):
        if n % p == 0:
            return min(p, n)
    return n


def _take_rows(x, idx):
    # size-1 trailing dim (not a materialized broadcast): XLA lowers this
    # to a ROW gather; per-channel indices degrade to single-element
    # gathers (~200x slower in-program, see pallas_conv._far_gather)
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def _take_rows_zero_oob(x, idx):
    """XLA gather honoring the sentinel contract: out-of-range indices
    (idx == N, the 'no neighbor' convention) yield ZERO rows — plain
    take_along_axis would clamp to row N-1 and leak its gradient."""
    n = x.shape[1]
    out = _take_rows(x, jnp.clip(idx, 0, n - 1))
    ok = (idx >= 0) & (idx < n)
    return jnp.where(ok[..., None], out, 0)


def permute_available(x, idx):
    """Whether the Pallas path applies to these operands."""
    if x.ndim != 3 or idx.ndim != 2 or x.shape[0] != idx.shape[0]:
        return False
    if not jnp.issubdtype(x.dtype, jnp.floating):
        return False
    n, c = x.shape[1], x.shape[2]
    if n * c * x.dtype.itemsize > _VMEM_BUDGET_BYTES:
        return False
    if n * c * 4 > _VMEM_BUDGET_BYTES:  # fp32 dx accumulator in backward
        return False
    if 128 * n * 4 > _VMEM_BUDGET_BYTES:
        # the (tile=128, N) fp32 one-hot scales with N independent of C —
        # without this bound a big-N/small-C shape passes the row budgets
        # but OOMs VMEM at Mosaic compile time
        return False
    return True


def _fwd_kernel(idx_ref, x_ref, o_ref):
    idx = idx_ref[0, 0, 0]                                  # (P,) int32
    x = x_ref[0]                                            # (N, C)
    onehot = (idx[:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], x.shape[0]),
                                       1))
    o_ref[0] = jax.lax.dot_general(
        onehot.astype(x.dtype), x,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=kernel_dot_precision(x),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(idx_ref, g_ref, dx_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dx_ref[0] = jnp.zeros(dx_ref.shape[1:], dx_ref.dtype)

    idx = idx_ref[0, 0, 0]                                  # (P,) int32
    g = g_ref[0].astype(jnp.float32)                        # (P, C)
    onehot = (idx[:, None] ==
              jax.lax.broadcasted_iota(jnp.int32,
                                       (idx.shape[0], dx_ref.shape[1]), 1))
    dx_ref[0] += jax.lax.dot_general(                       # (N, C)
        onehot.astype(jnp.float32), g,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _permute_fwd_call(x, idx, interpret):
    B, N, C = x.shape
    M = idx.shape[1]
    P = _choose_tile(M)
    # (B, T, 1, P): Mosaic wants the last two block dims (8,128)-aligned or
    # equal to the array dims — the unit axis satisfies that for any tile
    idx4 = idx.astype(jnp.int32).reshape(B, M // P, 1, P)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(B, M // P),
        in_specs=[
            pl.BlockSpec((1, 1, 1, P), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            # constant index_map over t: fetched once per cloud, then
            # VMEM-resident for all row tiles
            pl.BlockSpec((1, N, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * N * C,
            bytes_accessed=(B * N * C + B * M * C) * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(idx4, x)


def _permute_bwd_call(idx, g, n, interpret):
    B, M = idx.shape
    C = g.shape[-1]
    P = _choose_tile(M)
    idx4 = idx.astype(jnp.int32).reshape(B, M // P, 1, P)
    dx = pl.pallas_call(
        _bwd_kernel,
        grid=(B, M // P),
        in_specs=[
            pl.BlockSpec((1, 1, 1, P), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        # constant index_map over t: dx[b] accumulates in VMEM across tiles
        out_specs=pl.BlockSpec((1, n, C), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, C), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * n * C,
            bytes_accessed=(B * n * C + B * M * C) * 4,
            transcendentals=0),
        interpret=interpret,
    )(idx4, g)
    return dx


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _permute_op(x, idx, n, x_dtype, interpret):
    return _permute_fwd_call(x, idx, interpret)


def _permute_op_fwd(x, idx, n, x_dtype, interpret):
    return _permute_fwd_call(x, idx, interpret), idx


def _permute_op_bwd(n, x_dtype, interpret, idx, g):
    dx = _permute_bwd_call(idx, g, n, interpret)
    return dx.astype(x_dtype), None


_permute_op.defvjp(_permute_op_fwd, _permute_op_bwd)


# --------------------------------------------------------------------------
# small-channel gather: two-level (sqrt-N) one-hot decomposition
# --------------------------------------------------------------------------
#
# The flat one-hot costs M*N*max(C,128) MXU work — fine when C >= 128, but
# for tiny channel counts (the k=5 stem gathers (B, N*125) rows of Cin=8)
# the lane padding wastes 16x. Decomposing idx = hi*(N/S) + lo with
# S ~ sqrt(N) turns the gather into
#     Y = onehot_hi (P, S) @ x.reshape(S, (N/S)*C)      (MXU, S*(N/S)*C)
#     out = sum_lo onehot_lo (P, N/S, 1) * Y.reshape(P, N/S, C)   (VPU)
# i.e. M*S*(N/S)*C = M*sqrt(N)*sqrt(N)*C work — for N=4096, C=8 that is
# ~50x less MXU time than the flat kernel, and Y never leaves VMEM.

_NSUB = 128  # lo-block size = the lane width, so the (P, C*128) -> (P, C,
#              128) reshape is a native lane split and the lo-selection is a
#              cross-lane reduction (Mosaic rejects non-lane-aligned minors)


def _smallc_kernel(idx_ref, x_ref, o_ref, *, s, c):
    idx = idx_ref[0, 0, 0]                                  # (P,) int32
    xr = x_ref[0]                                           # (S, C*128)
    hi = idx // _NSUB
    lo = idx % _NSUB
    P = idx.shape[0]
    onehot_hi = (hi[:, None] ==
                 jax.lax.broadcasted_iota(jnp.int32, (P, s), 1))
    y = jax.lax.dot_general(                                # (P, C*128)
        onehot_hi.astype(xr.dtype), xr,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=kernel_dot_precision(xr),
        preferred_element_type=jnp.float32)
    # xr is C-major within each hi block: column j holds channel j // 128
    # of in-block row j % 128
    col_lo = jax.lax.broadcasted_iota(jnp.int32, (P, c * _NSUB), 1) % _NSUB
    y = jnp.where(col_lo == lo[:, None], y, 0.0)
    o_ref[0] = jnp.sum(y.reshape(P, c, _NSUB), axis=-1).astype(o_ref.dtype)


def _smallc_bwd_kernel(idx_ref, g_ref, dx_ref, *, s, c):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dx_ref[0] = jnp.zeros(dx_ref.shape[1:], dx_ref.dtype)

    idx = idx_ref[0, 0, 0]                                  # (P,) int32
    g = g_ref[0].astype(jnp.float32)                        # (P, C)
    hi = idx // _NSUB
    lo = idx % _NSUB
    P = idx.shape[0]
    # place g[m, c] at column c*128 + lo[m]  (the transpose of the forward's
    # lane-masked reduce): broadcast g across the 128 lanes of its channel
    # block and mask to the lo lane
    col = jax.lax.broadcasted_iota(jnp.int32, (P, c * _NSUB), 1)
    # (P, C) -> (P, C*128) with each channel replicated across its lane
    # block (broadcast + lane-aligned collapse; jnp.repeat lowers poorly)
    g_rep = jnp.broadcast_to(g[:, :, None], (P, c, _NSUB)).reshape(
        P, c * _NSUB)
    y = jnp.where(col % _NSUB == lo[:, None], g_rep, 0.0)
    onehot_hi = (hi[:, None] ==
                 jax.lax.broadcasted_iota(jnp.int32, (P, s), 1))
    dx_ref[0] += jax.lax.dot_general(                       # (s, C*128)
        onehot_hi.astype(jnp.float32), y,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _smallc_bwd_call(idx, g, n, interpret):
    B, M = idx.shape
    C = g.shape[-1]
    s = n // _NSUB
    P = _smallc_tile(M, C)
    idx4 = idx.astype(jnp.int32).reshape(B, M // P, 1, P)
    dxr = pl.pallas_call(
        functools.partial(_smallc_bwd_kernel, s=s, c=C),
        grid=(B, M // P),
        in_specs=[
            pl.BlockSpec((1, 1, 1, P), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, C * _NSUB), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, s, C * _NSUB), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * s * C * _NSUB,
            bytes_accessed=(B * n * C + B * M * C) * 4,
            transcendentals=0),
        interpret=interpret,
    )(idx4, g)
    # C-major blocks back to row-major (B, N, C)
    return dxr.reshape(B, s, C, _NSUB).transpose(0, 1, 3, 2).reshape(B, n, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _smallc_op(x, idx, n, x_dtype, interpret):
    return _smallc_fwd_call(x, idx, interpret)


def _smallc_op_fwd(x, idx, n, x_dtype, interpret):
    return _smallc_fwd_call(x, idx, interpret), idx


def _smallc_op_bwd(n, x_dtype, interpret, idx, g):
    dx = _smallc_bwd_call(idx, g, n, interpret)
    return dx.astype(x_dtype), None


_smallc_op.defvjp(_smallc_op_fwd, _smallc_op_bwd)


def _smallc_tile(m: int, c: int):
    """Largest tile P dividing m whose (P, C*128) fp32 intermediates fit
    the VMEM budget (forward holds y + a col iota of that size; backward
    g_rep + col + y), or None when even no dividing tile fits. Caps P by C:
    at C=8 (the release stem) the cap keeps the full 1024-row tile, at
    C=16 it halves, at C=32 it quarters — without it Mosaic OOMs at
    compile time for the wider channel counts sparse_conv permits."""
    p_cap = (9 * 1024 * 1024) // (c * _NSUB * 4 * 2)
    for p in (1024, 512, 256, 128, 64, 32, 16, 8):
        if p <= p_cap and m % p == 0:
            return p
    return m if m <= p_cap else None


def gather_rows_smallc(x, idx, interpret=False):
    """out[b, m] = x[b, idx[b, m]] for small C via the two-level one-hot.

    x: (B, N, C) float with N a multiple of 128; idx: (B, M), entries == N
    (or any out-of-range value) gather zeros. Differentiable: the custom VJP
    scatter-adds cotangents through the transposed two-level one-hot (the
    motion planner's stem input includes trainable label embeddings, so
    d/dx is live there, unlike the plain-policy stem).
    """
    B, N, C = x.shape
    if N % _NSUB or _smallc_tile(idx.shape[1], C) is None:
        # XLA fallback must honor the same sentinel-zeros contract
        return _take_rows_zero_oob(x, idx)
    return _smallc_op(x, idx, N, str(x.dtype), interpret)


def _smallc_fwd_call(x, idx, interpret=False):
    B, N, C = x.shape
    M = idx.shape[1]
    s = N // _NSUB
    # bigger tiles than the flat kernel: the (P, C*128) intermediate stays
    # in budget (_smallc_tile), and M is typically N*K (large) — fewer
    # grid steps win
    P = _smallc_tile(M, C)
    idx4 = idx.astype(jnp.int32).reshape(B, M // P, 1, P)
    # C-major within each 128-row hi block (one XLA transpose, B*N*C bytes)
    xr = x.reshape(B, s, _NSUB, C).transpose(0, 1, 3, 2).reshape(
        B, s, C * _NSUB)
    return pl.pallas_call(
        functools.partial(_smallc_kernel, s=s, c=C),
        grid=(B, M // P),
        in_specs=[
            pl.BlockSpec((1, 1, 1, P), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, C * _NSUB), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * s * C * _NSUB,
            bytes_accessed=(B * N * C + B * M * C) * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(idx4, xr)


def permute_rows_any(x, idx, interpret=False):
    """Width-aware row permute: the two-level small-C kernel when the lane
    padding of the flat one-hot would dominate (C <= 32), the flat one-hot
    otherwise, XLA take_along_axis when neither qualifies. idx must be a
    full permutation or in-range (no sentinel zeros contract needed)."""
    from .pallas_attention import pallas_available
    n, c = x.shape[1], x.shape[2]
    if (pallas_available() and c <= 32 and n % _NSUB == 0
            and jnp.issubdtype(x.dtype, jnp.floating)):
        return gather_rows_smallc(x, idx, interpret=interpret)
    return permute_rows(x, idx, interpret=interpret)


def scatter_rows_add(g, idx, n, interpret=False):
    """out[b, idx[b, m], :] += g[b, m, :] -> (B, n, C) fp32.

    The transpose of permute_rows, riding the SAME one-hot MXU kernel the
    permute backward uses (_bwd_kernel: dx stays VMEM-resident across row
    tiles). Out-of-range indices (sentinel n) match no one-hot column and
    are dropped. This is the TPU-fast segment-add for medium index lists:
    XLA's scatter-add loops (measured 12.6 ms for 27k rows at the release
    shape on-chip vs ~1 ms here), and its row gather is worse (667 ms) —
    the far-link machinery of ops/pallas_conv.py is the main consumer."""
    from .pallas_attention import pallas_available
    B, M, C = g.shape
    ok = (pallas_available() or interpret) and \
        n * C * 4 <= _VMEM_BUDGET_BYTES and 128 * n * 4 <= _VMEM_BUDGET_BYTES
    if not ok:
        idxc = jnp.clip(idx, 0, n - 1)
        keep = (idx >= 0) & (idx < n)
        g = jnp.where(keep[..., None], g, 0).astype(jnp.float32)
        return jax.vmap(lambda gg, ii: jax.ops.segment_sum(
            gg, ii, num_segments=n))(g, idxc)
    return _permute_bwd_call(idx, g, n, interpret)


def permute_rows(x, idx, impl="auto", interpret=False):
    """out[b, m] = x[b, idx[b, m]] for x (B, N, C), idx (B, M) int.

    impl: 'auto' (Pallas on TPU when operands qualify, else XLA) | 'xla' |
    'pallas' | 'pallas_interpret'.
    """
    if impl == "xla":
        return _take_rows(x, idx)
    interpret = interpret or impl == "pallas_interpret"
    if impl == "auto":
        from .pallas_attention import pallas_available
        if not (pallas_available() and permute_available(x, idx)):
            return _take_rows(x, idx)
    elif not permute_available(x, idx):
        # explicitly forced 'pallas' must not silently measure/compare the
        # XLA path (A/B runs would report wrong numbers)
        raise ValueError(
            f"permute_rows(impl={impl!r}) forced but operands do not "
            f"qualify (shape {x.shape}, dtype {x.dtype}; see "
            "permute_available) — use impl='auto' for silent fallback")
    return _permute_op(x, idx, x.shape[1], str(x.dtype), interpret)
