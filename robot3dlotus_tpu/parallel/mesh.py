"""Device mesh + sharding helpers.

The reference's only distribution strategy is DDP data parallelism over NCCL
(SURVEY.md §2c, distributed.py:196-212). The TPU-native equivalent: a
jax.sharding.Mesh with a 'dp' axis; batches are sharded on their leading
axis, parameters are replicated, and XLA inserts the gradient psums (riding
ICI within a slice, DCN across slices). SyncBatchNorm falls out for free:
masked BN statistics are global sums over the sharded batch axis.

The mesh accepts an optional 'tp' axis for intra-op sharding of the widest
matmuls, and an optional 'sp' axis that shards the POINT dimension of the
cloud tensors (sequence parallelism in transformer terms). The backbone's
compute is dominated by per-point matmuls (MLPs, CPE) and patch-local
attention along the serialized order — all of which partition cleanly along
N — while the global pieces (serialization argsort, pooling segment
reduce, masked-global BN/pool statistics) lower to XLA collectives under
GSPMD. Semantics are layout-independent by construction; the dp×sp
equivalence test and the driver dry run pin that down.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, dp: Optional[int] = None, tp: int = 1,
              sp: int = 1) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // (tp * sp)
    assert dp * tp * sp == n, f"{dp}*{sp}*{tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(arr, ("dp", "sp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def batch_leaf_sharding(mesh: Mesh, key: str, leaf) -> NamedSharding:
    """Per-leaf batch sharding: point-dimension tensors (pc_fts, pc_mask,
    pc_labels, pc_robot_mask — (B, N, ...) with the cloud on axis 1) also
    shard axis 1 over 'sp'; everything else shards the batch axis only."""
    ndim = getattr(leaf, "ndim", 0)
    if key == "order_perm":  # (num_orders,) — batch-wide, not per-cloud
        return NamedSharding(mesh, P())
    sp = mesh.shape.get("sp", 1)
    if (sp > 1 and ndim >= 2 and key.startswith("pc_")
            and leaf.shape[1] % sp == 0):
        return NamedSharding(mesh, P("dp", "sp"))
    return NamedSharding(mesh, P("dp") if ndim >= 1 else P())


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# --- Tensor parallelism -----------------------------------------------------
#
# Megatron-style column/row sharding applied where the pattern closes cleanly
# (a column-parallel matmul immediately followed by a row-parallel one, so the
# only collective is one psum riding ICI at the pair's exit):
#
#   MLP:  fc1 kernel (C, hidden) col-sharded, fc2 kernel (hidden, C)
#         row-sharded  — 2/3 of the backbone's linear FLOPs.
#   CPE:  cpe_conv weight (K, Cin, Cout) col-sharded on Cout, cpe_fc kernel
#         (Cout, C) row-sharded — the submanifold-conv positional encoding
#         is the single largest FLOP sink in the backbone (27-point stencil
#         per block), so sharding its gather-matmul matters most.
#
# Attention qkv/proj stay replicated: the fused (C, 3C) qkv kernel factors
# as (3, H, Dh) after reshape, so a contiguous split of the flat 3C axis
# does not align with head boundaries; sharding it would make GSPMD insert
# an all-gather right before the attention kernel, costing more than it
# saves on a <100M-param model. Biases of column-sharded layers shard with
# their output axis; row-parallel biases are added once (replicated).
_TP_RULES = (
    # (path-suffix regex, dim to shard). Applied to any leaf whose joined
    # path matches and whose target dim is divisible by the tp axis size.
    (r"mlp/fc1/kernel$", -1),
    (r"mlp/fc1/bias$", -1),
    (r"mlp/fc2/kernel$", 0),
    (r"cpe_conv/weight$", -1),
    (r"cpe_conv/bias$", -1),
    (r"cpe_fc/kernel$", 0),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def tp_leaf_spec(path, leaf, tp_size: int) -> P:
    """PartitionSpec for one pytree leaf under the TP rules (P() if none)."""
    import re
    if tp_size <= 1 or not hasattr(leaf, "ndim"):
        return P()
    s = _path_str(path)
    for pat, dim in _TP_RULES:
        if re.search(pat, s):
            d = dim % leaf.ndim if leaf.ndim else 0
            if leaf.ndim and leaf.shape[d] % tp_size == 0:
                spec = [None] * leaf.ndim
                spec[d] = "tp"
                return P(*spec)
    return P()


def zero1_leaf_spec(path, leaf, mesh: Mesh) -> P:
    """ZeRO-1 spec for one OPTIMIZER-STATE leaf: the TP rules first (moments
    shard with their parameter), then the largest still-unsharded dim that
    the dp axis divides is sharded over 'dp'. Leaves with no dp-divisible
    dim stay at their TP spec (replicated over dp) — correct, just unsharded.
    """
    tp_size = mesh.shape.get("tp", 1)
    dp = mesh.shape.get("dp", 1)
    ndim = getattr(leaf, "ndim", 0)
    base = tuple(tp_leaf_spec(path, leaf, tp_size))
    spec = list(base) + [None] * (ndim - len(base))
    if dp > 1 and ndim:
        for d in sorted(range(ndim), key=lambda d: -leaf.shape[d]):
            if spec[d] is None and leaf.shape[d] % dp == 0:
                spec[d] = "dp"
                break
    while spec and spec[-1] is None:  # P(None) != P() under equality
        spec.pop()
    return P(*spec)


def state_shardings(state, mesh: Mesh, zero1: bool = True):
    """NamedSharding pytree for a TrainState (params + optimizer mirrors).

    Optimizer moments (adam mu/nu, lookahead slow weights) carry the same
    path tails as their parameters, so one path-suffix rule set shards
    master params and moments consistently — the analogue of ZeRO-free
    Megatron TP where optimizer state lives with the shard.

    zero1 (default on): optimizer-state leaves additionally shard over the
    'dp' axis (zero1_leaf_spec) — the ZeRO-1 / reduce-scatter formulation.
    Params stay dp-replicated; GSPMD then lowers the gradient reduction as
    reduce-scatter into the moment shards and one all-gather of the applied
    update, the standard TPU data-parallel recipe (same bytes on the wire
    as the all-reduce it replaces, 1/dp the optimizer memory and update
    FLOPs). Inference trees (no opt_state paths) are unaffected.
    """
    tp_size = mesh.shape.get("tp", 1)
    zero = zero1 and mesh.shape.get("dp", 1) > 1

    def leaf_sharding(path, leaf):
        if zero and path and _path_str(path[:1]) == "opt_state" \
                and getattr(leaf, "ndim", 0) >= 1:
            return NamedSharding(mesh, zero1_leaf_spec(path, leaf, mesh))
        return NamedSharding(mesh, tp_leaf_spec(path, leaf, tp_size))

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)


def shard_variables(variables, mesh: Mesh):
    """Commit inference variables (params + batch_stats) to the mesh:
    TP-sharded where the rules apply, replicated elsewhere —
    state_shardings applied without optimizer mirrors. jit then compiles
    the forward against these layouts, so serving shards without touching
    the model code."""
    return jax.device_put(variables, state_shardings(variables, mesh))


def parse_mesh_spec(spec: str) -> dict:
    """'dp=2,tp=2' / 'tp=4' / 'sp=2,tp=2' -> make_mesh kwargs. Axes left
    out default to 1 except dp, which absorbs the remaining devices when
    omitted (make_mesh's own default)."""
    kw = {}
    for part in spec.replace(";", ",").split(","):
        part = part.strip()
        if not part:
            continue
        k, eq, v = part.partition("=")
        k = k.strip()
        if k not in ("dp", "sp", "tp"):
            raise ValueError(f"unknown mesh axis {k!r} in {spec!r}")
        if not eq or not v.strip().isdigit() or int(v) < 1:
            raise ValueError(
                f"mesh axis {k!r} needs a positive size (got {part!r} "
                f"in {spec!r})")
        kw[k] = int(v)
    return kw


def mesh_from_spec(spec) -> Mesh:
    """Mesh from a spec string/dict (or pass a Mesh through). With an
    explicit dp the mesh uses the first dp*sp*tp devices; with dp omitted
    it spans all of them."""
    if isinstance(spec, Mesh):
        return spec
    kw = parse_mesh_spec(spec) if isinstance(spec, str) else dict(spec)
    if "dp" in kw:
        n = kw["dp"] * kw.get("sp", 1) * kw.get("tp", 1)
        return make_mesh(jax.devices()[:n], **kw)
    return make_mesh(**kw)


def stage_eval_batch(batch: dict, mesh: Mesh) -> dict:
    """Commit a host dict batch for sharded serving: the trainer's dp/sp
    layouts when the batch axis divides dp, fully replicated otherwise
    (B=1 under dp>1 still runs — GSPMD reshards internally)."""
    B = batch["pc_fts"].shape[0]
    if B % mesh.shape["dp"]:
        return {k: jax.device_put(v, replicated_sharding(mesh))
                for k, v in batch.items()}
    return shard_batch(batch, mesh)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Host numpy batch -> device arrays, batch axis over 'dp' and cloud
    point axis over 'sp' (batch_leaf_sharding). The train/val steps leave
    the batch argument's in_sharding unspecified, so jit honors this
    committed layout instead of forcing a reshard."""
    return {k: jax.device_put(v, batch_leaf_sharding(mesh, k, v))
            for k, v in batch.items()}
