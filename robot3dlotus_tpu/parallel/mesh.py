"""Device mesh + sharding helpers.

The reference's only distribution strategy is DDP data parallelism over NCCL
(SURVEY.md §2c, distributed.py:196-212). The TPU-native equivalent: a
jax.sharding.Mesh with a 'dp' axis; batches are sharded on their leading
axis, parameters are replicated, and XLA inserts the gradient psums (riding
ICI within a slice, DCN across slices). SyncBatchNorm falls out for free:
masked BN statistics are global sums over the sharded batch axis.

The mesh accepts an optional 'tp' axis for intra-op sharding of the widest
matmuls; the 50-100M-param policy does not need it (kept for API
completeness and the multi-chip dry run).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, dp: Optional[int] = None, tp: int = 1) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"{dp}*{tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Host numpy batch -> device arrays sharded on the leading axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)
