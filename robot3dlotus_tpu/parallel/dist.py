"""Multi-host helper parity with the reference's distributed utils
(train/utils/distributed.py): rank gating, object all_gather, reduce_dict —
rebuilt on jax.process_index / multihost_utils (SURVEY.md §2d)."""
from __future__ import annotations

import pickle
from typing import Any, Dict

import jax
import numpy as np


def world_info():
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "device_count": jax.device_count(),
    }


def is_default_gpu():  # reference name kept for API parity
    return jax.process_index() == 0


is_default_process = is_default_gpu


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """jax.distributed.initialize for multi-host slices; no-op single host.

    Replaces torch.distributed.init_process_group(nccl)
    (distributed.py:76-81)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)


def all_gather(obj: Any):
    """Gather arbitrary picklable objects from every process
    (parity with distributed.py:99-139)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([payload.size], np.int64))
    maxlen = int(sizes.max())
    padded = np.zeros(maxlen, np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i, :int(sizes[i, 0])].tobytes())
            for i in range(jax.process_count())]


def reduce_dict(d: Dict[str, Any], average=True):
    """Mean/sum scalar dicts across processes (distributed.py:141-165)."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in d.items()}
    from jax.experimental import multihost_utils
    keys = sorted(d.keys())
    vec = np.array([float(d[k]) for k in keys], np.float64)
    out = multihost_utils.process_allgather(vec)
    agg = out.mean(0) if average else out.sum(0)
    return dict(zip(keys, agg.tolist()))


class NoOp:
    """Sink for non-primary-process logging (reference misc.py:27-33)."""

    def __getattr__(self, name):
        def noop(*args, **kwargs):
            return None
        return noop
