"""Multi-host helper parity with the reference's distributed utils
(train/utils/distributed.py): SLURM/env rank discovery, process-group init,
rank gating, object all_gather, reduce_dict — rebuilt on
jax.distributed / jax.process_index / multihost_utils (SURVEY.md §2d)."""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional, Tuple

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


def discover_distributed_env() -> Optional[Tuple[str, int, int]]:
    """(coordinator_address, num_processes, process_id) from the launch env,
    or None for single-process runs.

    Rank-discovery parity with the reference (distributed.py:16-64):
      * explicit env: WORLD_SIZE + RANK (+ MASTER_ADDR/MASTER_PORT) — the
        torchrun/env:// convention the reference's sbatch scripts export
        (train_3dlotus_policy.sh:26-29);
      * SLURM: SLURM_NTASKS + SLURM_PROCID, coordinator from
        SLURM_STEP_NODELIST/SLURM_NODELIST first hostname.
    The coordinator port comes from MASTER_PORT (default 29500, the torch
    convention the reference scripts use)."""
    port = os.environ.get("MASTER_PORT", "29500")
    world = os.environ.get("WORLD_SIZE", "")
    if world and os.environ.get("RANK", "") != "":
        n = int(world)
        if n <= 1:
            return None
        addr = os.environ.get("MASTER_ADDR", "127.0.0.1")
        return f"{addr}:{port}", n, int(os.environ["RANK"])
    ntasks = os.environ.get("SLURM_NTASKS", "")
    if ntasks and os.environ.get("SLURM_PROCID", "") != "":
        n = int(ntasks)
        if n <= 1:
            return None
        nodelist = os.environ.get(
            "SLURM_STEP_NODELIST", os.environ.get("SLURM_NODELIST", ""))
        addr = os.environ.get("MASTER_ADDR") or _first_host(nodelist)
        return f"{addr}:{port}", n, int(os.environ["SLURM_PROCID"])
    return None


def _first_host(nodelist: str) -> str:
    """First hostname of a SLURM nodelist ('a[01-03],b02' -> 'a01').
    Minimal expansion without scontrol (enough for coordinator discovery)."""
    if not nodelist:
        return "127.0.0.1"
    head = nodelist.split(",")[0]
    if "[" in head:
        prefix, rng = head.split("[", 1)
        first = rng.rstrip("]").split(",")[0].split("-")[0]
        return prefix + first
    return head


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """jax.distributed.initialize for multi-host slices; no-op when neither
    explicit args nor a multi-process launch env (SLURM / WORLD_SIZE+RANK)
    is present. Replaces torch.distributed.init_process_group(nccl)
    (reference distributed.py:25-81). Returns True when a process group was
    initialized."""
    if num_processes is None:
        found = discover_distributed_env()
        if found is None:
            return False
        coordinator_address, num_processes, process_id = found
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        return True
    return False


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
