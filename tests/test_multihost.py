"""Multi-host wiring smoke tests (round-1 verdict item 5).

The 2-process test launches real subprocesses on the CPU backend, joins them
into one jax.distributed process group via the same WORLD_SIZE/RANK env
discovery the training driver uses, and checks the helper parity surface
(all_gather of Python objects, reduce_dict, per-process loader sharding)
plus a psum across the 2-device global mesh.
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

from robot3dlotus_tpu.parallel.dist import (
    discover_distributed_env, _first_host,
)


def test_env_discovery_explicit(monkeypatch):
    for k in ("WORLD_SIZE", "RANK", "SLURM_NTASKS", "SLURM_PROCID"):
        monkeypatch.delenv(k, raising=False)
    assert discover_distributed_env() is None

    monkeypatch.setenv("WORLD_SIZE", "4")
    monkeypatch.setenv("RANK", "3")
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.1")
    monkeypatch.setenv("MASTER_PORT", "12345")
    assert discover_distributed_env() == ("10.0.0.1:12345", 4, 3)

    monkeypatch.setenv("WORLD_SIZE", "1")
    monkeypatch.setenv("RANK", "0")
    assert discover_distributed_env() is None


def test_env_discovery_slurm(monkeypatch):
    for k in ("WORLD_SIZE", "RANK", "MASTER_ADDR"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("SLURM_NTASKS", "8")
    monkeypatch.setenv("SLURM_PROCID", "5")
    monkeypatch.setenv("SLURM_NODELIST", "node[03-04],node07")
    monkeypatch.setenv("MASTER_PORT", "29501")
    assert discover_distributed_env() == ("node03:29501", 8, 5)


def test_first_host():
    assert _first_host("") == "127.0.0.1"
    assert _first_host("gpu01") == "gpu01"
    assert _first_host("gpu[11-14]") == "gpu11"
    assert _first_host("a[2,5-7],b1") == "a2"


_WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np
    import jax
    from robot3dlotus_tpu.parallel import dist

    assert dist.init_distributed(), "env discovery failed"
    assert jax.process_count() == 2, jax.process_count()
    rank = jax.process_index()
    assert rank == int(os.environ["RANK"])

    # helper parity surface (reference distributed.py:99-165)
    objs = dist.all_gather({"rank": rank, "blob": b"x" * (10 + rank * 100)})
    assert [o["rank"] for o in objs] == [0, 1], objs
    assert len(objs[1]["blob"]) == 110

    red = dist.reduce_dict({"loss": float(rank + 1)}, average=True)
    assert abs(red["loss"] - 1.5) < 1e-9, red

    # per-process loader sharding (DistributedSampler parity)
    from robot3dlotus_tpu.train.datasets.loader import KeystepBatchLoader
    ldr = KeystepBatchLoader.__new__(KeystepBatchLoader)
    ldr.dataset = list(range(10))
    ldr.shuffle = False
    ldr.seed = 0
    ldr.process_index = rank
    ldr.process_count = jax.process_count()
    ids = ldr._epoch_ids(0).tolist()
    assert ids == list(range(rank, 10, 2)), ids

    # one cross-process reduction over the global 2-device mesh: each
    # process contributes a (1, 4) shard; the jitted global sum must see
    # both (1*4 + 2*4 = 12)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils
    import jax.numpy as jnp
    mesh = Mesh(np.asarray(jax.devices()).reshape(2), ("dp",))
    local = jnp.full((1, 4), float(rank + 1))
    arr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("dp"))
    f = jax.jit(jnp.sum,
                out_shardings=NamedSharding(mesh, P()))
    total = float(np.asarray(
        multihost_utils.global_array_to_host_local_array(
            f(arr), mesh, P())))
    assert abs(total - 12.0) < 1e-9, total
    print("OK", rank, total, flush=True)
""")


@pytest.mark.slow
def test_two_process_jax_distributed(tmp_path):
    """Real 2-process jax.distributed group on the CPU backend."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            WORLD_SIZE="2", RANK=str(rank), MASTER_ADDR="127.0.0.1",
            MASTER_PORT=str(port), JAX_PLATFORMS="cpu",
            # exclude the TPU platform plugin's site dir (e.g. the axon
            # tunnel's .axon_site): the real device must not join the group
            PYTHONPATH="/root/repo",
        )
        env.pop("SLURM_NTASKS", None)
        env.pop("SLURM_PROCID", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"OK {rank}" in out, out
