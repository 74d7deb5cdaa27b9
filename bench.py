"""Benchmark: train keystep samples/sec/chip for the flagship 3D-LOTUS CA
policy at the release training configuration (4096 points, voxel1cm,
job_scripts/train_3dlotus_policy.sh), on whatever accelerator is attached.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference trains 150,000 steps x batch 8 in ~14 h on one A100
(README.md:72) => 150000*8/(14*3600) = 23.8 keystep samples/sec/GPU.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_SAMPLES_PER_SEC = 150000 * 8 / (14 * 3600)  # 23.81 (1x A100)


def main():
    import jax
    # persistent compile cache: the release-config train step is a large XLA
    # program; cache it across processes so repeat runs start in seconds.
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    from __graft_entry__ import RELEASE_PTV3, RELEASE_ACT, LOSS_CFG, _fake_batch
    from robot3dlotus_tpu.models.simple_policy import (
        SimplePolicyTPU, compute_loss,
    )
    from robot3dlotus_tpu.train.trainer import (
        create_train_state, make_train_step,
    )

    B = int(os.environ.get("BENCH_BATCH", "16"))
    N = int(os.environ.get("BENCH_POINTS", "4096"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))

    model = SimplePolicyTPU(
        ptv3_cfg=RELEASE_PTV3, act_cfg=RELEASE_ACT, variant="ca")
    batch = _fake_batch(B=B, N=N, T=16, pos_bins=RELEASE_ACT["pos_bins"])
    train_cfg = dict(learning_rate=1e-4, lr_sched="cosine", warmup_steps=2000,
                     num_train_steps=150000, weight_decay=0.05, grad_norm=10,
                     optim="adamw", betas=[0.9, 0.98])
    rng = jax.random.PRNGKey(0)
    state, _ = create_train_state(model, batch, train_cfg, rng)
    step_fn = make_train_step(
        model,
        lambda preds, b: compute_loss(preds, b, RELEASE_ACT, LOSS_CFG),
        mesh=None, donate=True)

    # warmup / compile
    state, losses = step_fn(state, batch, rng)
    jax.block_until_ready(losses["total"])
    state, losses = step_fn(state, batch, rng)
    jax.block_until_ready(losses["total"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, losses = step_fn(state, batch, rng)
    jax.block_until_ready(losses["total"])
    dt = time.perf_counter() - t0

    n_chips = jax.local_device_count()
    sps_per_chip = (steps * B) / dt / n_chips
    print(json.dumps({
        "metric": "train_keystep_samples_per_sec_per_chip",
        "value": round(sps_per_chip, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(sps_per_chip / BASELINE_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
