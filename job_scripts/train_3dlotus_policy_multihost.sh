#!/bin/bash
# Multi-host 3D-LOTUS training: one process per TPU host of a pod slice.
#
# Rank discovery is automatic (robot3dlotus_tpu/parallel/dist.py
# discover_distributed_env): under SLURM, srun exports SLURM_NTASKS /
# SLURM_PROCID / SLURM_NODELIST and nothing else is needed; outside SLURM,
# export WORLD_SIZE / RANK / MASTER_ADDR / MASTER_PORT per process (the
# torchrun convention the reference sbatch scripts use,
# reference train_3dlotus_policy.sh:26-29 + distributed.py:16-64).
#
# On Cloud TPU pod slices, `jax.distributed.initialize()` can also
# self-discover from the TPU metadata; the env route below works everywhere.
#
# SLURM example (2 hosts):
#   srun --ntasks=2 --ntasks-per-node=1 \
#       job_scripts/train_3dlotus_policy_multihost.sh experiments/run1
#
# Manual example (2 hosts):
#   host0$ WORLD_SIZE=2 RANK=0 MASTER_ADDR=host0 MASTER_PORT=29500 \
#          job_scripts/train_3dlotus_policy_multihost.sh experiments/run1
#   host1$ WORLD_SIZE=2 RANK=1 MASTER_ADDR=host0 MASTER_PORT=29500 \
#          job_scripts/train_3dlotus_policy_multihost.sh experiments/run1
#
# Each process loads its own shard of the episode list
# (KeystepBatchLoader process_index::process_count) and the DP mesh spans
# all global devices; checkpoints/logs are written by process 0 only.
set -e
output_dir=${1:-experiments/gembench/3dlotus/v1}

python -m robot3dlotus_tpu.train.train_simple_policy \
    --exp-config robot3dlotus_tpu/configs/rlbench/simple_policy_ptv3.yaml \
    output_dir ${output_dir}
