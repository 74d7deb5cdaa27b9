#!/bin/bash
# Train the 3D-LOTUS policy on GemBench voxel1cm keysteps (reference
# job_scripts/train_3dlotus_policy.sh; all hyperparameters live in the
# release YAML here instead of 50 CLI overrides). One process per TPU
# host; DP over the local mesh is automatic.
set -e
output_dir=${1:-experiments/gembench/3dlotus/v1}

python -m robot3dlotus_tpu.train.train_simple_policy \
    --exp-config robot3dlotus_tpu/configs/rlbench/simple_policy_ptv3.yaml \
    output_dir ${output_dir}
