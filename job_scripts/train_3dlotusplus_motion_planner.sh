#!/bin/bash
# Train the 3D-LOTUS++ motion planner on motion keysteps (reference
# job_scripts/train_3dlotusplus_motion_planner.sh).
set -e
output_dir=${1:-experiments/gembench/3dlotusplus/motion_planner/v1}

python -m robot3dlotus_tpu.train.train_motion_planner \
    --exp-config robot3dlotus_tpu/configs/rlbench/motion_planner_ptv3.yaml \
    output_dir ${output_dir}
