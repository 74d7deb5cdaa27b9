#!/bin/bash
# 3D-LOTUS++ pipeline evaluation (reference job_scripts/eval_3dlotusplus_policy.sh):
# GT plans + GT grounding, GT plans + auto grounding, or full auto
# (reference README.md:122-126 ablation modes).
set -e
pipeline_config=${1:-robot3dlotus_tpu/configs/rlbench/robot_pipeline.yaml}
mp_expr_dir=${2:-experiments/gembench/3dlotusplus/motion_planner/v1}
mp_ckpt_step=${3:-140000}

# GT plans + GT grounding (drop --gt flags for the full-auto mode)
python -m robot3dlotus_tpu.eval.eval_robot_pipeline_server \
    --pipeline_config_file ${pipeline_config} \
    --mp_expr_dir ${mp_expr_dir} --mp_ckpt_step ${mp_ckpt_step} \
    --taskvar_file assets/taskvars_train.json \
    --seed 100 --num_demos 20 --num_workers 4
