#!/bin/bash
# RLBench-18task (peract) variant: 300k steps, peract taskvars/data, no
# validation split (reference job_scripts/train_3dlotus_policy_peract.sh).
set -e
output_dir=${1:-experiments/peract/3dlotus/v1}

python -m robot3dlotus_tpu.train.train_simple_policy \
    --exp-config robot3dlotus_tpu/configs/rlbench/simple_policy_ptv3.yaml \
    output_dir ${output_dir} \
    TRAIN.num_train_steps 300000 \
    VAL_DATASET.use_val False \
    TRAIN_DATASET.taskvar_file assets/taskvars_peract.json \
    TRAIN_DATASET.taskvar_instr_file assets/taskvars_instructions_peract.json \
    TRAIN_DATASET.data_dir data/peract/train/keysteps_bbox_pcd/voxel1cm \
    TRAIN_DATASET.instr_embed_file data/peract/train/keysteps_bbox_pcd/instr_embeds_clip.npy \
    TRAIN_DATASET.aug_max_rot 45
