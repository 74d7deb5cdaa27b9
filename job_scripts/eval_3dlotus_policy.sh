#!/bin/bash
# Closed-loop evaluation protocol (reference job_scripts/eval_3dlotus_policy.sh):
# validation sweep on seed 100 over train taskvars, then 5 test seeds x 4
# GemBench splits, 20 demos per taskvar. Resumable: completed taskvars in
# results.jsonl are skipped.
set -e
expr_dir=${1:-experiments/gembench/3dlotus/v1}
ckpt_step=${2:-150000}

# validation
python -m robot3dlotus_tpu.eval.eval_simple_policy_server \
    --expr_dir ${expr_dir} --ckpt_step ${ckpt_step} --num_workers 4 \
    --taskvar_file assets/taskvars_train.json \
    --seed 100 --num_demos 20
python -m robot3dlotus_tpu.scripts.summarize_val_results \
    --result_file ${expr_dir}/preds/seed100/results.jsonl

# test
for seed in 200 300 400 500 600; do
for split in train test_l2 test_l3 test_l4; do
python -m robot3dlotus_tpu.eval.eval_simple_policy_server \
    --expr_dir ${expr_dir} --ckpt_step ${ckpt_step} --num_workers 4 \
    --taskvar_file assets/taskvars_${split}.json \
    --seed ${seed} --num_demos 20
done
done
python -m robot3dlotus_tpu.scripts.summarize_tst_results \
    --result_dir ${expr_dir}/preds --ckpt_step ${ckpt_step}
