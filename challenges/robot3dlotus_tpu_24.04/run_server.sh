#!/bin/bash
# Challenge policy server (counterpart of the reference's
# challenges/run_server.sh): serve one of the three actioner families on
# the msgpack-over-HTTP wire (robot3dlotus_tpu/eval/serving.py).
#
#   run_server.sh 3dlotus 13000       # keystep policy
#   run_server.sh 3dlotus++ 13000     # full VLM-grounded pipeline
#   run_server.sh random 13000        # protocol smoke baseline
set -e
model_name=${1:-3dlotus}
port=${2:-13000}

case "$model_name" in
  3dlotus)
    exec r3dl-serve --actioner 3dlotus --host 0.0.0.0 --port "$port" \
      --expr_dir "${R3DL_EXPERIMENTS}/3dlotus" --ckpt_step "${CKPT_STEP:-150000}" ;;
  3dlotus++)
    exec r3dl-serve --actioner 3dlotus++ --host 0.0.0.0 --port "$port" \
      --pipeline_config "${PIPELINE_CONFIG:-robot_pipeline.yaml}" ;;
  random)
    exec r3dl-serve --actioner random --host 0.0.0.0 --port "$port" ;;
  *)
    echo "unknown model '$model_name' (3dlotus | 3dlotus++ | random)"; exit 2 ;;
esac
