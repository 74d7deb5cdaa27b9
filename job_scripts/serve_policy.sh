#!/bin/bash
# Serve a trained policy over HTTP in the CVPR'25-challenge wire format
# (reference challenges/run_server.sh + server.py): msgpack-numpy bodies on
# /predict, one uniform predict(taskvar, episode_id, step_id, instruction,
# obs_state_dict) API for every actioner family.
#
# Usage:
#   job_scripts/serve_policy.sh 3dlotus  <expr_dir> [ckpt_step] [port]
#   job_scripts/serve_policy.sh 3dlotus++ <pipeline_yaml> [port]
#   job_scripts/serve_policy.sh random   [port]
# Clients: robot3dlotus_tpu.eval.serving.PolicyHTTPClient (runs RLBench
# locally and POSTs observations).
set -e
kind=${1:-random}
case "$kind" in
  3dlotus)
    python -m robot3dlotus_tpu.eval.serving \
        --actioner 3dlotus --expr_dir "${2:?expr_dir}" \
        --ckpt_step "${3:-150000}" --port "${4:-13000}"
    ;;
  3dlotus++)
    python -m robot3dlotus_tpu.eval.serving \
        --actioner 3dlotus++ --pipeline_config "${2:?pipeline_yaml}" \
        --port "${3:-13000}"
    ;;
  random)
    python -m robot3dlotus_tpu.eval.serving \
        --actioner random --port "${2:-13000}"
    ;;
  *)
    echo "unknown actioner kind: $kind" >&2; exit 2
    ;;
esac
