#!/usr/bin/env bash
# BERT dialogue detection (reference: egs/semantic_speaker/bert/
# run_dialogue_detection.sh).
set -euo pipefail
cd "$(dirname "$0")"; REPO_ROOT=$(cd ../../.. && pwd); export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
python -m speaker3d_tpu.cli.semantic dialogue \
  --train data/dialogue_train.jsonl --eval data/dialogue_eval.jsonl \
  --exp_dir exp/dialogue_detection "$@"
