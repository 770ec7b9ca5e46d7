#!/usr/bin/env bash
# BERT speaker-turn detection (reference: egs/semantic_speaker/bert/
# run_speaker_turn_detection.sh).
set -euo pipefail
cd "$(dirname "$0")"; REPO_ROOT=$(cd ../../.. && pwd); export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
python -m speaker3d_tpu.cli.semantic turn \
  --train data/turn_train.jsonl --eval data/turn_eval.jsonl \
  --exp_dir exp/speaker_turn_detection "$@"
