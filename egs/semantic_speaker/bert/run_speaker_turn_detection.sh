#!/usr/bin/env bash
# BERT speaker-turn detection (reference: egs/semantic_speaker/bert/
# run_speaker_turn_detection.sh): [TextGrid -> trans7time -> JSONL] -> train.
set -euo pipefail
cd "$(dirname "$0")"; REPO_ROOT=$(cd ../../.. && pwd); export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
# optional data prep from corpus TextGrids (AISHELL-4 / AliMeeting layout)
if [ -n "${TEXTGRID_DIR:-}" ]; then
  python -m speaker3d_tpu.data.semantic_prep textgrid \
    --textgrid_dir "$TEXTGRID_DIR" --out_dir data/trans7time --scp data/t7t.scp
  python -m speaker3d_tpu.data.semantic_prep json \
    --trans7time_scp data/t7t.scp --turn_out data/turn_train.jsonl
fi
python -m speaker3d_tpu.cli.semantic turn \
  --train data/turn_train.jsonl --eval "${EVAL_JSONL:-data/turn_eval.jsonl}" \
  --exp_dir exp/speaker_turn_detection "$@"
