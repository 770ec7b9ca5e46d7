#!/usr/bin/env bash
# BERT dialogue detection (reference: egs/semantic_speaker/bert/
# run_dialogue_detection.sh): [TextGrid -> trans7time -> JSONL] -> train.
set -euo pipefail
cd "$(dirname "$0")"; REPO_ROOT=$(cd ../../.. && pwd); export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
if [ -n "${TEXTGRID_DIR:-}" ]; then
  python -m speaker3d_tpu.data.semantic_prep textgrid \
    --textgrid_dir "$TEXTGRID_DIR" --out_dir data/trans7time --scp data/t7t.scp
  python -m speaker3d_tpu.data.semantic_prep json \
    --trans7time_scp data/t7t.scp --dialogue_out data/dialogue_train.jsonl
fi
python -m speaker3d_tpu.cli.semantic dialogue \
  --train data/dialogue_train.jsonl --eval "${EVAL_JSONL:-data/dialogue_eval.jsonl}" \
  --exp_dir exp/dialogue_detection "$@"
