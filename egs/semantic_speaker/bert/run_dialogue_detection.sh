#!/usr/bin/env bash
# BERT dialogue detection (reference: egs/semantic_speaker/bert/
# run_dialogue_detection.sh): [TextGrid -> trans7time -> JSONL] -> train.
set -euo pipefail
cd "$(dirname "$0")"; REPO_ROOT=$(cd ../../.. && pwd)
if [ -n "${PALLAS_AXON_POOL_IPS:-}" ]; then
  # tunneled-TPU harness: PYTHONPATH breaks axon PJRT plugin registration
  # (see CLAUDE.md); import speaker3d_tpu via a cwd symlink instead (the
  # reference uses the same speakerlab symlink convention in its recipes)
  [ -e speaker3d_tpu ] || ln -s "$REPO_ROOT/speaker3d_tpu" speaker3d_tpu
else
  export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
fi
stage=${STAGE:-1}
stop_stage=${STOP_STAGE:-2}

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ] && [ -n "${TEXTGRID_DIR:-}" ]; then
  echo "stage 1: TextGrid -> trans7time -> JSONL"
  python -m speaker3d_tpu.data.semantic_prep textgrid \
    --textgrid_dir "$TEXTGRID_DIR" --out_dir data/trans7time --scp data/t7t.scp
  python -m speaker3d_tpu.data.semantic_prep json \
    --trans7time_scp data/t7t.scp --dialogue_out data/dialogue_train.jsonl
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "stage 2: train dialogue detection"
  python -m speaker3d_tpu.cli.semantic dialogue \
    --train data/dialogue_train.jsonl --eval "${EVAL_JSONL:-data/dialogue_eval.jsonl}" \
    --exp_dir exp/dialogue_detection "$@"
fi
