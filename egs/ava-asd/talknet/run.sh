#!/usr/bin/env bash
# AVA active-speaker-detection recipe (reference: egs/ava-asd/talknet/run.sh).
set -euo pipefail
cd "$(dirname "$0")"; REPO_ROOT=$(cd ../../.. && pwd); export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
ava_root=${AVA_ROOT:-/data/ava_activespeaker}
python -m speaker3d_tpu.cli.train_asd \
  --train_csv "$ava_root/csv/train_loader.csv" --val_csv "$ava_root/csv/val_loader.csv" \
  --audio_dir "$ava_root/clips_audios/train" --video_dir "$ava_root/clips_videos/train" \
  --exp_dir exp/talknet "$@"
