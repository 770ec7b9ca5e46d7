#!/usr/bin/env bash
# AVA active-speaker-detection recipe (reference: egs/ava-asd/talknet/run.sh):
# stage 1 prepares the dataset (download + clip extraction + loader CSVs,
# local/download_data.sh), stage 2 trains, stage 3 evaluates (mAP).
set -euo pipefail
cd "$(dirname "$0")"; REPO_ROOT=$(cd ../../.. && pwd); export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}

stage=${STAGE:-2}
stop_stage=${STOP_STAGE:-3}
ava_root=${AVA_ROOT:-data/download_data}

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  echo "Stage1: prepare AVA-ActiveSpeaker dataset..."
  bash local/download_data.sh --stage 1 --stop_stage 4 --download_dir "$ava_root"
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  echo "Stage2: train TalkNet..."
  python -m speaker3d_tpu.cli.train_asd \
    --train_csv "$ava_root/csv/train_loader.csv" --val_csv "$ava_root/csv/val_loader.csv" \
    --audio_dir "$ava_root/clips_audios/train" --video_dir "$ava_root/clips_videos/train" \
    --exp_dir exp/talknet "$@"
fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  echo "Stage3: evaluate (mAP)..."
  python -m speaker3d_tpu.cli.train_asd \
    --train_csv "$ava_root/csv/train_loader.csv" --val_csv "$ava_root/csv/val_loader.csv" \
    --audio_dir "$ava_root/clips_audios/val" --video_dir "$ava_root/clips_videos/val" \
    --exp_dir exp/talknet --test
fi
