#!/usr/bin/env bash
# AVA active-speaker-detection recipe (reference: egs/ava-asd/talknet/run.sh):
# stage 1 prepares the dataset (download + clip extraction + loader CSVs,
# local/download_data.sh), stage 2 trains, stage 3 evaluates (mAP).
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
