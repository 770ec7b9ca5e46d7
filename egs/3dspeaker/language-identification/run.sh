#!/usr/bin/env bash
# Language identification recipe — staged pipeline mirroring the reference
# (reference: egs/3dspeaker/language-identification/run.sh:26-66): the SV
# trainer is reused with utt2lang labels (utt2spk's column carries the
# language id in the LID release of 3D-Speaker).
set -euo pipefail

stage=${STAGE:-1}
stop_stage=${STOP_STAGE:-5}
root=${THREED_SPEAKER_ROOT:-/data/3dspeaker}
musan_root=${MUSAN_ROOT:-}
rirs_root=${RIRS_ROOT:-}
exp_dir=exp/lid
data=data

cd "$(dirname "$0")"
REPO_ROOT=$(cd ../../.. && pwd)
if [ -n "${PALLAS_AXON_POOL_IPS:-}" ]; then
  # tunneled-TPU harness: PYTHONPATH breaks axon PJRT plugin registration
  # (see CLAUDE.md); import speaker3d_tpu via a cwd symlink instead (the
  # reference uses the same speakerlab symlink convention in its recipes)
  [ -e speaker3d_tpu ] || ln -s "$REPO_ROOT/speaker3d_tpu" speaker3d_tpu
else
  export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
fi

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "stage 1: prepare corpus lists (reference: local/prepare_data.sh)"
  ../local/prepare_data.sh --data "$data" --root "$root" \
    --musan_root "$musan_root" --rirs_root "$rirs_root"
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "stage 2: training CSV (spk column = language label)"
  python "$REPO_ROOT/egs/local/prepare_corpus.py" csv \
    --wav_scp $data/3dspeaker/train/wav.scp \
    --utt2spk $data/3dspeaker/train/utt2spk \
    --out $data/train.csv
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "stage 3: train (CAM++ backbone, speed perturb off for LID)"
  aug_args=()
  [ -f $data/musan/wav.scp ] && aug_args+=(--noise=$data/musan/wav.scp)
  [ -f $data/rirs/wav.scp ] && aug_args+=(--reverb=$data/rirs/wav.scp)
  [ ${#aug_args[@]} -eq 0 ] && aug_args+=(--aug_prob=0.0)
  python -m speaker3d_tpu.cli.train \
    --config "$REPO_ROOT/configs/campplus.yaml" \
    --data=$data/train.csv --exp_dir=$exp_dir --speed_pertub=false \
    "${aug_args[@]}"
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  echo "stage 4: predict test labels"
  python -m speaker3d_tpu.cli.predict_label --exp_dir $exp_dir \
    --data $data/3dspeaker/test/wav.scp \
    --utt2label $data/3dspeaker/test/utt2spk \
    --out $exp_dir/predictions.txt
fi

if [ $stage -le 5 ] && [ $stop_stage -ge 5 ]; then
  echo "stage 5: accuracy is reported by predict_label; summary:"
  tail -n 3 $exp_dir/predictions.txt || true
fi
