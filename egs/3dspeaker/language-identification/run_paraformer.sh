#!/usr/bin/env bash
# Paraformer-fused language identification (reference: egs/3dspeaker/
# language-identification/run_paraformer.sh): the SV model trains on a
# FROZEN ASR-encoder's features instead of raw fbank. The reference
# downloads a funasr Paraformer; here the native SAN-M encoder
# (speaker3d_tpu/models/sanm.py) is used — point encoder_ckpt at a
# converted checkpoint to reproduce funasr features exactly.
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
exp_dir=exp/eres2net_para

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "stage 1: train (data/train.csv must have spk column = language label)"
  python -m speaker3d_tpu.cli.train_para \
    --config "$REPO_ROOT/configs/eres2net_para.yaml" \
    --data=data/train.csv --exp_dir=$exp_dir --speed_pertub=false
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "stage 2: predict language labels + accuracy"
  python -m speaker3d_tpu.cli.predict_label --exp_dir $exp_dir \
    --data data/eval_wav.scp --utt2label data/utt2lang \
    --out $exp_dir/predictions.txt
fi
