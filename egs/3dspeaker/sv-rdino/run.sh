#!/usr/bin/env bash
# 3D-Speaker self-supervised recipe — staged pipeline mirroring the reference
# (reference: egs/3dspeaker/sv-rdino/run.sh): data prep -> SSL training
# (multi-crop, EMA teacher) -> embedding extraction -> trial scoring.
set -euo pipefail

stage=${STAGE:-1}
stop_stage=${STOP_STAGE:-4}
root=${THREED_SPEAKER_ROOT:-/data/3dspeaker}
musan_root=${MUSAN_ROOT:-}
rirs_root=${RIRS_ROOT:-}
exp_dir=exp/rdino
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
  echo "stage 1: prepare corpus lists"
  ../local/prepare_data.sh --data "$data" --root "$root" \
    --musan_root "$musan_root" --rirs_root "$rirs_root"
  awk -F, 'NR>1 {print $1, $2}' $data/train.csv > $data/train_wav.scp
  cp $data/3dspeaker/test/wav.scp $data/eval_wav.scp
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "stage 2: SSL training (rdino)"
  python -m speaker3d_tpu.cli.train_ssl \
    --config "$REPO_ROOT/configs/rdino.yaml" --variant rdino \
    --exp_dir=$exp_dir --data=$data/train_wav.scp \
    $([ -f $data/musan/wav.scp ] && echo "--noise=$data/musan/wav.scp" || true)
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "stage 3: extract eval embeddings (teacher backbone)"
  python -m speaker3d_tpu.cli.extract_ssl --exp_dir $exp_dir \
    --data $data/eval_wav.scp --out_dir $exp_dir/embeddings \
    --variant rdino
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  echo "stage 4: score trials (EER / minDCF p=0.05)"
  python -m speaker3d_tpu.cli.compute_score_metrics \
    --enrol_data $exp_dir/embeddings --test_data $exp_dir/embeddings \
    --scores_dir $exp_dir/scores --trials "$data/3dspeaker/trials/trials_cross_device" --p_target 0.05
fi
