#!/usr/bin/env bash
# VoxCeleb ERes2NetV2 supervised SV recipe — staged pipeline mirroring the
# reference recipe (reference: egs/voxceleb/sv-eres2netv2/run.sh): data prep
# -> train -> large-margin finetune -> extract -> score.
#
# Multi-host note: instead of torchrun, run this script once per host; the
# CLIs shard work by jax.process_index() (initialize jax.distributed via
# JAX_COORDINATOR_ADDRESS etc. for multi-host pods).
set -euo pipefail

stage=1
stop_stage=6
voxceleb2_root=${VOXCELEB2_ROOT:-/data/voxceleb2/dev/wav}
voxceleb1_root=${VOXCELEB1_ROOT:-/data/voxceleb1/test/wav}
trials=${TRIALS:-data/veri_test2.txt}
exp_dir=exp/eres2netv2
data=data

cd "$(dirname "$0")"
REPO_ROOT=$(cd ../../.. && pwd)
export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "stage 1: prepare training CSV"
  python "$REPO_ROOT/egs/local/prepare_csv.py" \
    --wav_root "$voxceleb2_root" --out $data/train.csv
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "stage 2: prepare eval wav.scp"
  mkdir -p $data
  find "$voxceleb1_root" -name '*.wav' | \
    awk -F/ '{id=$(NF-2)"_"$(NF-1)"_"$NF; sub(/\.wav$/,"",id); print id, $0}' \
    > $data/eval_wav.scp
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "stage 3: train (70 epochs, 3s crops)"
  python -m speaker3d_tpu.cli.train \
    --config "$REPO_ROOT/configs/eres2netv2.yaml" \
    --data=$data/train.csv --exp_dir=$exp_dir
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  echo "stage 4: large-margin finetune (6s crops, fixed margin 0.5)"
  # (reference: run.sh:40-50 — copy ckpt, epochs 70->77, lr 1e-4, margin .5)
  python -m speaker3d_tpu.cli.train \
    --config "$REPO_ROOT/configs/eres2netv2.yaml" \
    --data=$data/train.csv --exp_dir=${exp_dir}_lm \
    --init_exp_dir=$exp_dir \
    --wav_len=6.0 --max_lr=0.0001 --min_lr=0.00001 \
    --initial_margin=0.5 --final_margin=0.5 --num_epoch=7 --batch_size=108
fi

if [ $stage -le 5 ] && [ $stop_stage -ge 5 ]; then
  echo "stage 5: extract eval embeddings"
  python -m speaker3d_tpu.cli.extract --exp_dir $exp_dir \
    --data $data/eval_wav.scp --out_dir $exp_dir/embeddings --mode exact
fi

if [ $stage -le 6 ] && [ $stop_stage -ge 6 ]; then
  echo "stage 6: score trials (EER / minDCF)"
  python -m speaker3d_tpu.cli.compute_score_metrics \
    --enrol_data $exp_dir/embeddings --test_data $exp_dir/embeddings \
    --scores_dir $exp_dir/scores --trials "$trials" --p_target 0.01
fi
