#!/usr/bin/env bash
# VoxCeleb ecapa supervised SV recipe — staged pipeline mirroring the
# reference (reference: egs/voxceleb/sv-ecapa/run.sh): data prep ->
# train -> large-margin finetune -> extract -> score. Stages 5-6 evaluate
# the LM-finetuned experiment when it exists (the reference's exp_lm_dir
# convention); set EVAL_EXP_DIR to override.
#
# Multi-host note: instead of torchrun, run this script once per host; the
# CLIs shard work by jax.process_index() (set SPEAKER3D_COORDINATOR_ADDRESS /
# SPEAKER3D_NUM_PROCESSES / SPEAKER3D_PROCESS_ID per host for pods).
set -euo pipefail

stage=${STAGE:-1}
stop_stage=${STOP_STAGE:-6}
voxceleb2_root=${VOXCELEB2_ROOT:-/data/voxceleb2/dev/wav}
voxceleb1_root=${VOXCELEB1_ROOT:-/data/voxceleb1/test/wav}
musan_root=${MUSAN_ROOT:-}
rirs_root=${RIRS_ROOT:-}
trials=${TRIALS:-data/veri_test2.txt}
exp_dir=exp/ecapa
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
  echo "stage 1: prepare corpus lists (train CSV, eval scp, trials)"
  ../local/prepare_data.sh --data "$data" \
    --voxceleb2_root "$voxceleb2_root" --voxceleb1_root "$voxceleb1_root" \
    --musan_root "$musan_root" --rirs_root "$rirs_root" --trials "$trials"
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "stage 2: eval wav.scp (vox1 keys)"
  cp $data/vox1/wav.scp $data/eval_wav.scp
fi

# augmentation lists exist only when MUSAN_ROOT/RIRS_ROOT were prepared;
# without them training runs un-augmented (aug_prob in the config is
# ignored when no --noise is passed... the CLI requires the file, so gate)
aug_args=()
[ -f $data/musan/wav.scp ] && aug_args+=(--noise=$data/musan/wav.scp)
[ -f $data/rirs/wav.scp ] && aug_args+=(--reverb=$data/rirs/wav.scp)
if [ ${#aug_args[@]} -eq 0 ]; then
  aug_args+=(--aug_prob=0.0)
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "stage 3: train"
  python -m speaker3d_tpu.cli.train \
    --config "$REPO_ROOT/configs/ecapa.yaml" \
    --data=$data/train.csv --exp_dir=$exp_dir "${aug_args[@]}"
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  echo "stage 4: large-margin finetune (6s crops, fixed margin 0.5)"
  # (reference: run.sh — copy ckpt, 7 extra epochs, lr 1e-4, margin .5)
  python -m speaker3d_tpu.cli.train \
    --config "$REPO_ROOT/configs/ecapa.yaml" \
    --data=$data/train.csv --exp_dir=${exp_dir}_lm \
    --init_exp_dir=$exp_dir "${aug_args[@]}" \
    --wav_len=6.0 --max_lr=0.0001 --min_lr=0.00001 \
    --initial_margin=0.5 --final_margin=0.5 --num_epoch=7 --batch_size=108
fi

# stages 5-6 evaluate the LM-finetuned model when present
eval_exp=${EVAL_EXP_DIR:-}
if [ -z "$eval_exp" ]; then
  if [ -d ${exp_dir}_lm/models ]; then eval_exp=${exp_dir}_lm
  else eval_exp=$exp_dir; fi
fi

if [ $stage -le 5 ] && [ $stop_stage -ge 5 ]; then
  echo "stage 5: extract eval embeddings ($eval_exp)"
  python -m speaker3d_tpu.cli.extract --exp_dir $eval_exp \
    --data $data/eval_wav.scp --out_dir $eval_exp/embeddings --mode exact
fi

if [ $stage -le 6 ] && [ $stop_stage -ge 6 ]; then
  echo "stage 6: score trials (EER / minDCF)"
  for trial in $data/vox1/trials/*.trial; do
    [ -f "$trial" ] || continue
    name=$(basename "$trial" .trial)
    python -m speaker3d_tpu.cli.compute_score_metrics \
      --enrol_data $eval_exp/embeddings --test_data $eval_exp/embeddings \
      --scores_dir $eval_exp/scores_$name --trials "$trial" --p_target 0.01
  done
fi
