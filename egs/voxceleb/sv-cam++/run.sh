#!/usr/bin/env bash
# VoxCeleb CAM++ supervised SV recipe (reference: egs/voxceleb/sv-cam++/run.sh).
set -euo pipefail
cd "$(dirname "$0")"; REPO_ROOT=$(cd ../../.. && pwd); export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
stage=${STAGE:-1}; stop_stage=${STOP_STAGE:-4}
voxceleb2_root=${VOXCELEB2_ROOT:-/data/voxceleb2/dev/wav}
exp_dir=exp/campplus
[ $stage -le 1 ] && [ $stop_stage -ge 1 ] && python "$REPO_ROOT/egs/local/prepare_csv.py" --wav_root "$voxceleb2_root" --out data/train.csv
[ $stage -le 2 ] && [ $stop_stage -ge 2 ] && python -m speaker3d_tpu.cli.train --config "$REPO_ROOT/configs/campplus.yaml" --data=data/train.csv --exp_dir=$exp_dir
[ $stage -le 3 ] && [ $stop_stage -ge 3 ] && python -m speaker3d_tpu.cli.extract --exp_dir $exp_dir --data data/eval_wav.scp --out_dir $exp_dir/embeddings --mode exact
[ $stage -le 4 ] && [ $stop_stage -ge 4 ] && python -m speaker3d_tpu.cli.compute_score_metrics --enrol_data $exp_dir/embeddings --test_data $exp_dir/embeddings --scores_dir $exp_dir/scores --trials "${TRIALS:-data/veri_test2.txt}"
