#!/usr/bin/env bash
# 3D-Speaker resnet recipe (reference: egs/3dspeaker/sv-resnet/run.sh):
# cross-device / cross-distance / cross-dialect trial lists.
set -euo pipefail
cd "$(dirname "$0")"; REPO_ROOT=$(cd ../../.. && pwd); export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
root=${THREED_SPEAKER_ROOT:-/data/3dspeaker}
exp_dir=exp/resnet
python "$REPO_ROOT/egs/local/prepare_csv.py" --wav_root "$root/train/wav" --out data/train.csv
python -m speaker3d_tpu.cli.train --config "$REPO_ROOT/configs/resnet.yaml" --data=data/train.csv --exp_dir=$exp_dir
python -m speaker3d_tpu.cli.extract --exp_dir $exp_dir --data data/eval_wav.scp --out_dir $exp_dir/embeddings --mode exact
for trial in trials_cross_device trials_cross_distance trials_cross_dialect; do
  [ -f data/$trial ] && python -m speaker3d_tpu.cli.compute_score_metrics --enrol_data $exp_dir/embeddings --test_data $exp_dir/embeddings --scores_dir $exp_dir/scores_$trial --trials data/$trial
done
