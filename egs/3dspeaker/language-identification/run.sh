#!/usr/bin/env bash
# Language identification recipe (reference: egs/3dspeaker/
# language-identification/run.sh): reuse the SV trainer with utt2lang labels,
# then predict + accuracy.
set -euo pipefail
cd "$(dirname "$0")"; REPO_ROOT=$(cd ../../.. && pwd); export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
exp_dir=exp/lid
# data/train.csv must have spk column = language label
python -m speaker3d_tpu.cli.train --config "$REPO_ROOT/configs/campplus.yaml" --data=data/train.csv --exp_dir=$exp_dir --speed_pertub=false
python -m speaker3d_tpu.cli.predict_label --exp_dir $exp_dir --data data/eval_wav.scp --utt2label data/utt2lang --out $exp_dir/predictions.txt
