#!/usr/bin/env bash
# CNCeleb eres2net recipe (reference: egs/cnceleb/sv-eres2net/run.sh):
# train on CNCeleb-dev + CNCeleb2, eval on the CNCeleb trial list.
set -euo pipefail
cd "$(dirname "$0")"; REPO_ROOT=$(cd ../../.. && pwd); export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
cnceleb_root=${CNCELEB_ROOT:-/data/cnceleb/wav}
exp_dir=exp/eres2net
python "$REPO_ROOT/egs/local/prepare_csv.py" --wav_root "$cnceleb_root" --out data/train.csv
python -m speaker3d_tpu.cli.train --config "$REPO_ROOT/configs/eres2net.yaml" --data=data/train.csv --exp_dir=$exp_dir
python -m speaker3d_tpu.cli.extract --exp_dir $exp_dir --data data/eval_wav.scp --out_dir $exp_dir/embeddings --mode exact
python -m speaker3d_tpu.cli.compute_score_metrics --enrol_data $exp_dir/embeddings --test_data $exp_dir/embeddings --scores_dir $exp_dir/scores --trials "${TRIALS:-data/trials.lst}"
