#!/usr/bin/env bash
# CNCeleb RDINO self-supervised recipe (reference: egs/cnceleb/sv-rdino/run.sh).
set -euo pipefail
cd "$(dirname "$0")"; REPO_ROOT=$(cd ../../.. && pwd); export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
exp_dir=exp/rdino
python -m speaker3d_tpu.cli.train_ssl --config "$REPO_ROOT/configs/rdino.yaml" --variant rdino --exp_dir=$exp_dir "$@"
python -m speaker3d_tpu.cli.extract_ssl --exp_dir $exp_dir --data data/eval_wav.scp --out_dir $exp_dir/embeddings --variant rdino
python -m speaker3d_tpu.cli.compute_score_metrics --enrol_data $exp_dir/embeddings --test_data $exp_dir/embeddings --scores_dir $exp_dir/scores --trials "${TRIALS:-data/trials.lst}" --p_target 0.05
