#!/usr/bin/env bash
# VoxCeleb SDPN self-supervised recipe (reference: egs/voxceleb/sv-sdpn/run.sh).
set -euo pipefail
cd "$(dirname "$0")"; REPO_ROOT=$(cd ../../.. && pwd); export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
exp_dir=exp/sdpn
python -m speaker3d_tpu.cli.train_ssl --config "$REPO_ROOT/configs/sdpn.yaml" --variant sdpn --exp_dir=$exp_dir "$@"
python -m speaker3d_tpu.cli.extract_ssl --exp_dir $exp_dir --data data/eval_wav.scp --out_dir $exp_dir/embeddings --variant sdpn
python -m speaker3d_tpu.cli.compute_score_metrics --enrol_data $exp_dir/embeddings --test_data $exp_dir/embeddings --scores_dir $exp_dir/scores --trials "${TRIALS:-data/veri_test2.txt}" --p_target 0.05
