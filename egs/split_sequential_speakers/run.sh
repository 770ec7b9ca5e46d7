#!/usr/bin/env bash
# Split sequential speakers (reference: egs/split_sequential_speakers/):
# extract per-utterance embeddings for a session, then detect the speaker
# boundaries (cosine or GMM refinement). Multi-process extraction mirrors
# the reference's multi-GPU script via SPEAKER3D_PROC_INDEX/COUNT sharding.
set -euo pipefail
cd "$(dirname "$0")"; REPO_ROOT=$(cd ../.. && pwd); export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
wav_scp=${WAV_SCP:-data/wav.scp}          # utterances named in sequence order
num_speakers=${NUM_SPEAKERS:-2}
exp_dir=${EXP_DIR:-exp/session}
model_id=${MODEL_ID:-iic/speech_eres2netv2w24s4ep4_sv_zh-cn_16k-common}
python -m speaker3d_tpu.cli.extract --model_id "$model_id" \
  --data "$wav_scp" --out_dir "$exp_dir/embeddings" --mode exact
python detect_boundaries.py --emb "$exp_dir/embeddings" \
  --num_speakers "$num_speakers" --method "${METHOD:-gmm}" \
  --out "$exp_dir/boundaries.json"
