#!/usr/bin/env bash
# Split sequential speakers (reference: egs/split_sequential_speakers/):
# extract per-utterance embeddings for a session, then detect the speaker
# boundaries (cosine or GMM refinement). Multi-process extraction mirrors
# the reference's multi-GPU script via SPEAKER3D_PROC_INDEX/COUNT sharding.
set -euo pipefail
cd "$(dirname "$0")"; REPO_ROOT=$(cd ../.. && pwd)
if [ -n "${PALLAS_AXON_POOL_IPS:-}" ]; then
  # tunneled-TPU harness: PYTHONPATH breaks axon PJRT plugin registration
  # (see CLAUDE.md); import speaker3d_tpu via a cwd symlink instead (the
  # reference uses the same speakerlab symlink convention in its recipes)
  [ -e speaker3d_tpu ] || ln -s "$REPO_ROOT/speaker3d_tpu" speaker3d_tpu
else
  export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
fi
stage=${STAGE:-1}
stop_stage=${STOP_STAGE:-2}
wav_scp=${WAV_SCP:-data/wav.scp}          # utterances named in sequence order
num_speakers=${NUM_SPEAKERS:-2}
exp_dir=${EXP_DIR:-exp/session}
model_id=${MODEL_ID:-iic/speech_eres2netv2w24s4ep4_sv_zh-cn_16k-common}

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "stage 1: extract per-utterance embeddings"
  python -m speaker3d_tpu.cli.extract --model_id "$model_id" \
    --data "$wav_scp" --out_dir "$exp_dir/embeddings" --mode exact
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "stage 2: detect speaker boundaries"
  python detect_boundaries.py --emb "$exp_dir/embeddings" \
    --num_speakers "$num_speakers" --method "${METHOD:-gmm}" \
    --out "$exp_dir/boundaries.json"
fi
