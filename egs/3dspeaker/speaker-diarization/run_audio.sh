#!/usr/bin/env bash
# Audio speaker diarization recipe — mirrors the reference staged pipeline
# (reference: egs/3dspeaker/speaker-diarization/run_audio.sh): VAD ->
# sliding-window embeddings -> clustering -> RTTM -> DER.
set -euo pipefail

stage=1
stop_stage=2
wav_dir=${WAV_DIR:-examples}
ref_rttm=${REF_RTTM:-}
out_dir=${OUT_DIR:-exp/diar}
model_id=${MODEL_ID:-iic/speech_eres2netv2w24s4ep4_sv_zh-cn_16k-common}

cd "$(dirname "$0")"
REPO_ROOT=$(cd ../../.. && pwd)
export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "stage 1: diarize (VAD + embeddings + AHC clustering + RTTM)"
  python -m speaker3d_tpu.cli.infer_diarization \
    --wav "$wav_dir" --out_dir "$out_dir" --model_id "$model_id" --sidecar
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ] && [ -n "$ref_rttm" ]; then
  echo "stage 2: DER scoring"
  cat "$out_dir"/*.rttm > "$out_dir/all_hyp.rttm"
  python -m speaker3d_tpu.cli.compute_der \
    --ref "$ref_rttm" --hyp "$out_dir/all_hyp.rttm" --collar 0.25
fi
