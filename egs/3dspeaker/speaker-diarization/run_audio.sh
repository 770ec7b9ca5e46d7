#!/usr/bin/env bash
# Audio speaker diarization recipe — mirrors the reference staged pipeline
# (reference: egs/3dspeaker/speaker-diarization/run_audio.sh): [overlap
# segmentation] -> VAD -> sliding-window embeddings -> clustering -> RTTM ->
# DER -> [speaker-attributed transcription]. The reference runs each stage
# as a separate batch process with JSON/pkl handoffs; here stages 2-5 are
# the one-process unified CLI (VAD/chunk/embed/cluster in a single jitted
# device path), so only the optional edges remain separate stages.
set -euo pipefail

stage=${STAGE:-1}
stop_stage=${STOP_STAGE:-2}
wav_dir=${WAV_DIR:-examples}
ref_rttm=${REF_RTTM:-}
out_dir=${OUT_DIR:-exp/diar}
model_id=${MODEL_ID:-iic/speech_eres2netv2w24s4ep4_sv_zh-cn_16k-common}
# recipe-path clustering is spectral with conf/diar.yaml values
# (pval .012, max 15 spks, mer_cos .8); set CLUSTER=AHC for the fork default
cluster=${CLUSTER:-spectral}
# optional overlap: a cli/train_segmentation.py experiment replaces the
# reference's pyannote download (which needed an HF access token)
seg_exp=${SEG_EXP:-}
# optional transcription: dir of per-wav ASR word-timestamp JSON files
asr_dir=${ASR_DIR:-}

cd "$(dirname "$0")"
REPO_ROOT=$(cd ../../.. && pwd)
# Absolutize user paths so the recipe can run from the repo root below.
for v in wav_dir ref_rttm out_dir seg_exp asr_dir; do
  val=${!v}
  if [ -n "$val" ] && [ "${val#/}" = "$val" ]; then
    printf -v "$v" '%s/%s' "$PWD" "$val"
  fi
done
if [ -n "${PALLAS_AXON_POOL_IPS:-}" ]; then
  # tunneled-TPU harness: PYTHONPATH breaks the axon plugin registration
  # (see CLAUDE.md); run from the repo root so cwd supplies the imports
  cd "$REPO_ROOT"
else
  export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
fi

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "stage 1: diarize (VAD + embeddings + $cluster clustering + RTTM)"
  overlap_args=()
  [ -n "$seg_exp" ] && overlap_args=(--include_overlap --segmentation_exp_dir "$seg_exp")
  python -m speaker3d_tpu.cli.infer_diarization \
    --wav "$wav_dir" --out_dir "$out_dir" --model_id "$model_id" \
    --cluster_type "$cluster" --cluster_mer_cos 0.8 --cluster_pval 0.012 \
    --sidecar "${overlap_args[@]}"
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ] && [ -n "$ref_rttm" ]; then
  echo "stage 2: DER scoring"
  cat "$out_dir"/*.rttm > "$out_dir/all_hyp.rttm"
  python -m speaker3d_tpu.cli.compute_der \
    --ref "$ref_rttm" --hyp "$out_dir/all_hyp.rttm" --collar 0.25
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ] && [ -n "$asr_dir" ]; then
  echo "stage 3: speaker-attributed transcription"
  python -m speaker3d_tpu.cli.transcribe_diarization \
    --rttm_dir "$out_dir" --asr_dir "$asr_dir" --out_dir "$out_dir/trans"
fi
