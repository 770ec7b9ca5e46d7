#!/usr/bin/env bash
# Audio-visual speaker diarization recipe — mirrors the reference staged
# pipeline (reference: egs/3dspeaker/speaker-diarization/run_video.sh):
# prepare videos -> face detection/tracking + ASD + track embeddings +
# JointClustering -> RTTM -> DER. The reference's stages 2-5
# (vision_processer.py + extract embeddings + cluster_and_postprocess.py)
# are the one-process unified CLI here (cli/infer_diarization_video.py).
#
# Face detection takes ONE of:
#   FACE_DET_EXP=...      an in-repo trained detector experiment
#                         (cli/train_face_detector.py — the no-ONNX path)
#   YUNET_ONNX=...        a cv2 FaceDetectorYN (YuNet) model file — NOTE:
#                         the reference's version-RFB-320.onnx is an
#                         Ultra-Light RFB model, NOT YuNet-compatible
#   FACE_BOXES_DIR=...    per-video precomputed face boxes JSON
#                         (<video_basename>.json, cli --face_boxes_json)
# Optional: FACE_EMBED_ONNX (face recognition), ASD_EXP (cli/train_asd
# experiment); functional in-repo fallbacks cover those two when absent.
set -euo pipefail

stage=${STAGE:-1}
stop_stage=${STOP_STAGE:-2}
video_list=${VIDEO_LIST:-examples/video.list}
ref_rttm=${REF_RTTM:-}
out_dir=${OUT_DIR:-exp_video}
model_id=${MODEL_ID:-iic/speech_eres2netv2w24s4ep4_sv_zh-cn_16k-common}
face_det_exp=${FACE_DET_EXP:-}
yunet_onnx=${YUNET_ONNX:-}
face_boxes_dir=${FACE_BOXES_DIR:-}
face_embed_onnx=${FACE_EMBED_ONNX:-}
asd_exp=${ASD_EXP:-}

cd "$(dirname "$0")"
REPO_ROOT=$(cd ../../.. && pwd)
# Absolutize user paths so the recipe can run from the repo root below.
for v in video_list ref_rttm out_dir face_det_exp yunet_onnx \
         face_boxes_dir face_embed_onnx asd_exp; do
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
  echo "stage 1: audio-visual diarization"
  [ -f "$video_list" ] || { echo "missing $video_list (one video path per line)"; exit 1; }
  if [ -z "$face_det_exp" ] && [ -z "$yunet_onnx" ] \
     && [ -z "$face_boxes_dir" ]; then
    echo "ERROR: face detection needs FACE_DET_EXP=<trained in-repo"
    echo "       detector (cli/train_face_detector.py)>, YUNET_ONNX=<cv2"
    echo "       FaceDetectorYN model>, or FACE_BOXES_DIR=<per-video JSON>"
    exit 1
  fi
  while read -r video_file; do
    [ -n "$video_file" ] || continue
    args=()
    [ -n "$face_det_exp" ] && args+=(--face_detector_exp_dir "$face_det_exp")
    [ -n "$yunet_onnx" ] && args+=(--yunet_onnx "$yunet_onnx")
    if [ -n "$face_boxes_dir" ]; then
      base=$(basename "${video_file%.*}")
      args+=(--face_boxes_json "$face_boxes_dir/$base.json")
    fi
    [ -n "$face_embed_onnx" ] && args+=(--face_embed_onnx "$face_embed_onnx")
    [ -n "$asd_exp" ] && args+=(--asd_exp_dir "$asd_exp")
    python -m speaker3d_tpu.cli.infer_diarization_video \
      --video "$video_file" --out_dir "$out_dir" --model_id "$model_id" \
      "${args[@]}"
  done < "$video_list"
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ] && [ -n "$ref_rttm" ]; then
  echo "stage 2: DER scoring"
  cat "$out_dir"/*.rttm > "$out_dir/all_hyp.rttm"
  python -m speaker3d_tpu.cli.compute_der \
    --ref "$ref_rttm" --hyp "$out_dir/all_hyp.rttm" --collar 0.25
fi
