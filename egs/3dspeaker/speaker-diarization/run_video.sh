#!/usr/bin/env bash
# Audio-visual speaker diarization recipe — mirrors the reference staged
# pipeline (reference: egs/3dspeaker/speaker-diarization/run_video.sh):
# prepare videos -> [optional ONNX face models] -> frame/audio extraction +
# face tracking + ASD + track embeddings + JointClustering -> RTTM -> DER.
# The reference's stages 2-5 (vision_processer.py + extract embeddings +
# cluster_and_postprocess.py) are the one-process unified CLI here
# (cli/infer_diarization_video.py); its downloaded ONNX face models remain
# pluggable and in-repo functional fallbacks are used when absent.
set -euo pipefail

stage=${STAGE:-1}
stop_stage=${STOP_STAGE:-2}
video_list=${VIDEO_LIST:-examples/video.list}
ref_rttm=${REF_RTTM:-}
out_dir=${OUT_DIR:-exp_video}
model_id=${MODEL_ID:-iic/speech_eres2netv2w24s4ep4_sv_zh-cn_16k-common}
onnx_dir=${ONNX_DIR:-pretrained_models}   # optional reference ONNX models
asd_exp=${ASD_EXP:-}                      # optional cli/train_asd experiment

cd "$(dirname "$0")"
REPO_ROOT=$(cd ../../.. && pwd)
export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "stage 1: audio-visual diarization"
  [ -f "$video_list" ] || { echo "missing $video_list (one video path per line)"; exit 1; }
  onnx_args=()
  [ -f "$onnx_dir/version-RFB-320.onnx" ] && onnx_args+=(--yunet_onnx "$onnx_dir/version-RFB-320.onnx")
  [ -f "$onnx_dir/face_recog_ir101.onnx" ] && onnx_args+=(--face_embed_onnx "$onnx_dir/face_recog_ir101.onnx")
  [ -n "$asd_exp" ] && onnx_args+=(--asd_exp_dir "$asd_exp")
  while read -r video_file; do
    [ -n "$video_file" ] || continue
    python -m speaker3d_tpu.cli.infer_diarization_video \
      --video "$video_file" --out_dir "$out_dir" --model_id "$model_id" \
      "${onnx_args[@]}"
  done < "$video_list"
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ] && [ -n "$ref_rttm" ]; then
  echo "stage 2: DER scoring"
  cat "$out_dir"/*.rttm > "$out_dir/all_hyp.rttm"
  python -m speaker3d_tpu.cli.compute_der \
    --ref "$ref_rttm" --hyp "$out_dir/all_hyp.rttm" --collar 0.25
fi
