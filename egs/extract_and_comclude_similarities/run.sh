#!/usr/bin/env bash
# Extract embeddings for a corpus and conclude speaker similarities
# (reference: egs/extract_and_comclude_similarities/): batch extraction +
# speaker/utterance-level cosine similarity reports with cross-dataset
# accounting.
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
wav_list=${WAV_LIST:-data/wavs.list}
out_dir=${OUT_DIR:-exp/similarities}
model_id=${MODEL_ID:-iic/speech_eres2netv2w24s4ep4_sv_zh-cn_16k-common}

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "stage 1: batch embedding extraction"
  python -m speaker3d_tpu.cli.infer_sv_batch --model_id "$model_id" \
    --wavs "$wav_list" --out_dir "$out_dir/embeddings" --out_type npy
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "stage 2: similarity report"
  python -m speaker3d_tpu.cli.analyze_similarity --emb "$out_dir/embeddings" \
    --out_dir "$out_dir/report" ${UTT2SPK:+--utt2spk "$UTT2SPK"} \
    ${DATASET_MAP:+--dataset_map "$DATASET_MAP"} \
    --level "${LEVEL:-speaker}" --min_similarity "${MIN_SIM:-0.5}" \
    --max_results "${TOP_PAIRS:-1000}"
fi
