#!/usr/bin/env bash
# DFSMN VAD recipe (new capability vs the reference, which downloads
# external VAD models): train the 10ms-hop DFSMN VAD on synthetic mixtures
# of a speech corpus + MUSAN-style noise, then diarize with it.
set -euo pipefail
stage=${STAGE:-1}
stop_stage=${STOP_STAGE:-2}
cd "$(dirname "$0")"; REPO_ROOT=$(cd ../.. && pwd)
if [ -n "${PALLAS_AXON_POOL_IPS:-}" ]; then
  # tunneled-TPU harness: PYTHONPATH breaks axon PJRT plugin registration
  # (see CLAUDE.md); import speaker3d_tpu via a cwd symlink instead (the
  # reference uses the same speakerlab symlink convention in its recipes)
  [ -e speaker3d_tpu ] || ln -s "$REPO_ROOT/speaker3d_tpu" speaker3d_tpu
else
  export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
fi
exp_dir=exp/fsmn_vad

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "stage 1: train VAD (data/speech.csv needs a 'wav' column; data/noise.scp optional)"
  python -m speaker3d_tpu.cli.train_vad \
    --config "$REPO_ROOT/configs/fsmn_vad.yaml" \
    --speech=data/speech.csv --noise=data/noise.scp --exp_dir=$exp_dir
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "stage 2: diarize with the trained VAD"
  python -m speaker3d_tpu.cli.infer_diarization \
    --wav data/eval_wavs.list --out_dir exp/diar_out \
    --vad_exp_dir $exp_dir --sidecar
fi
