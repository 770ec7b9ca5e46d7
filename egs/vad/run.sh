#!/usr/bin/env bash
# DFSMN VAD recipe (new capability vs the reference, which downloads
# external VAD models): train the 10ms-hop DFSMN VAD on synthetic mixtures
# of a speech corpus + MUSAN-style noise, then diarize with it.
set -euo pipefail
cd "$(dirname "$0")"; REPO_ROOT=$(cd .. && pwd); export PYTHONPATH=$REPO_ROOT:${PYTHONPATH:-}
exp_dir=exp/fsmn_vad

# stage 1: train (data/speech.csv needs a 'wav' column; data/noise.scp optional)
python -m speaker3d_tpu.cli.train_vad \
  --config "$REPO_ROOT/configs/fsmn_vad.yaml" \
  --speech=data/speech.csv --noise=data/noise.scp --exp_dir=$exp_dir

# stage 2: diarize with the trained VAD
python -m speaker3d_tpu.cli.infer_diarization \
  --wav data/eval_wavs.list --out_dir exp/diar_out \
  --vad_exp_dir $exp_dir --sidecar
