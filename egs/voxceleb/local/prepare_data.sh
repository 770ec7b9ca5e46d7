#!/usr/bin/env bash
# VoxCeleb data prep: raw corpus trees -> train CSV + eval lists + trials.
# Native replacement for the reference's awk/perl prep
# (reference: egs/voxceleb/sv-eres2netv2/local/prepare_data.sh stage 4).
# Download/decompress of the archives stays manual (zero-egress).
set -euo pipefail

data=data
voxceleb2_root=""
voxceleb1_root=""
musan_root=""
rirs_root=""
trials=""

while [ $# -gt 0 ]; do
  case "$1" in
    --data) data=$2; shift 2 ;;
    --voxceleb2_root) voxceleb2_root=$2; shift 2 ;;
    --voxceleb1_root) voxceleb1_root=$2; shift 2 ;;
    --musan_root) musan_root=$2; shift 2 ;;
    --rirs_root) rirs_root=$2; shift 2 ;;
    --trials) trials=$2; shift 2 ;;
    *) echo "unknown option $1"; exit 1 ;;
  esac
done

REPO_ROOT=$(cd "$(dirname "$0")/../../.." && pwd)
PREP="$REPO_ROOT/egs/local/prepare_corpus.py"

trial_args=()
[ -n "$trials" ] && [ -f "$trials" ] && trial_args=(--trials "$trials")
python "$PREP" voxceleb --vox2_root "$voxceleb2_root" \
  --vox1_root "$voxceleb1_root" --out "$data" "${trial_args[@]}"

[ -n "$musan_root" ] && [ -d "$musan_root" ] && \
  python "$PREP" musan "$musan_root" --out "$data/musan"
[ -n "$rirs_root" ] && [ -d "$rirs_root" ] && \
  python "$PREP" rirs "$rirs_root" --out "$data/rirs"

echo "data preparation done: $data"
