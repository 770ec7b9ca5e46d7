#!/usr/bin/env bash
# 3D-Speaker data prep: modelscope layout (files/{train,test}_wav.scp +
# utt2spk + trials) -> train CSV (Device09 excluded), test lists, trial
# files. Native replacement for the reference's awk/perl prep
# (reference: egs/3dspeaker/sv-eres2netv2/local/prepare_data.sh stage 3).
set -euo pipefail

data=data
root=""
musan_root=""
rirs_root=""

while [ $# -gt 0 ]; do
  case "$1" in
    --data) data=$2; shift 2 ;;
    --root) root=$2; shift 2 ;;
    --musan_root) musan_root=$2; shift 2 ;;
    --rirs_root) rirs_root=$2; shift 2 ;;
    *) echo "unknown option $1"; exit 1 ;;
  esac
done

REPO_ROOT=$(cd "$(dirname "$0")/../../.." && pwd)
PREP="$REPO_ROOT/egs/local/prepare_corpus.py"

python "$PREP" 3dspeaker --root "$root" --out "$data"

[ -n "$musan_root" ] && [ -d "$musan_root" ] && \
  python "$PREP" musan "$musan_root" --out "$data/musan"
[ -n "$rirs_root" ] && [ -d "$rirs_root" ] && \
  python "$PREP" rirs "$rirs_root" --out "$data/rirs"

echo "data preparation done: $data"
