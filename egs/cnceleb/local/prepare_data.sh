#!/usr/bin/env bash
# CNCeleb data prep: CN-Celeb1 (dev+eval) + CN-Celeb2 -> train CSV, eval
# wav.scp (incl. enroll entries), kaldi trials. Native replacement for the
# reference's awk/perl prep (reference: egs/cnceleb/sv-eres2netv2/local/
# prepare_data_cncb.sh stage 4). flac inputs must already be converted to
# wav (the reference's flac2wav stage needs ffmpeg, absent here).
set -euo pipefail

data=data
cnceleb1_root=""
cnceleb2_root=""
musan_root=""
rirs_root=""

while [ $# -gt 0 ]; do
  case "$1" in
    --data) data=$2; shift 2 ;;
    --cnceleb1_root) cnceleb1_root=$2; shift 2 ;;
    --cnceleb2_root) cnceleb2_root=$2; shift 2 ;;
    --musan_root) musan_root=$2; shift 2 ;;
    --rirs_root) rirs_root=$2; shift 2 ;;
    *) echo "unknown option $1"; exit 1 ;;
  esac
done

REPO_ROOT=$(cd "$(dirname "$0")/../../.." && pwd)
PREP="$REPO_ROOT/egs/local/prepare_corpus.py"

python "$PREP" cnceleb --cnceleb1_root "$cnceleb1_root" \
  --cnceleb2_root "$cnceleb2_root" --out "$data"

[ -n "$musan_root" ] && [ -d "$musan_root" ] && \
  python "$PREP" musan "$musan_root" --out "$data/musan"
[ -n "$rirs_root" ] && [ -d "$rirs_root" ] && \
  python "$PREP" rirs "$rirs_root" --out "$data/rirs"

echo "data preparation done: $data"
