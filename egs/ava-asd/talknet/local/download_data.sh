#!/usr/bin/env bash
# AVA-ActiveSpeaker raw-data preparation (reference:
# egs/ava-asd/talknet/local/download_data.sh): download annotation CSVs and
# raw videos, demux 16 kHz mono audio, then cut per-entity clips and build
# the loader CSVs with local/prepare_clips.py (which replaces the
# reference's pre-built loader-CSV tarball).
#
# Stages:
#   1  annotation CSVs ({train,val,test}_orig.csv + file lists) — the
#      official ava_activespeaker_*_v1.0 annotations
#   2  raw videos via wget from s3.amazonaws.com/ava-dataset
#   3  ffmpeg audio demux (16 kHz mono pcm_s16le)
#   4  per-entity audio/video clips + loader CSVs (prepare_clips.py)
set -euo pipefail

stage=1
stop_stage=4
download_dir=data/download_data
nj=8

while [ $# -gt 0 ]; do
  case "$1" in
    --stage) stage=$2; shift 2;;
    --stop_stage) stop_stage=$2; shift 2;;
    --download_dir) download_dir=$2; shift 2;;
    --nj) nj=$2; shift 2;;
    *) echo "unknown option $1"; exit 1;;
  esac
done

cd "$(dirname "$0")/.."
mkdir -p "$download_dir"

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  echo "Stage1: annotation CSVs..."
  mkdir -p "$download_dir/csv"
  base=https://research.google.com/ava/download
  for f in ava_activespeaker_train_v1.0.tar.bz2 ava_activespeaker_val_v1.0.tar.bz2; do
    [ -f "$download_dir/csv/$f" ] || wget -P "$download_dir/csv" "$base/$f"
    tar -xjf "$download_dir/csv/$f" -C "$download_dir/csv"
  done
  # concatenated per-split orig csvs in the reference's column layout
  for split in train val; do
    cat "$download_dir"/csv/ava_activespeaker_${split}_v1.0/*.csv \
      > "$download_dir/csv/${split}_orig.csv"
    cut -d, -f1 "$download_dir/csv/${split}_orig.csv" | sort -u \
      | sed 's/$/.mkv/' > "$download_dir/csv/${split}_file_list.txt"
  done
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  echo "Stage2: raw videos..."
  for split in train val; do
    mkdir -p "$download_dir/orig_videos/trainval"
    while read -r video_name; do
      [ -f "$download_dir/orig_videos/trainval/$video_name" ] || \
        wget -P "$download_dir/orig_videos/trainval" \
          "https://s3.amazonaws.com/ava-dataset/trainval/$video_name"
    done < "$download_dir/csv/${split}_file_list.txt"
  done
fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  echo "Stage3: demux 16 kHz audio..."
  mkdir -p "$download_dir/orig_audios/trainval"
  for v in "$download_dir"/orig_videos/trainval/*; do
    out="$download_dir/orig_audios/trainval/$(basename "${v%.*}").wav"
    [ -f "$out" ] || ffmpeg -nostdin -y -i "$v" -async 1 -ac 1 -vn \
      -acodec pcm_s16le -ar 16000 "$out" -loglevel panic
  done
fi

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  echo "Stage4: entity clips + loader CSVs..."
  for split in train val; do
    python local/prepare_clips.py \
      --csv_ori "$download_dir/csv/${split}_orig.csv" \
      --audio_ori_dir "$download_dir/orig_audios/trainval" \
      --video_ori_dir "$download_dir/orig_videos/trainval" \
      --audio_out_dir "$download_dir/clips_audios/$split" \
      --video_out_dir "$download_dir/clips_videos/$split" \
      --loader_csv "$download_dir/csv/${split}_loader.csv" --nj "$nj"
  done
fi
