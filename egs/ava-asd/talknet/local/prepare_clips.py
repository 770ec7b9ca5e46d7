"""AVA-ActiveSpeaker clip preparation: orig videos/audios + orig CSV ->
per-entity audio clips, per-frame face-crop jpgs, and the tab-separated
loader CSV consumed by speaker3d_tpu.data.dataset_asd.

Behavioral contract (reference: egs/ava-asd/talknet/local/
extract_audio_clips.py and extract_video_clips.py): rows are filtered to
label_id in {0, 1, 2}, sorted by (entity_id, frame_timestamp); per entity:
  - audio: slice of <orig_audio_dir>/<video_id>.wav from the first to the
    last frame_timestamp, written to <audio_out>/<video_id>/<entity_id>.wav
  - video: per-row face crop (entity_box_* are relative coords) from the
    frame at frame_timestamp, resized by the loader later, written to
    <video_out>/<video_id>/<entity_id>/<timestamp %.2f>.jpg
  - loader CSV line (this replaces the reference's pre-built
    {train,val}_loader.csv download):
    entity_id<TAB>num_frames<TAB>fps<TAB>[l0,l1,...]<TAB>num_speaking
    with l_i = 1 iff label_id == 1 at frame i.

Usage:
  python prepare_clips.py --csv_ori train_orig.csv \
      --audio_ori_dir orig_audios/trainval --video_ori_dir orig_videos/trainval \
      --audio_out_dir clips_audios/train --video_out_dir clips_videos/train \
      --loader_csv csv/train_loader.csv [--nj 8] [--skip_video]
"""

import argparse
import csv
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", "..", ".."))

FIELDS = ("video_id", "frame_timestamp", "entity_box_x1", "entity_box_y1",
          "entity_box_x2", "entity_box_y2", "label", "entity_id", "label_id")


def read_orig_csv(path):
    """Rows keyed by entity, time-sorted (reference filters label_id 0/1/2
    and sorts by entity_id, frame_timestamp)."""
    by_entity = defaultdict(list)
    with open(path, newline="") as f:
        header = csv.reader(f)
        rows = list(header)
    names = rows[0]
    has_header = "video_id" in names
    if not has_header:
        names = list(FIELDS[:len(rows[0])])
        rows.insert(0, names)
    idx = {n: names.index(n) for n in names}
    for r in rows[1:]:
        if not r:
            continue
        if int(float(r[idx["label_id"]])) not in (0, 1, 2):
            continue
        by_entity[r[idx["entity_id"]]].append({
            "video_id": r[idx["video_id"]],
            "t": float(r[idx["frame_timestamp"]]),
            "box": (float(r[idx["entity_box_x1"]]),
                    float(r[idx["entity_box_y1"]]),
                    float(r[idx["entity_box_x2"]]),
                    float(r[idx["entity_box_y2"]])),
            "speaking": int(float(r[idx["label_id"]])) == 1,
        })
    for rows_ in by_entity.values():
        rows_.sort(key=lambda d: d["t"])
    return by_entity


def extract_entity_audio(entity, rows, audio_ori_dir, audio_out_dir):
    from speaker3d_tpu.utils.fileio import read_wav, write_wav

    video_id = rows[0]["video_id"]
    wav_path = os.path.join(audio_ori_dir, video_id + ".wav")
    wav, sr = read_wav(wav_path)
    start, end = rows[0]["t"], rows[-1]["t"]
    clip = wav[0, int(start * sr):int(end * sr)]
    out_dir = os.path.join(audio_out_dir, video_id)
    os.makedirs(out_dir, exist_ok=True)
    write_wav(os.path.join(out_dir, entity + ".wav"), clip, sr)


def extract_entity_video(entity, rows, video_ori_dir, video_out_dir):
    import glob

    import cv2

    video_id = rows[0]["video_id"]
    cands = glob.glob(os.path.join(video_ori_dir, video_id + ".*"))
    if not cands:
        raise FileNotFoundError(f"no video for {video_id} in {video_ori_dir}")
    cap = cv2.VideoCapture(cands[0])
    out_dir = os.path.join(video_out_dir, video_id, entity)
    os.makedirs(out_dir, exist_ok=True)
    for row in rows:
        cap.set(cv2.CAP_PROP_POS_MSEC, row["t"] * 1e3)
        ok, frame = cap.read()
        if not ok or frame is None:
            continue
        h, w = frame.shape[:2]
        x1, y1, x2, y2 = row["box"]
        face = frame[int(y1 * h):int(y2 * h), int(x1 * w):int(x2 * w), :]
        if face.size == 0:
            face = frame
        cv2.imwrite(os.path.join(out_dir, f"{row['t']:.2f}.jpg"), face)
    cap.release()


def loader_line(entity, rows):
    n = len(rows)
    if n > 1:
        fps = (n - 1) / max(rows[-1]["t"] - rows[0]["t"], 1e-6)
    else:
        fps = 25.0
    labels = [1 if r["speaking"] else 0 for r in rows]
    return (f"{entity}\t{n}\t{round(fps, 2):g}\t"
            f"[{','.join(str(v) for v in labels)}]\t{sum(labels)}")


def process_entity(args_tuple):
    entity, rows, a = args_tuple
    extract_entity_audio(entity, rows, a.audio_ori_dir, a.audio_out_dir)
    if not a.skip_video:
        extract_entity_video(entity, rows, a.video_ori_dir, a.video_out_dir)
    return loader_line(entity, rows)


def main(argv=None):
    p = argparse.ArgumentParser(description="Extract AVA-ASD clips")
    p.add_argument("--csv_ori", required=True)
    p.add_argument("--audio_ori_dir", required=True)
    p.add_argument("--video_ori_dir", default=None)
    p.add_argument("--audio_out_dir", required=True)
    p.add_argument("--video_out_dir", default=None)
    p.add_argument("--loader_csv", required=True)
    p.add_argument("--nj", type=int, default=1)
    p.add_argument("--skip_video", action="store_true")
    a = p.parse_args(argv)
    if not a.skip_video and not (a.video_ori_dir and a.video_out_dir):
        p.error("--video_ori_dir/--video_out_dir required unless --skip_video")

    by_entity = read_orig_csv(a.csv_ori)
    work = [(e, rows, a) for e, rows in sorted(by_entity.items())]
    if a.nj > 1:
        import multiprocessing as mp

        with mp.Pool(a.nj) as pool:
            lines = pool.map(process_entity, work)
    else:
        lines = [process_entity(w) for w in work]

    os.makedirs(os.path.dirname(os.path.abspath(a.loader_csv)), exist_ok=True)
    with open(a.loader_csv, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"prepared {len(lines)} entities -> {a.loader_csv}")


if __name__ == "__main__":
    main()
