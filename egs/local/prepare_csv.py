"""Build the training CSV index (ID, wav, spk) from a corpus directory.

Behavioral contract (reference: egs/*/local data-prep stages producing the
CSV consumed by WavSVDataset): assumes the VoxCeleb-style layout
<root>/<speaker_id>/<session>/<utt>.wav (or any 2-level nesting); speaker id
is the first path component under the root.

Usage: python egs/local/prepare_csv.py --wav_root /data/voxceleb2/dev/aac \
          --out data/train.csv [--min_duration 2.0]
"""

from __future__ import annotations

import argparse
import glob
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav_root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--ext", default="wav")
    args = p.parse_args()

    wavs = sorted(glob.glob(os.path.join(args.wav_root, "**", f"*.{args.ext}"),
                            recursive=True))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    n = 0
    with open(args.out, "w") as f:
        f.write("ID,wav,spk\n")
        for wav in wavs:
            rel = os.path.relpath(wav, args.wav_root)
            parts = rel.split(os.sep)
            spk = parts[0]
            utt_id = rel.replace(os.sep, "_").rsplit(".", 1)[0]
            f.write(f"{utt_id},{wav},{spk}\n")
            n += 1
    print(f"wrote {n} utterances to {args.out}")


if __name__ == "__main__":
    main()
